"""Dataset splitting and budgeted sampling for training pipelines.

Both are deterministic (hash- or order-based, never RNG) so the same
input always yields the same split on any cluster size — a hard
requirement for reproducible training data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_bucket(col: Column | str, buckets: int = 100) -> Column:
    """Stable [0, buckets) bucket from md5 of the key — engine- and
    partitioning-independent."""
    from atiesh_spark.functions.hashing import md5_long

    c = F.col(col) if isinstance(col, str) else col
    return md5_long(c.cast("string"), 15) % buckets


def deterministic_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash bucket.

    fractions: {"train": 0.9, "val": 0.1} (must sum to 1). The same key
    always lands in the same split — across runs, engines, and
    partitionings — and adding rows never reshuffles existing
    assignments (the property random splits lack).
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = hash_bucket(key_col, 10_000)
    expr = None
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        bound = int(round(cum * 10_000))
        cond = bucket < bound
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep each stratum at its
    own rate (e.g. {"en": 0.5, "fr": 0.2} — upweight scarce languages,
    cap the dominant one; the 'sampling ratios' knob of a mixture
    recipe). A row survives iff its md5 hash bucket (of ``key_col``, 10k
    buckets) falls under its stratum's cutoff — so membership is exactly
    as stable as ``deterministic_split``: partition-layout-independent,
    reproducible across engines, and a row kept at 0.2 is STILL kept at
    0.5 (nested samples for ablations, the property rand() < p lacks).
    Strata not listed get ``default_fraction`` (0 = dropped). No
    shuffle at all: a codegen filter over the scan.
    """
    for k, v in {**fractions, "default": default_fraction}.items():
        if not 0 <= v <= 1:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    bucket = hash_bucket(key_col, 10_000)
    pairs: list = []
    for k, v in fractions.items():
        # stringified keys: the lookup casts strata to string (see
        # mixture_take)
        pairs.extend([F.lit(str(k)), F.lit(int(round(v * 10_000)))])
    cutoff = F.coalesce(
        F.try_element_at(F.create_map(*pairs), F.col(strata_col).cast("string"))
        if pairs
        else F.lit(None).cast("int"),
        F.lit(int(round(default_fraction * 10_000))),
    )
    return df.filter(bucket < cutoff)


def temperature_weights(
    df: DataFrame,
    strata_col: str,
    cost_col: str,
    alpha: float = 0.3,
    round_to: int = 4,
) -> DataFrame:
    """Temperature-based mixture weights per stratum:
    (strata_col, n_cost, weight, epochs_at_parity).

    The multilingual-sampling rule (mBERT/XLM-R exponential smoothing):
    sample stratum l with probability p_l ∝ n_l^alpha, where n_l is the
    stratum's total cost (chars/tokens). alpha=1 is proportional
    (dominant languages swamp the mix), alpha=0 is uniform (tiny
    languages epoch thousands of times); alpha~0.2-0.5 is the published
    sweet spot. ``epochs_at_parity`` = weight * total_cost / n_cost —
    how many times the stratum would repeat if the full corpus budget
    were drawn under these weights (the overfitting-risk column of the
    mixture report).

    One groupBy plus a broadcast single-row total: the per-stratum frame
    is mixture-recipe-sized (dozens of rows), so everything after the
    first aggregate is negligible at any corpus size.
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    per = df.groupBy(strata_col).agg(F.sum(cost_col).alias("n_cost"))
    powed = per.withColumn("__p", F.pow(F.col("n_cost").cast("double"), F.lit(float(alpha))))
    tot = powed.agg(
        F.sum("__p").alias("__z"), F.sum("n_cost").alias("__total")
    )
    return (
        powed.crossJoin(F.broadcast(tot))
        .select(
            F.col(strata_col),
            F.col("n_cost"),
            F.round(F.col("__p") / F.col("__z"), round_to).alias("weight"),
            F.round(
                (F.col("__p") / F.col("__z")) * F.col("__total") / F.col("n_cost"),
                round_to,
            ).alias("epochs_at_parity"),
        )
    )


def _budget_lookup(
    strata_col: str, budgets: dict[str, int], default_budget: int
) -> Column:
    """Literal per-stratum budget column (stringified-key map lookup
    with a default) — shared by both cumulative-take paths."""
    if default_budget < 0 or any(b < 0 for b in budgets.values()):
        raise ValueError("budgets must be >= 0")
    pairs: list = []
    for k, v in budgets.items():
        # key stringified so the map key type always matches the string
        # lookup below — an int stratum key would otherwise depend on
        # implicit coercion (or raise AnalysisException)
        pairs.extend([F.lit(str(k)), F.lit(int(v))])
    return F.coalesce(
        # try_: ANSI element_at raises on missing map keys
        F.try_element_at(F.create_map(*pairs), F.col(strata_col).cast("string"))
        if pairs
        else F.lit(None).cast("int"),
        F.lit(int(default_budget)),
    )


def _cumulative_take_window(
    df: DataFrame,
    strata_col: str,
    cost_col: str,
    budgets: dict[str, int],
    order_col: str,
    default_budget: int = 0,
) -> DataFrame:
    """The one-window restatement of :func:`mixture_take` — the exact
    semantics in four lines of SQL, kept as the differential reference
    (tests pin ``mixture_take`` row-for-row against it) and matching the
    registered DuckDB oracles verbatim.

    NOT the production path: ``Window.partitionBy(strata)`` is one task
    per stratum, so a 10-language corpus serializes onto 10 cores no
    matter how many executors exist — the scale failure mode
    ``mixture_take`` exists to avoid.
    """
    budget_col = _budget_lookup(strata_col, budgets, default_budget)
    w = (
        Window.partitionBy(strata_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__budget", budget_col)
        .withColumn("__running", F.sum(cost_col).over(w))
        .filter(
            (F.col("__budget") > 0)
            & ((F.col("__running") - F.col(cost_col)) < F.col("__budget"))
        )
        .drop("__budget", "__running")
    )


def _na_key(x):
    """Normalize a stratum value to a dict key (NaN/None -> None).

    The NaN branch exists ONLY to undo the Arrow/pandas representation
    of SQL NULL: a nullable float column surfaces NULL as NaN inside
    ``mapInPandas`` kernels, so NaN-seen-in-pandas means NULL-in-Spark.
    A REAL NaN stratum value would be ambiguous here (Spark's
    groupBy/eqNullSafe keep NaN distinct from NULL), which is why
    :func:`_reject_nan_stratum` raises on genuine NaN strata at digest
    time — driver-side Rows, unlike pandas, do distinguish the two.
    """
    if x is None:
        return None
    if isinstance(x, float) and x != x:
        return None
    return x


def _reject_nan_stratum(value, col: str, op: str) -> None:
    """Raise on a REAL NaN stratum/group value (as seen driver-side in a
    collected Row, where NULL is None and NaN is float('nan'), so the
    two are distinguishable — unlike in the Arrow kernels, where pandas
    surfaces SQL NULL of a float column as NaN too).

    Spark groups NaN separately from NULL (NaN = NaN in groupBy /
    eqNullSafe), but the partition-scan kernels cannot tell them apart,
    so supporting NaN strata would silently merge the two groups. Loud
    rejection instead: normalize or filter NaN strata upstream.
    """
    if isinstance(value, float) and value != value:
        raise ValueError(
            f"{op}: {col!r} contains NaN stratum values; NaN strata are "
            "not supported (the Arrow partition scan cannot distinguish "
            "NaN from SQL NULL) — filter or normalize them first"
        )


def _nan_capable(dtype) -> bool:
    """True iff the Spark SQL type carries IEEE NaN semantics.

    Float/Double are the ONLY Spark types with a NaN value; every other
    numeric (ints, decimal, interval) cannot hold one, so a False flag
    for them is exact, not an approximation. Single authority for BOTH
    NaN paths of the take operators — ``mixture_take``'s monotone
    digest probe and ``_general_take_joinback``'s NULL/NaN
    disambiguation flag — so a future NaN-capable type (should Spark
    ever grow one, e.g. float16) is added here once and both paths
    move together instead of drifting.
    """
    from pyspark.sql.types import DoubleType, FloatType

    return isinstance(dtype, (DoubleType, FloatType))


def _cost_nan_flag(df: DataFrame, cost_col: str):
    """Spark-side genuine-NaN flag for a cost column: ``isnan()`` where
    the type has NaN semantics (:func:`_nan_capable`), literal False
    otherwise — built BEFORE the Arrow boundary, where NaN and SQL NULL
    are still distinguishable."""
    return (
        F.isnan(F.col(cost_col))
        if _nan_capable(df.schema[cost_col].dataType)
        else F.lit(False)
    )


def _task_pid(pdf, expected: int | None) -> int:
    """Enforce the one-``__pid``-per-task invariant the partition-scan
    kernels rely on (per-stratum state is keyed only by group, and
    driver offsets are attributed per stored partition id).

    The invariant holds because the explicit ``repartitionByRange(n,
    ...)`` disables AQE coalescing and ``localCheckpoint`` pins the
    partitions — but nothing in the plan ENFORCES it, so a future
    coalesce slipped between checkpoint and scan would silently
    mis-attribute offsets. This check makes that corruption a loud
    failure instead: every batch must carry a single ``__pid`` equal to
    the task's first.
    """
    pids = pdf["__pid"].to_numpy()
    pid = int(pids[0])
    if (pids != pid).any() or (expected is not None and expected != pid):
        raise RuntimeError(
            "partition-pinning invariant violated: one task observed "
            "multiple __pid values (a coalesce/repartition was inserted "
            "between the localCheckpoint and the partition scan)"
        )
    return pid


def mixture_take(
    df: DataFrame,
    strata_col: str,
    cost_col: str,
    budgets: dict[str, int],
    order_col: str,
    default_budget: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assemble a data MIXTURE: per-stratum cost budgets, range-parallel.

    ``budgets`` maps stratum value -> budget (e.g. {"en": 80_000,
    "fr": 20_000} chars — the 80/20 mixture recipe of a pretraining
    run). Rows are taken per stratum in deterministic ``order_col``
    order until that stratum's cumulative cost passes its own budget
    (first row over the line kept); strata not in ``budgets`` get
    ``default_budget`` (0 = excluded entirely). ``order_col`` MUST be
    unique within each stratum (a doc id, not a cost) — ties would make
    the running sum partition-layout-dependent, and the survivor
    join-back keys on (stratum, order).

    The obvious plan — ``SUM(cost) OVER (PARTITION BY stratum ORDER BY
    order)`` — is ONE TASK PER STRATUM: a 10-language corpus serializes
    onto 10 cores at any cluster size (at 1000 executors the skew is
    fatal). This is instead a CUTOFF computation on the NARROW
    (stratum, order, cost) projection, exploiting that with
    non-negative costs the running sum is monotone, so the kept set per
    stratum is exactly a PREFIX in ``order_col`` and the whole take
    reduces to one cutoff value per stratum:

      1. ``repartitionByRange(stratum, order)`` + sortWithinPartitions
         on the 3-column projection, ``localCheckpoint``-ed to pin the
         sampled range boundaries between passes (the
         :func:`global_index` discipline) — every stratum now spans as
         many parallel tasks as its data needs.
      2. One tiny aggregation collects per-(partition, stratum) cost
         sums and minima. Range partitioning makes each stratum a
         contiguous partition span, so this digest is
         O(partitions + strata) rows — the bounded-driver-state pattern
         every collect in this repo follows. The driver locates, per
         stratum, the single partition its budget line crosses (or
         none: the whole stratum fits its budget).
      3. ONLY the crossing partitions — at most one per stratum — are
         scanned through an Arrow ``mapInPandas`` to find each
         stratum's cutoff order value (the last row with running-sum
         -before < budget; the first row over the line is kept). One
         output row per crossing stratum.
      4. The result is ``df`` filtered by a row-local predicate against
         the broadcast cutoff table (null-safe joined on the stratum):
         budget > 0 AND cost IS NOT NULL AND (no cutoff | order IS
         NULL | order <= cutoff). The corpus itself never shuffles,
         never crosses Arrow, and Catalyst's pruning/pushdown on ``df``
         stays fully intact — strictly fewer exchanges than the window
         plan, at any scale.

    If the digest detects a negative or NaN cost (prefix property
    broken), the general fallback runs instead: the same two-pass
    prefix sum evaluated per row over every partition, survivors
    null-safe LEFT SEMI joined back (one wide shuffle, same as the
    window plan, still no per-stratum task).

    Semantics are pinned row-for-row against the one-window
    restatement (:func:`_cumulative_take_window`) by a randomized
    differential test on BOTH paths, including NULL strata (their own
    group), NULL order (sorts first), NULL cost (dropped, contributes
    nothing), and NaN cost (poisons the stratum's running sum from the
    NaN row onward — the NaN row and everything after it in order is
    dropped, exactly as ``SUM() OVER`` computes it). NaN STRATUM values
    are rejected loudly at digest time: Spark groups NaN separately
    from NULL, but the Arrow scan cannot tell the two apart — filter or
    normalize NaN strata upstream.
    """
    narrow_cols = list(dict.fromkeys([strata_col, order_col, cost_col]))
    for reserved in (
        "__budget", "__pid", "__nan", "__cut_g", "__cut_order", "__has_cut"
    ):
        if reserved in df.columns:
            raise ValueError(
                f"input must not contain the reserved column {reserved!r}"
            )
    budget_col = _budget_lookup(strata_col, budgets, default_budget)
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # NOT sorted here: the per-partition partial sums are order-free, so
    # the corpus-wide sort would be pure waste — only the (few) crossing
    # partitions get sortWithinPartitions, just before their cutoff scan
    # lazy checkpoint: the partials job right below is the first action,
    # so it both computes the digest AND pins the sampled range
    # boundaries in one job — later passes reuse the materialized
    # partitions, which is all the boundary-pinning needs
    ranged = (
        df.select(*narrow_cols)
        .withColumn("__budget", budget_col)
        .repartitionByRange(n, strata_col, order_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    partials = (
        ranged.groupBy("__pid", strata_col)
        .agg(
            F.sum(cost_col).alias("__s"),
            F.min(cost_col).alias("__m"),
            F.first("__budget").alias("__b"),
        )
        .collect()
    )
    per_stratum: dict = {}
    monotone = True
    for r in partials:
        s, m = r["__s"], r["__m"]
        # NaN sum or negative min breaks the prefix property the cutoff
        # path relies on (min() hides NaN in Spark; sum() propagates it)
        if (s is not None and s != s) or (m is not None and m < 0):
            monotone = False
        _reject_nan_stratum(r[strata_col], strata_col, "mixture_take")
        per_stratum.setdefault(_na_key(r[strata_col]), []).append(
            (r["__pid"], s, r["__b"])
        )
    if not monotone:
        return _general_take_joinback(
            df, ranged, strata_col, order_col, cost_col, per_stratum
        )

    # locate, per stratum, the one partition where the running cost
    # crosses the budget; strata that never cross keep every row
    crossing: dict = {}  # (pid, stratum) -> (offset_before, budget)
    for gk, lst in per_stratum.items():
        b = lst[0][2]
        if b is None or b <= 0:
            continue  # budget > 0 predicate below drops these anyway
        acc = 0
        for pid, s, _ in sorted(lst, key=lambda t: t[0]):
            if s is not None:
                if acc + s >= b:
                    crossing[(pid, gk)] = (acc, b)
                    break
                acc += s

    keep_base = (budget_col > 0) & F.col(cost_col).isNotNull()
    if not crossing:
        return df.filter(keep_base)

    bc = spark.sparkContext.broadcast(crossing)
    scan = ranged.filter(
        F.col("__pid").isin(sorted({pid for pid, _ in crossing}))
    ).sortWithinPartitions(strata_col, order_col)
    from pyspark.sql.types import StructField, StructType

    narrow_fields = {f.name: f for f in ranged.schema.fields}
    cut_schema = StructType(
        [
            narrow_fields[strata_col],
            StructField("__cut_order", narrow_fields[order_col].dataType, True),
        ]
    )

    def find_cuts(batches):
        import numpy as np
        import pandas as pd

        # stratum -> [running cost so far, last kept order or None]
        state: dict = {}
        task_pid = None
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            pid = task_pid = _task_pid(pdf, task_pid)
            g = pdf[strata_col].to_numpy(object)
            c = pdf[cost_col].to_numpy()
            na = pdf[cost_col].isna().to_numpy()
            filled = np.where(na, 0, c) if na.any() else c
            orders = pdf[order_col]
            i = 0
            while i < m:
                gk = _na_key(g[i])
                j = i + 1
                while j < m and _na_key(g[j]) == gk:
                    j += 1
                hit = bc.value.get((pid, gk))
                if hit is not None:
                    offset, b = hit
                    st = state.setdefault(gk, [offset, None])
                    cum = st[0] + np.cumsum(filled[i:j])
                    # kept rows have running-sum-BEFORE < budget; rows
                    # are order-sorted, so the last such row is the cut
                    kept = (cum - filled[i:j]) < b
                    if kept.any():
                        last = i + int(np.nonzero(kept)[0][-1])
                        ov = orders.iloc[last]
                        st[1] = None if pd.isna(ov) else ov
                    st[0] = cum[-1]
                i = j
        if state:
            yield pd.DataFrame(
                {
                    strata_col: [gk for gk in state],
                    "__cut_order": [st[1] for st in state.values()],
                },
                dtype=object,
            )

    # cuts stays LAZY: it reads the pinned checkpoint, so it is safe to
    # evaluate inside the final query (as the broadcast build side) —
    # one fewer eager job per take
    cuts = (
        scan.mapInPandas(find_cuts, schema=cut_schema)
        .withColumnRenamed(strata_col, "__cut_g")
        .withColumn("__has_cut", F.lit(True))
    )
    # null-safe: a NULL stratum is a real group; its cutoff row carries
    # a NULL key that a plain equi-join would silently miss
    joined = df.join(
        F.broadcast(cuts), df[strata_col].eqNullSafe(cuts["__cut_g"]), "left"
    )
    # NULL order sorts first, so that row is the stratum's first — and a
    # crossing stratum always keeps its first row (prev = 0 < budget)
    keep = keep_base & (
        F.col("__has_cut").isNull()
        | F.col(order_col).isNull()
        | (F.col(order_col) <= F.col("__cut_order"))
    )
    return joined.filter(keep).drop("__cut_g", "__cut_order", "__has_cut")


def _general_take_joinback(
    df: DataFrame,
    ranged: DataFrame,
    strata_col: str,
    order_col: str,
    cost_col: str,
    per_stratum: dict,
) -> DataFrame:
    """:func:`mixture_take` fallback for non-monotone costs (negative or
    NaN): the :func:`global_index` two-pass prefix sum evaluated PER ROW
    over every partition — per-stratum offsets broadcast, an Arrow
    ``mapInPandas`` adds offset + local prefix and applies the cutoff
    row-by-row, survivors null-safe LEFT SEMI joined back to the full
    rows. One wide shuffle (the join), same as the window plan — but
    still never a one-task-per-stratum window.

    NaN costs match ``SUM() OVER`` exactly: NaN POISONS the stratum's
    running sum from the NaN row onward (every later row's
    running-before is NaN, and ``NaN < budget`` is false in both Spark
    and numpy), so the NaN row and everything after it in the stratum
    is dropped — while NULL costs contribute 0 and only drop their own
    row. pandas cannot tell the two apart (Arrow surfaces SQL NULL of a
    float column as NaN), so a Spark-side ``isnan`` flag travels with
    the scan and only TRUE NULLs are zero-filled before the prefix
    cumsum; genuine NaN stays in place and propagates through
    ``np.cumsum``, the per-task carry, and the driver offsets alike.
    """
    spark = df.sparkSession
    offsets: dict = {}
    for gk, lst in per_stratum.items():
        acc = 0
        for pid, s, _ in sorted(lst, key=lambda t: t[0]):
            offsets[(pid, gk)] = acc
            if s is not None:
                acc += s
    bc = spark.sparkContext.broadcast(offsets)
    out_schema = ranged.select(strata_col, order_col).schema
    # pandas conflates SQL NULL with NaN for float columns, and the two
    # have OPPOSITE window semantics (NULL contributes 0 and drops only
    # itself; NaN poisons the running sum onward) — flag genuine NaN
    # Spark-side, where the distinction still exists
    if not _nan_capable(ranged.schema[cost_col].dataType):
        # the digest saw a NaN sum (that's one way callers land here)
        # from a type this module doesn't know to carry NaN: the __nan
        # flag below would silently misfile those rows as SQL NULLs
        # (contribute 0) instead of poisoning the prefix — refuse loudly
        # until the type is added to _nan_capable.
        for lst in per_stratum.values():
            if any(s is not None and s != s for _, s, _ in lst):
                raise TypeError(
                    f"{cost_col!r} has type "
                    f"{ranged.schema[cost_col].dataType.simpleString()}, "
                    "which this operator does not model as NaN-capable, "
                    "yet its digest sums contain NaN — add the type to "
                    "_nan_capable so NULL/NaN disambiguation stays exact"
                )
    scan_src = ranged.withColumn(
        "__nan", F.coalesce(_cost_nan_flag(ranged, cost_col), F.lit(False))
    )

    def take(batches):
        import numpy as np

        carry: dict = {}  # stratum -> cost accumulated so far THIS partition
        task_pid = None
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            pid = task_pid = _task_pid(pdf, task_pid)
            g = pdf[strata_col].to_numpy(object)
            c = pdf[cost_col].to_numpy()
            b = pdf["__budget"].to_numpy()
            na = pdf[cost_col].isna().to_numpy()  # NULL or NaN — conflated
            nan = pdf["__nan"].to_numpy().astype(bool)
            null = na & ~nan  # true SQL NULLs only
            # true NULLs contribute 0 (SUM skips them); genuine NaN is
            # left in place so np.cumsum poisons the prefix from there
            # on, matching SUM() OVER. Integral cost stays exact int64;
            # nullable/float goes f64.
            filled = np.where(null, 0, c) if null.any() else c
            keep = np.zeros(m, dtype=bool)
            # strata are contiguous runs (sorted within partition):
            # vectorize per run, few runs per batch
            i = 0
            while i < m:
                gk = _na_key(g[i])
                j = i + 1
                while j < m and _na_key(g[j]) == gk:
                    j += 1
                start = carry.get(gk)
                if start is None:
                    start = bc.value.get((pid, gk), 0)
                cum = np.cumsum(filled[i:j])
                prev = start + cum - filled[i:j]
                keep[i:j] = (b[i:j] > 0) & ~na[i:j] & (prev < b[i:j])
                carry[gk] = start + (cum[-1] if j > i else 0)
                i = j
            yield pdf.loc[keep, [strata_col, order_col]]

    survivors = scan_src.sortWithinPartitions(strata_col, order_col).mapInPandas(
        take, schema=out_schema
    )
    cond = df[strata_col].eqNullSafe(survivors[strata_col]) & df[
        order_col
    ].eqNullSafe(survivors[order_col])
    return df.join(survivors, cond, "left_semi")


def pack_documents(
    df: DataFrame,
    id_col: str,
    cost_col: str,
    budget: int,
    shards: int = 64,
    shard_col: str = "shard",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Sequence packing: assign docs to fixed-cost packs (shard, pack_id).

    The step that turns a filtered corpus into training sequences: docs
    accumulate (in deterministic ``id_col`` order) into packs of
    ~``budget`` cost; a doc straddling a boundary belongs to the pack
    where it starts (capacity packing with overflow — the standard
    greedy rule). Packing runs PER SHARD (md5 hash of the id), so the
    running-sum scan parallelizes instead of being one global sequential
    pass — real pipelines pack per output shard anyway, and the shard
    assignment is engine/partitioning-independent like every hash here.
    """
    if budget <= 0:
        raise ValueError("budget must be > 0")
    out = df.withColumn(shard_col, hash_bucket(id_col, shards))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(cost_col).over(w)
    # pack_id stays long: at 100 TB with few shards and a small budget the
    # running-sum // budget exceeds int32 and an ANSI cast would fail.
    return out.withColumn(
        pack_col, F.floor((running - F.col(cost_col)) / budget)
    )


def budgeted_take(
    df: DataFrame,
    group_col: str,
    cost_col: str,
    budget: int,
    order_col: str,
) -> DataFrame:
    """Take rows per group, in ``order_col`` order, until the group's
    cumulative cost exceeds ``budget`` (the first row over the line is
    kept, so every non-empty group yields at least one row).

    ``order_col`` MUST be unique within each group (a doc id, not a
    cost): ties would make the running sum depend on partition layout,
    and which rows survive the cutoff would change between runs — the
    determinism this module guarantees. ``cost_col`` is used as a
    tiebreak-free secondary guard by never being the sort key.

    The token-budget sampler: cap each language/source at N tokens.
    The single-budget special case of ``mixture_take`` (delegates, so
    the cumulative-take semantics — and its range-parallel two-pass
    plan, never a one-task-per-group window — live in exactly one
    place). Driver state is the O(partitions + groups) offset digest.
    """
    return mixture_take(
        df, group_col, cost_col, budgets={}, order_col=order_col,
        default_budget=budget,
    )


def global_index(
    df: DataFrame,
    order_cols: list[str] | str,
    index_col: str = "global_idx",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous global index (start, start+1, ...) in total
    ``order_cols`` order — WITHOUT the single-task global window that
    ``row_number() OVER (ORDER BY ...)`` costs at scale.

    The training-pipeline primitive behind "assign every sample a stable
    id" and (via a hash sort key) "epoch-seeded reproducible corpus
    shuffle". Three steps, none of which funnels data through one task:

      1. ``repartitionByRange(order_cols)`` + ``sortWithinPartitions``:
         total order ACROSS partitions, local order within. The frame is
         ``localCheckpoint``-ed to pin the sampled range boundaries —
         the count pass and the index pass MUST see identical
         partitioning (RangePartitioner re-sampling between jobs could
         otherwise move rows between partitions).
      2. One tiny aggregation collects per-partition row counts — the
         only driver-side data is O(num_partitions) longs (same bounded
         pattern as connected components' convergence digest).
      3. Cumulative offsets broadcast back; an Arrow-batched
         ``mapInPandas`` adds offset + local position. No extra shuffle:
         the window alternative (row_number per partition id) would
         re-shuffle the full frame on __pid because Catalyst cannot see
         the frame is already partitioned by it.

    Ties across ``order_cols`` land in one partition (range partitioning
    guarantees it) but their relative order is not defined — pass a
    unique key (e.g. the primary id) as the last order column for a
    fully deterministic index.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    if isinstance(order_cols, str):
        order_cols = [order_cols]
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    if index_col in df.columns:
        raise ValueError(f"index_col {index_col!r} collides with an input column")
    if "__pid" in df.columns:
        raise ValueError("input must not contain the reserved column '__pid'")
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = int(start)
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    bc = spark.sparkContext.broadcast(offsets)
    out_schema = StructType(
        [f for f in ranged.schema.fields if f.name != "__pid"]
        + [StructField(index_col, LongType(), False)]
    )

    def add_index(batches):
        pos: int | None = None
        task_pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            task_pid = _task_pid(pdf, task_pid)
            if pos is None:
                pos = bc.value[task_pid]
            out = pdf.drop(columns="__pid")
            out[index_col] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield out

    return ranged.mapInPandas(add_index, schema=out_schema)


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    seed: str = "epoch-0",
    index_col: str = "shuffle_idx",
) -> DataFrame:
    """Epoch-seeded reproducible global shuffle: order by
    ``md5(seed || key)`` and assign a contiguous position via
    :func:`global_index`.

    Changing ``seed`` ("epoch-1", ...) produces an independent
    permutation of the same corpus; the same seed always yields the
    same order on any cluster size — the property training-data
    loaders need and ``ORDER BY rand()`` cannot give (a retried map
    task would re-draw). md5 is engine-portable, so the permutation is
    reproducible outside Spark too.
    """
    shuffled = df.withColumn(
        "__shuffle_key", F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(key_col).cast("string")))
    )
    out = global_index(shuffled, ["__shuffle_key"], index_col=index_col)
    return out.drop("__shuffle_key")


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    key_out: str = "sample_key",
    round_to: int = 6,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement: the k rows with
    the smallest Efraimidis-Spirakis keys ``-ln(u) / weight``, where
    ``u`` in (0, 1] is derived from md5 of the row key instead of an RNG.

    Every property of a true weighted reservoir sample holds (inclusion
    probability proportional to weight, no replacement), but the draw is
    a pure function of (key, weight): reruns, retries, cluster resizes
    and other engines all select the identical rows — ``ORDER BY
    -ln(random())/w LIMIT k`` gives none of that. Nested like the other
    samplers here: the k=100 sample is a prefix of the k=1000 one.

    Plan shape: the key is codegen scalar math over the scan; selection
    is an ``orderBy(...).limit(k)`` which Spark executes as
    TakeOrderedAndProject — each partition keeps its local top-k and the
    driver merges k-sized heaps, so no global sort materializes at any
    corpus size. Rows with weight <= 0 or NULL are excluded (a zero
    weight cannot be sampled; -ln(u)/0 is undefined).

    The sort ranks on the ROUNDED key (``round_to`` decimals, also the
    emitted value) with the row key as tiebreak, so ranking never
    depends on sub-rounding float noise that could differ across
    engines' libm.
    """
    if k <= 0:
        raise ValueError("k must be > 0")
    if key_out in df.columns:
        raise ValueError(f"key_out {key_out!r} collides with an input column")
    return (
        # NULL keys are excluded with the nonpositive weights: a row
        # without identity has no deterministic draw (and NULL sort
        # position differs between engines — Spark NULLS FIRST would
        # silently "win" the sample where DuckDB sorts them last)
        df.filter(
            F.col(key_col).isNotNull() & (F.col(weight_col).cast("double") > 0)
        )
        .withColumn(key_out, _es_sample_key(key_col, weight_col, round_to))
        .orderBy(F.col(key_out), F.col(key_col))
        .limit(k)
    )


def _es_sample_key(key_col: str, weight_col: str, round_to: int = 6) -> Column:
    """The Efraimidis-Spirakis draw as a deterministic expression:
    -ln(u)/weight with u derived from md5 of the row key.

    md5_long(hex_chars=15) is uniform on [0, 2^60); +1 shifts to
    (0, 2^60] so u is in (0, 1] and ln(u) is finite. Rounded so
    cross-engine libm noise below ``round_to`` decimals can never flip
    a ranking.
    """
    from atiesh_spark.functions.hashing import md5_long

    u = (md5_long(F.col(key_col).cast("string"), 15) + F.lit(1)) / F.lit(
        float(1 << 60)
    )
    return F.round(-F.log(u) / F.col(weight_col).cast("double"), round_to)


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    k: int,
    shards: int = 16,
    key_out: str = "sample_key",
) -> DataFrame:
    """Deterministic weighted sample of up to ``k`` rows PER GROUP —
    the per-language / per-source variant of :func:`weighted_sample`
    (a mixture recipe with weighted draws inside each stratum).

    Same Efraimidis-Spirakis keys, so all its properties hold within
    each group (weight-proportional inclusion, nested prefixes,
    rerun/engine stability). Selection is the two-phase rank of
    ``curation.cap_per_group`` — rank within (group, md5-shard of the
    row key), keep k, re-rank the <= k * shards survivors within the
    group — provably identical to the single per-group window while
    bounding the hottest group's task at k * shards rows.
    """
    from pyspark.sql.window import Window

    if k <= 0 or shards <= 0:
        raise ValueError("k and shards must be > 0")
    reserved = {key_out, "__shard", "__rk"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input columns collide with reserved names: {sorted(clash)}")
    keyed = (
        df.filter(
            F.col(key_col).isNotNull() & (F.col(weight_col).cast("double") > 0)
        )
        .withColumn(key_out, _es_sample_key(key_col, weight_col))
        .withColumn("__shard", hash_bucket(key_col, shards))
    )
    w1 = Window.partitionBy(group_col, "__shard").orderBy(key_out, key_col)
    w2 = Window.partitionBy(group_col).orderBy(key_out, key_col)
    return (
        keyed.withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= k)
        .withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= k)
        .drop("__shard", "__rk")
    )


class StreamingWeightedSample:
    """Maintain a deterministic weighted reservoir of size k over a
    stream, as a ``foreachBatch`` function.

    Because :func:`weighted_sample` keys are a pure function of
    (row key, weight), top-k under them is a MONOID: merging each
    batch's local top-k with the stored reservoir and re-taking the k
    smallest keys equals the batch sample over all rows ever seen —
    the streaming reservoir-sampling guarantee (A-ES), with none of
    the RNG state a random reservoir would have to checkpoint, and
    bit-identical to the batch operator at every point in the stream.

    State backend is ``sources/versioned.VersionedStore`` (k rows per
    version — tiny), so failure replays converge like every other
    maintenance loop here. Per batch the work is the batch's own
    TakeOrderedAndProject plus a union with k stored rows.
    """

    def __init__(
        self,
        key_col: str,
        weight_col: str,
        k: int,
        path: str,
        key_out: str = "sample_key",
        keep_versions: int = 2,
    ) -> None:
        from atiesh_spark.sources.versioned import VersionedStore

        if k <= 0:
            raise ValueError("k must be > 0")
        self.key_col, self.weight_col, self.k = key_col, weight_col, k
        self.key_out = key_out
        self.store = VersionedStore(path, keep_versions=keep_versions)

    def read(self, spark) -> DataFrame:
        return self.store.read(spark)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        top = weighted_sample(
            batch_df, self.key_col, self.weight_col, self.k, key_out=self.key_out
        )
        prev = self.store.read_before(spark, batch_id)
        if prev is not None:
            top = (
                prev.unionByName(top)
                .orderBy(F.col(self.key_out), F.col(self.key_col))
                .limit(self.k)
            )
        self.store.write(top, batch_id)


def balanced_shards(
    df: DataFrame,
    weight_col: str,
    num_shards: int,
    id_col: str,
    shard_col: str = "shard",
) -> DataFrame:
    """Assign rows to ``num_shards`` export shards with near-equal total
    ``weight_col`` (bytes, tokens) per shard — the training-shard prep
    step: uniform shards keep data-parallel workers in step and make
    sampling-by-shard unbiased.

    Serpentine (boustrophedon) assignment over the weight-descending
    order: rank rows by (weight desc, id), then walk shards 0..S-1,
    S-1..0, ... so every shard gets one row from each size block and
    alternating block order cancels within-block skew — deterministic,
    one pass, and empirically within ~one max-row-weight of perfect
    balance on heavy-tailed corpora (greedy bin-packing would need a
    sequential driver loop; this is the distributed-friendly standard).

    The rank comes from :func:`global_index` — range partitioning +
    per-partition offsets, NEVER a single-task global window — and the
    shard math is row-local codegen after it. NULL weights sort last
    (treated as 0-cost rows).
    """
    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    if shard_col in df.columns:
        raise ValueError(f"shard_col {shard_col!r} collides with an input column")
    if "__negw" in df.columns:
        raise ValueError("input must not contain the reserved column '__negw'")
    neg = F.coalesce(-F.col(weight_col).cast("double"), F.lit(0.0))
    ranked = global_index(
        df.withColumn("__negw", neg), ["__negw", id_col], index_col="__r"
    )
    s = F.lit(num_shards)
    # Integer division in-plan ('div'), never double division: for huge
    # ranks with a non-power-of-two shard count the correctly-rounded
    # double quotient can land exactly on an integer and flip the block
    # parity vs. true r // s, mis-assigning serpentine boundary rows.
    block_even = F.expr(f"__r div {num_shards}") % 2 == 0
    pos = F.col("__r") % s
    return ranked.withColumn(
        shard_col,
        F.when(block_even, pos).otherwise(s - 1 - pos).cast("int"),
    ).drop("__negw", "__r")


def shard_report(
    df: DataFrame,
    weight_col: str,
    shard_col: str = "shard",
    round_to: int = 4,
) -> DataFrame:
    """(shard, n_rows, total_weight, weight_share): the balance audit
    for :func:`balanced_shards` output — one map-side-combined groupBy
    plus a broadcast total."""
    totals = df.agg(F.sum(F.col(weight_col).cast("double")).alias("__t"))
    return (
        df.groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(weight_col).cast("double")).alias("total_weight"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(shard_col),
            "n_rows",
            "total_weight",
            F.round(F.col("total_weight") / F.col("__t"), round_to).alias(
                "weight_share"
            ),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    text_col: str | None = None,
    clusters: DataFrame | None = None,
    split_col: str = "split",
    rep_col: str = "cluster_rep",
) -> DataFrame:
    """Train/val/test split where DUPLICATE CLUSTERS stay whole — the
    leakage guard :func:`deterministic_split` alone cannot give: split
    by doc id and two copies of the same page land in train AND val,
    silently inflating eval (the arXiv:2107.06499 finding). Here every
    row first maps to a cluster representative, and the hash-bucket
    split is taken on the REP, so a whole duplicate cluster moves as
    one unit; the rep is appended as ``rep_col`` for auditability.

    Cluster source, either:
    - ``text_col``: exact-duplicate clusters, rep = min id per
      md5(text) — one md5 groupBy + one hash equi-join, the
      exact_dedup shape (md5, never raw text, shuffles); or
    - ``clusters``: a precomputed ``(id_col, rep_col)`` frame — e.g.
      ``dedup.connected_components`` output, so MinHash/SimHash/
      embedding NEAR-dup clusters split atomically too. Rows absent
      from ``clusters`` are their own rep (singleton clusters don't
      need rows in the map).

    Inherits deterministic_split's contract on the rep: stable across
    runs/engines/partitionings, and new rows never reshuffle old
    assignments (a new duplicate of a train page joins train — exactly
    what leakage-safety requires).
    """
    if (text_col is None) == (clusters is None):
        raise ValueError("give exactly one of text_col or clusters")
    if rep_col in df.columns or split_col in df.columns:
        raise ValueError(f"{rep_col!r}/{split_col!r} collide with input columns")
    if text_col is not None:
        # NULL text ⇒ singleton cluster keyed on own id (md5(NULL) is
        # NULL, and a NULL key never matches the equi-join below — rows
        # would silently vanish from the split otherwise). The "\x00id:"
        # prefix can't collide with an md5 hex digest.
        keyed = df.withColumn(
            "__lsh",
            F.coalesce(
                F.md5(F.col(text_col).cast("binary")),
                F.concat(F.lit("\x00id:"), F.col(id_col).cast("string")),
            ),
        )
        reps = keyed.groupBy("__lsh").agg(F.min(id_col).alias(rep_col))
        mapped = keyed.join(reps, "__lsh").drop("__lsh")
    else:
        if set(clusters.columns) != {id_col, rep_col}:
            raise ValueError(
                f"clusters must have exactly columns ({id_col!r}, {rep_col!r})"
            )
        mapped = df.join(clusters, id_col, "left").withColumn(
            rep_col, F.coalesce(F.col(rep_col), F.col(id_col))
        )
    return deterministic_split(mapped, rep_col, fractions, split_col)


def materialize_mixture(
    df: DataFrame,
    group_col: str,
    id_col: str,
    epochs: dict[str, float],
    copy_col: str = "epoch_copy",
) -> DataFrame:
    """Materialize fractional per-group epoch counts into actual rows —
    the step between :func:`temperature_weights`' ``epochs_at_parity``
    numbers and a training corpus: a group with epochs 2.3 contributes
    every row twice (``copy_col`` 0 and 1) plus a deterministic 30%
    subset a third time (``copy_col`` 2).

    The fractional subset reuses :func:`deterministic_split`'s
    hash-bucket contract, salted by the copy index: md5(id || '#' ||
    copy) buckets, so (a) the selection is reproducible across
    runs/engines/partitionings, (b) different groups' fractions are
    independent, and (c) re-materializing with a LARGER epoch count
    only ADDS copies — existing (id, copy) pairs never flip out, the
    same stability deterministic_split gives splits.

    Plan: explode over sequence(0, ceil(e)-1) then one row-local bucket
    filter — no shuffle at all; the output order/partitioning follows
    the input scan. Groups absent from ``epochs`` default to 1.0 (one
    clean copy). Epochs must be > 0.
    """
    import math

    from atiesh_spark.functions.hashing import md5_long

    for g, e in epochs.items():
        if not e > 0:
            raise ValueError(f"epochs for {g!r} must be > 0, got {e}")
    if copy_col in df.columns:
        raise ValueError(f"copy_col {copy_col!r} collides with an input column")
    # integer (full copies, fractional cutoff-of-10000) pairs computed
    # DRIVER-side: float->int conversion semantics differ across engines
    # (Spark cast truncates, DuckDB cast rounds), so no fractional float
    # ever reaches a plan
    n_full = F.lit(1)
    cut = F.lit(0)
    n_total = F.lit(1)
    for g, e in epochs.items():
        full = int(math.floor(e))
        c = int(round((e - full) * 10_000))
        cond = F.col(group_col) == g
        n_full = F.when(cond, F.lit(full)).otherwise(n_full)
        cut = F.when(cond, F.lit(c)).otherwise(cut)
        n_total = F.when(cond, F.lit(full + (1 if c else 0))).otherwise(n_total)
    out = df.select(
        "*", F.explode(F.sequence(F.lit(0), n_total - 1)).alias(copy_col)
    )
    bucket = F.pmod(
        md5_long(
            F.concat(
                F.col(id_col).cast("string"),
                F.lit("#"),
                F.col(copy_col).cast("string"),
            ),
            15,
        ),
        F.lit(10_000),
    )
    keep = (F.col(copy_col) < n_full) | (bucket < cut)
    return out.filter(keep)


def pack_with_offsets(
    df: DataFrame,
    id_col: str,
    cost_col: str,
    budget: int,
    shards: int = 64,
    shard_col: str = "shard",
    pack_col: str = "pack_id",
) -> DataFrame:
    """:func:`pack_documents` plus the per-document layout a trainer
    actually consumes: ``seq_index`` (position of the doc within its
    pack) and ``start_offset``/``end_offset`` (cumulative-cost span of
    the doc inside the pack) — exactly the boundaries an
    attention-mask/position-id builder needs to keep packed documents
    from attending across each other (the packing-done-right detail).

    Adds one window over (shard, pack) on top of pack_documents'
    (shard) window — a second exchange, but both run on the NARROW
    (id, cost) projection; join the result back to wide rows by id.
    Same determinism contract: md5 shards, id-ordered scans.
    """
    packed = pack_documents(
        df.select(id_col, cost_col), id_col, cost_col, budget,
        shards=shards, shard_col=shard_col, pack_col=pack_col,
    )
    w = Window.partitionBy(shard_col, pack_col).orderBy(id_col)
    run = F.sum(cost_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return packed.select(
        id_col,
        F.col(shard_col).cast("long").alias(shard_col),
        F.col(pack_col).cast("long").alias(pack_col),
        (F.row_number().over(w) - 1).cast("long").alias("seq_index"),
        (run - F.col(cost_col)).cast("long").alias("start_offset"),
        run.cast("long").alias("end_offset"),
    )


def excess_loss_weights(
    per_group: DataFrame,
    group_col: str,
    n_col: str,
    loss_col: str,
    eta: float = 1.0,
    round_to: int = 4,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023,
    arXiv:2305.10429, one exponentiated-gradient step with the corpus
    itself as reference): (group, n, bits, excess, weight).

    ``per_group`` carries one row per domain with its example count
    (``n_col``) and its MEAN loss in bits (``loss_col``, e.g. the KN
    bits/bigram from ngramlm — higher = harder for the reference
    model). excess = max(0, bits - corpus_mean_bits); weight ∝
    baseline share × exp(eta · excess), normalized — hard domains are
    upweighted relative to their natural share, domains at or below
    the corpus mean keep it. The input is a DOMAIN-sized relation
    (never per-example), so every step here is a broadcast-total
    crossJoin + row-local arithmetic: the expensive part (per-example
    loss) already happened upstream.
    """
    total = per_group.agg(
        F.sum(n_col).alias("__tn"),
        F.sum(F.col(loss_col) * F.col(n_col)).alias("__tl"),
    )
    base = per_group.crossJoin(F.broadcast(total)).select(
        F.col(group_col),
        F.col(n_col).alias("__n"),
        F.col(loss_col).alias("__bits"),
        (F.col(n_col) / F.col("__tn")).alias("__share"),
        F.greatest(
            F.col(loss_col) - F.col("__tl") / F.col("__tn"), F.lit(0.0)
        ).alias("__excess"),
    )
    scored = base.select(
        group_col, "__n", "__bits", "__excess",
        (F.col("__share") * F.exp(F.lit(float(eta)) * F.col("__excess")))
        .alias("__raw"),
    )
    z = scored.agg(F.sum("__raw").alias("__z"))
    return scored.crossJoin(F.broadcast(z)).select(
        F.col(group_col),
        F.col("__n").cast("bigint").alias("n"),
        F.round("__bits", round_to).alias("bits"),
        F.round("__excess", round_to).alias("excess"),
        F.round(F.col("__raw") / F.col("__z"), round_to).alias("weight"),
    )
