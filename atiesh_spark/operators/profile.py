"""Table profiling: per-column null/distinct/min/max statistics.

The data-quality report a pipeline runs before and after every major
transformation (ingest, dedup, filtering) to catch schema drift, null
explosions, and truncated value ranges. One aggregate pass over the
table — Spark evaluates all per-column aggregates in a single scan
(multiple DISTINCT aggregates expand into one multi-way aggregate, still
one pass over the data) — then the wide single row is exploded into the
long (col_name, stats...) layout reports want.

Numeric min/max are formatted AFTER aggregation ('%.4f' for floating
point, plain string cast otherwise) so values render identically in any
engine — Java's Double.toString switches to scientific notation at 1e7
where other engines don't, so raw double->string casts are not
portable.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FLOATING = ("double", "float")


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile columns: (col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value) — one row per profiled column, one scan total.

    min/max are rendered as strings (the only honest common type across
    a mixed-type column list); floating-point columns use fixed '%.4f'
    formatting, everything else a plain cast. Complex-typed columns
    (arrays, maps, structs) are rejected — min/max has no portable
    meaning for them.
    """
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    for c in cols:
        if c not in dtypes:
            raise KeyError(f"unknown column {c!r}")
        if dtypes[c].startswith(("array", "map", "struct")):
            raise ValueError(f"cannot profile complex-typed column {c!r} ({dtypes[c]})")

    def render(agg_col: F.Column, dtype: str) -> F.Column:
        if dtype in _FLOATING:
            return F.format_string("%.4f", agg_col)
        return agg_col.cast("string")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            render(F.min(F.col(c)), dtypes[c]).alias(f"__min_{c}"),
            render(F.max(F.col(c)), dtypes[c]).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    p_low: float = 0.01,
    p_high: float = 0.99,
    round_to: int = 4,
) -> DataFrame:
    """Percentile clipping: input columns plus ``clipped`` — ``value_col``
    clipped into the (exact, linearly interpolated) [p_low, p_high]
    percentile range, computed per ``group_col`` stratum (or globally
    when None). The outlier-taming step before loss-sensitive statistics
    (mean quality scores, per-source cost summaries) where a single
    corrupt value would otherwise dominate.

    Plan: one groupBy computes both percentiles (exact ``percentile``,
    the interpolation DuckDB's quantile_cont and numpy's linear method
    share), and the per-group bounds frame — stratum-sized, tiny — is
    BROADCAST back onto the rows: no second shuffle of the data.
    NULL values stay NULL (clipping is not imputation).
    """
    if not 0.0 <= p_low < p_high <= 1.0:
        raise ValueError("need 0 <= p_low < p_high <= 1")
    gcols = [group_col] if group_col else []
    bounds = df.groupBy(*gcols).agg(
        F.percentile(F.col(value_col), F.lit(float(p_low))).alias("__lo"),
        F.percentile(F.col(value_col), F.lit(float(p_high))).alias("__hi"),
    )
    joined = (
        df.join(F.broadcast(bounds), gcols)
        if gcols
        else df.crossJoin(F.broadcast(bounds))
    )
    # guard NULL explicitly: Spark's greatest/least IGNORE nulls, which
    # would silently impute a null value to the low bound
    clip = F.when(
        F.col(value_col).isNotNull(),
        F.round(
            F.least(F.col("__hi"), F.greatest(F.col("__lo"), F.col(value_col))),
            round_to,
        ),
    )
    return joined.select(*df.columns, clip.alias("clipped"))



def histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Fixed-width histogram: (bin, bin_lo, bin_hi, n) for ``bins``
    equal-width buckets over [lo, hi] — the distribution report behind
    every profiling dashboard. NULLs are excluded; values outside an
    explicit [lo, hi] clamp into the edge bins (so a histogram over a
    known domain never silently drops rows).

    When bounds are not given they come from a min/max aggregate whose
    single-row result is BROADCAST into the binning pass — two scans
    total, no driver round-trip in the plan. Pass literal bounds to make
    it one scan. Bin arithmetic is plain codegen float math:
    bin = clamp(floor((v - lo) / width)) — identical in any engine, so
    the report is oracle-checkable. A degenerate lo == hi domain puts
    everything in bin 0.
    """
    if bins <= 0:
        raise ValueError("bins must be positive")
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        bounds = df.agg(
            F.min(v).cast("double").alias("__lo"), F.max(v).cast("double").alias("__hi")
        )
        binned = df.filter(v.isNotNull()).crossJoin(F.broadcast(bounds))
        lo_c, hi_c = F.col("__lo"), F.col("__hi")
    else:
        binned = df.filter(v.isNotNull())
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    width = (hi_c - lo_c) / F.lit(float(bins))
    raw = F.when(width > 0, F.floor((v - lo_c) / width)).otherwise(F.lit(0))
    b = F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw)).cast("int")
    return (
        binned.select(
            b.alias("bin"),
            F.round(lo_c + b * width, 6).alias("bin_lo"),
            F.round(lo_c + (b + 1) * width, 6).alias("bin_hi"),
        )
        .groupBy("bin", "bin_lo", "bin_hi")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def group_standardize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "zscore",
    round_to: int = 4,
) -> DataFrame:
    """Per-group z-score standardization: ``(v - mean) / stddev_pop``,
    appended as ``out_col`` (rounded; NULL when the group is constant or
    the value is NULL) — the feature-normalization step of a training
    pipeline, per language / per source / per tenant.

    Plan shape: one groupBy computes the per-group moments (map-side
    partial aggregation shrinks each partition to one row per group
    before the exchange), then the moment table — group-cardinality
    sized, i.e. tiny — broadcasts back onto the fact rows. The fact
    table itself NEVER shuffles, which is the difference from the
    ``AVG(...) OVER (PARTITION BY group)`` formulation: a window would
    exchange and sort all 100 TB by group and serialize each group
    through one task.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} collides with an input column")
    moments = df.groupBy(*group_cols).agg(
        F.avg(F.col(value_col).cast("double")).alias("__mu"),
        F.stddev_pop(F.col(value_col).cast("double")).alias("__sigma"),
    )
    z = F.when(
        F.col("__sigma") > 0,
        F.round((F.col(value_col).cast("double") - F.col("__mu")) / F.col("__sigma"), round_to),
    )
    # null-safe join keys: a NULL group is a group (SQL window semantics),
    # not a row to silently drop the way a plain equi-join would
    mom = moments.select(
        *[F.col(c).alias(f"__g{i}") for i, c in enumerate(group_cols)],
        "__mu",
        "__sigma",
    )
    cond = None
    for i, c in enumerate(group_cols):
        e = F.col(c).eqNullSafe(F.col(f"__g{i}"))
        cond = e if cond is None else cond & e
    return (
        df.join(F.broadcast(mom), cond)
        .withColumn(out_col, z)
        .drop(*[f"__g{i}" for i in range(len(group_cols))], "__mu", "__sigma")
    )


def cdf_normalize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "pct_rank",
    round_to: int = 4,
) -> DataFrame:
    """Per-group CDF transform: append each value's empirical percentile
    rank within its group (``percent_rank``, ties share a rank; rounded)
    — quantile normalization, the scale-free sibling of
    ``group_standardize`` for heavy-tailed features.

    NULL values take no part in the ranking and come back with a NULL
    rank (window NULL ordering differs between engines, so excluding
    them is the only portable semantics).

    Engine shape — NEVER ``percent_rank() OVER (PARTITION BY group)``
    on the fact table: with a low-cardinality group (market segment,
    language) that is one task sorting the whole group (the
    budgeted_take failure class). Since ties share a rank,
    percent_rank is a pure function of the (group, value) pair:
    ``cum_count_of_smaller_values / (n_group - 1)``. So the fact table
    reduces to a per-(group, value) count digest (map-side combined,
    bounded by distinct-value cardinality — the KS/Spearman
    contract: scores are rounded by construction), the cumulative
    count runs as a window over the DIGEST (per-group tasks of
    cardinality size, not group size), and the ranks join back on
    (group, value) — broadcast when the digest is small (AQE decides),
    never a full-fact single-task sort. Division is the same
    ``(rank - 1) / (n - 1)`` double expression Spark's percent_rank
    evaluates, so results are bit-identical (differential-tested).
    """
    from pyspark.sql.window import Window

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} collides with an input column")
    reserved = {"__v", "__c", "__n", "__cum"} | {f"__g{i}" for i in range(len(group_cols))}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input columns collide with reserved names: {sorted(clash)}")
    v = F.col(value_col)
    counts = (
        df.filter(v.isNotNull())
        .groupBy(
            *[F.col(g).alias(f"__g{i}") for i, g in enumerate(group_cols)],
            v.alias("__v"),
        )
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    gcols = [f"__g{i}" for i in range(len(group_cols))]
    w_before = (
        Window.partitionBy(*gcols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(*gcols)
    ranks = counts.select(
        *gcols,
        "__v",
        F.coalesce(F.sum("__c").over(w_before), F.lit(0)).alias("__cum"),
        F.sum("__c").over(w_all).alias("__n"),
    ).select(
        *gcols,
        "__v",
        F.round(
            F.when(F.col("__n") > 1,
                   F.col("__cum") / (F.col("__n") - 1))
            .otherwise(F.lit(0.0)),
            round_to,
        ).alias(out_col),
    )
    cond = v == F.col("__v")
    for i, g in enumerate(group_cols):
        cond = cond & F.col(g).eqNullSafe(F.col(f"__g{i}"))
    ranked = (
        df.filter(v.isNotNull())
        .join(ranks, cond)
        .drop("__v", *gcols)
    )
    skipped = df.filter(v.isNull()).withColumn(
        out_col, F.lit(None).cast("double")
    )
    return ranked.unionByName(skipped)


def drift_report(
    df_a: DataFrame,
    df_b: DataFrame,
    numeric_cols: list[str] | tuple[str, ...] = (),
    categorical_cols: list[str] | tuple[str, ...] = (),
    num_bins: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """Population Stability Index drift report between two snapshots.

    The data-quality monitor that catches a silently shifted corpus
    before training does: per feature, compare snapshot A (reference —
    yesterday's crawl, the holdout mixture, last release) against
    snapshot B (candidate) and report
    ``(feature, bin_idx, category, lo_edge, n_a, n_b, p_a, p_b,
    contrib, psi)`` — one row per bin/category, with
    ``psi = sum((p_a - p_b) * ln(p_a / p_b))`` repeated per feature.
    Common reading: psi < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted.

    - Numeric features bin onto ``num_bins`` equal-width buckets whose
      bounds come from SNAPSHOT A only (the reference defines the
      domain; B values outside clamp into the edge bins, so new-range
      mass shows up as edge-bin drift instead of vanishing). Every bin
      is emitted, including empty ones — with Laplace ``smoothing``
      an empty-both bin still contributes when |A| != |B|, and
      emitting the full grid keeps ``psi ==`` the exact sum of the
      emitted ``contrib`` column.
    - Categorical features take the UNION of categories observed in
      either snapshot (full outer join of two grouped counts).
    - Proportions are smoothed: ``p = (n + s) / (N + s*K)`` with K the
      feature's emitted bin count, so ``ln`` never sees zero.

    Scale design: per feature, the corpus-sized work is one map-side-
    combined groupBy per snapshot (plus A's one-row min/max aggregate,
    broadcast into the binning pass); everything after lives on
    K-row-per-feature frames, and the per-feature windows partition by
    feature. NULL values are excluded from binning (profile_table
    already reports null rates; a NULL-rate shift shows up there).
    Numeric features require at least one non-NULL A row to define
    bounds. Floats: p/contrib/psi round to 6dp on top of exact-input
    arithmetic, so the report is oracle-checkable cross-engine.
    """
    from pyspark.sql.window import Window

    if num_bins < 1:
        raise ValueError("num_bins must be >= 1")
    if smoothing <= 0:
        raise ValueError("smoothing must be > 0 (log of zero otherwise)")
    if not numeric_cols and not categorical_cols:
        raise ValueError("no feature columns given")

    pieces: list[DataFrame] = []
    for c in numeric_cols:
        v = F.col(c).cast("double")
        # Enforce the documented precondition lazily but LOUDLY: with an
        # empty/all-NULL snapshot A the min/max bounds are NULL, every
        # candidate value would fall into bin 0 with NULL edges, and the
        # report would be silently meaningless. raise_error keeps this a
        # zero-extra-job check that fires when the plan executes.
        bounds = df_a.agg(
            F.min(v).cast("double").alias("__lo"),
            F.max(v).cast("double").alias("__hi"),
        ).select(
            F.when(
                F.col("__lo").isNull(),
                F.raise_error(
                    F.lit(
                        f"drift_report: numeric feature {c!r} has no "
                        "non-NULL rows in reference snapshot A — bounds "
                        "undefined"
                    )
                ).cast("double"),
            )
            .otherwise(F.col("__lo"))
            .alias("__lo"),
            "__hi",
        )
        width = (F.col("__hi") - F.col("__lo")) / F.lit(float(num_bins))
        raw = F.when(width > 0, F.floor((v - F.col("__lo")) / width)).otherwise(
            F.lit(0)
        )
        bin_of = F.least(
            F.lit(num_bins - 1), F.greatest(F.lit(0), raw)
        ).cast("int")

        def _counts(df: DataFrame) -> DataFrame:
            return (
                df.filter(v.isNotNull())
                .crossJoin(F.broadcast(bounds))
                .groupBy(bin_of.alias("bin_idx"))
                .agg(F.count(F.lit(1)).alias("__n"))
            )

        grid = bounds.select(
            F.explode(F.sequence(F.lit(0), F.lit(num_bins - 1))).alias(
                "bin_idx"
            ),
            "__lo",
            "__hi",
        )
        piece = (
            grid.join(
                _counts(df_a).withColumnRenamed("__n", "__na"),
                "bin_idx",
                "left",
            )
            .join(
                _counts(df_b).withColumnRenamed("__n", "__nb"),
                "bin_idx",
                "left",
            )
            .select(
                F.lit(c).alias("feature"),
                "bin_idx",
                F.lit(None).cast("string").alias("category"),
                F.round(
                    F.when(
                        F.col("__hi") > F.col("__lo"),
                        F.col("__lo") + F.col("bin_idx") * width,
                    ).otherwise(F.col("__lo")),
                    6,
                ).alias("lo_edge"),
                F.coalesce(F.col("__na"), F.lit(0)).alias("n_a"),
                F.coalesce(F.col("__nb"), F.lit(0)).alias("n_b"),
            )
        )
        pieces.append(piece)

    for c in categorical_cols:
        ga = (
            df_a.filter(F.col(c).isNotNull())
            .groupBy(F.col(c).cast("string").alias("__v"))
            .agg(F.count(F.lit(1)).alias("__na"))
        )
        gb = (
            df_b.filter(F.col(c).isNotNull())
            .groupBy(F.col(c).cast("string").alias("__v"))
            .agg(F.count(F.lit(1)).alias("__nb"))
        )
        piece = ga.join(gb, "__v", "full_outer").select(
            F.lit(c).alias("feature"),
            F.lit(None).cast("int").alias("bin_idx"),
            F.col("__v").alias("category"),
            F.lit(None).cast("double").alias("lo_edge"),
            F.coalesce(F.col("__na"), F.lit(0)).alias("n_a"),
            F.coalesce(F.col("__nb"), F.lit(0)).alias("n_b"),
        )
        pieces.append(piece)

    uni = pieces[0]
    for p in pieces[1:]:
        uni = uni.unionByName(p)

    w_f = Window.partitionBy("feature")
    s = F.lit(float(smoothing))
    k = F.count(F.lit(1)).over(w_f)
    na = F.sum("n_a").over(w_f)
    nb = F.sum("n_b").over(w_f)
    p_a = (F.col("n_a") + s) / (na + s * k)
    p_b = (F.col("n_b") + s) / (nb + s * k)
    contrib = (p_a - p_b) * F.log(p_a / p_b)
    staged = uni.select(
        "feature",
        "bin_idx",
        "category",
        "lo_edge",
        "n_a",
        "n_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(contrib, 6).alias("contrib"),
        contrib.alias("__contrib_raw"),
    )
    return staged.select(
        "feature",
        "bin_idx",
        "category",
        "lo_edge",
        "n_a",
        "n_b",
        "p_a",
        "p_b",
        "contrib",
        F.round(F.sum("__contrib_raw").over(w_f), 6).alias("psi"),
    )


def dataset_card(
    df: DataFrame,
    group_col: str,
    text_col: str,
    id_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group corpus summary — the "dataset card" table a release
    ships with (one row per language/source/split): (group, n_docs,
    doc_share, total_chars, mean_chars, p50_chars, p95_chars,
    mean_words, n_exact_dup_docs, dup_share).

    A doc is an exact duplicate when its md5(text) occurs more than
    once CORPUS-WIDE (duplicates crossing groups count in every group
    they appear in — the number tells you what exact_dedup would
    remove from that group's slice). Percentiles are exact interpolated
    (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, the q78
    contract).

    One plan: a 16-byte digest groupBy for corpus dup counts joined
    back (never raw text), one map-side-combined groupBy(group) for
    everything else, totals as a broadcast one-row frame. At 100 TB the
    only wide exchange is the digest count — the exact_dedup shape.
    """
    text = F.col(text_col)
    base = df.select(
        F.col(id_col),
        F.col(group_col).alias("grp"),
        F.length(text).cast("long").alias("__chars"),
        F.size(
            F.filter(F.split(text, r"\s+"), lambda t: t != "")
        ).cast("long").alias("__words"),
        F.md5(text.cast("binary")).alias("__h"),
    )
    freq = base.groupBy("__h").agg(F.count(F.lit(1)).alias("__n"))
    flagged = base.join(freq, "__h").withColumn(
        "__dup", (F.col("__n") > 1).cast("int")
    )
    per_group = flagged.groupBy(F.col("grp").alias(group_col)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__chars").alias("total_chars"),
        F.round(F.avg("__chars"), round_to).alias("mean_chars"),
        F.expr("percentile(__chars, 0.5)").alias("p50_chars"),
        F.expr("percentile(__chars, 0.95)").alias("p95_chars"),
        F.round(F.avg("__words"), round_to).alias("mean_words"),
        F.sum("__dup").cast("long").alias("n_exact_dup_docs"),
        F.round(F.avg("__dup"), round_to).alias("dup_share"),
    )
    total = flagged.agg(F.count(F.lit(1)).alias("__t"))
    return per_group.crossJoin(F.broadcast(total)).select(
        group_col,
        "n_docs",
        F.round(F.col("n_docs") / F.col("__t"), round_to).alias("doc_share"),
        "total_chars",
        "mean_chars",
        F.round("p50_chars", round_to).alias("p50_chars"),
        F.round("p95_chars", round_to).alias("p95_chars"),
        "mean_words",
        "n_exact_dup_docs",
        "dup_share",
    )


def source_scorecard(
    docs: DataFrame,
    source_col: str,
    id_col: str,
    text_col: str,
    lang_col: str,
    lm_scores: DataFrame | None = None,
    target_lang: str = "en",
) -> DataFrame:
    """Per-source quality scorecard: the keep/trim/drop table for
    crawl-source triage — one row per source with the signals every
    web-scale curation run ranks its inputs by:

    - ``n_docs``, ``total_chars``
    - ``mean_chars`` (4dp)
    - ``pct_target_lang`` — share of docs in the target language
    - ``dup_rate`` — share of docs whose exact text (md5) appears
      more than once WITHIN the source (internal boilerplate rate;
      cross-source dup belongs to the dedup family)
    - ``n_scored`` / ``sum_bits_per_char`` — count and SUM of LM
      scores if an ``lm_scores`` frame (ngram_lm_scores output) is
      supplied. Sum, deliberately not mean: the per-doc scores are
      4dp-rounded, so their sum is an exact multiple of 0.0001 that
      re-rounds safely, while their MEAN can land exactly on a
      .00005 boundary where engines round apart (measured: a first
      version reported the mean and one source hit 1.13935 dead on)

    Engine shape: one md5 window for within-source dup marking + one
    groupBy(source); the optional LM join is by id before the
    aggregate. Report rows = number of sources.
    """
    from pyspark.sql.window import Window

    base = docs.select(
        F.col(source_col).alias("__src"),
        F.col(id_col),
        F.col(text_col).alias("__text"),
        (F.col(lang_col) == target_lang).cast("int").alias("__tgt"),
    )
    dup = F.count(F.lit(1)).over(
        Window.partitionBy("__src", F.md5(F.col("__text").cast("binary")))
    )
    marked = base.withColumn("__dup", (dup > 1).cast("int"))
    if lm_scores is not None:
        marked = marked.join(
            lm_scores.select(F.col(id_col), F.col("bits_per_char")),
            id_col,
            "left",
        )
    else:
        marked = marked.withColumn("bits_per_char", F.lit(None).cast("double"))
    return marked.groupBy(F.col("__src").alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("__text")).cast("long").alias("total_chars"),
        F.round(F.avg(F.length("__text")), 4).alias("mean_chars"),
        F.round(F.avg("__tgt"), 4).alias("pct_target_lang"),
        F.round(F.avg("__dup"), 4).alias("dup_rate"),
        F.count("bits_per_char").alias("n_scored"),
        F.round(F.sum("bits_per_char"), 4).alias("sum_bits_per_char"),
    )


def ks_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic: ONE row
    (n_a, n_b, ks_d) with ``ks_d = sup_x |F_a(x) - F_b(x)|`` computed
    over the exact empirical CDFs — the binning-free companion to the
    PSI drift report (``drift_report``): PSI answers "how much drift
    per feature bucket", KS answers "did the distribution change AT
    ALL" with a statistic whose null distribution is known, and no
    bin-edge choices to argue about.

    Exact, not approximated: both samples reduce to per-distinct-value
    counts (map-side combined), the counts merge on the value axis,
    and one cumulative window computes both CDFs in a single pass —
    the sup is over distinct observed values, which is exactly where
    the empirical CDF steps. Engine shape: two count aggregates + one
    full-outer merge + ONE unpartitioned cumulative window over the
    DISTINCT-value frame (bounded by cardinality, not row count —
    the threshold_sweep discipline). NULLs are excluded (no value, no
    position in a CDF); either sample empty raises.
    """
    a = (
        df_a.select(F.col(value_col).cast("double").alias("__v"))
        .filter(F.col("__v").isNotNull())
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__ca"))
    )
    b = (
        df_b.select(F.col(value_col).cast("double").alias("__v"))
        .filter(F.col("__v").isNotNull())
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__cb"))
    )
    merged = a.join(b, "__v", "full_outer").select(
        "__v",
        F.coalesce("__ca", F.lit(0)).alias("__ca"),
        F.coalesce("__cb", F.lit(0)).alias("__cb"),
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    # guard BEFORE the dividing aggregate: an empty side would hit
    # ANSI divide-by-zero inside the plan, not a clean error
    totals = merged.agg(
        F.sum("__ca").alias("__na"), F.sum("__cb").alias("__nb")
    ).collect()[0]
    if not totals["__na"] or not totals["__nb"]:
        raise ValueError("both samples need at least one non-NULL value")
    stepped = merged.select(
        F.sum("__ca").over(w).alias("__cum_a"),
        F.sum("__cb").over(w).alias("__cum_b"),
        F.sum("__ca").over(wall).alias("__na"),
        F.sum("__cb").over(wall).alias("__nb"),
    )
    out = stepped.agg(
        F.max("__na").alias("n_a"),
        F.max("__nb").alias("n_b"),
        F.round(
            F.max(
                F.abs(
                    F.col("__cum_a") / F.col("__na")
                    - F.col("__cum_b") / F.col("__nb")
                )
            ),
            4,
        ).alias("ks_d"),
    ).collect()[0]
    spark = df_a.sparkSession
    return spark.createDataFrame(
        [(int(out["n_a"]), int(out["n_b"]), float(out["ks_d"]))],
        "n_a long, n_b long, ks_d double",
    )


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pearson chi-squared test of independence between two
    categorical columns: ONE row (n, rows_a, cols_b, dof, chi2,
    cramers_v) — the categorical companion to ``ks_statistic``
    (numeric) and ``drift_report`` (per-bucket PSI). The question it
    answers for a corpus: is language independent of source, label
    independent of annotator, verdict independent of shard — or is
    the pipeline quietly confounded?

    ``chi2 = sum (obs - exp)^2 / exp`` over the contingency cells with
    ``exp = row_total * col_total / n``; ``cramers_v`` =
    sqrt(chi2 / (n * (min(a,b) - 1))) normalizes to [0, 1] for
    effect-size reading (NULL when either margin has one category —
    dof 0, independence vacuous). NULL category values are excluded.
    Engine shape: one (a, b) cell count (map-side combined), margins
    derived from the CELL frame (never a second corpus scan), one
    scalar aggregate over cells — work bounded by distinct-category
    product, not rows.
    """
    base = df.select(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).filter(F.col("__a").isNotNull() & F.col("__b").isNotNull())
    cells = base.groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("__o"))
    from pyspark.sql.window import Window

    wa = Window.partitionBy("__a")
    wb = Window.partitionBy("__b")
    wall = Window.partitionBy()
    with_m = cells.select(
        "__o",
        F.sum("__o").over(wa).alias("__ra"),
        F.sum("__o").over(wb).alias("__cb"),
        F.sum("__o").over(wall).alias("__n"),
        F.size(F.collect_set("__a").over(wall)).alias("__ka"),
        F.size(F.collect_set("__b").over(wall)).alias("__kb"),
    )
    exp = F.col("__ra") * F.col("__cb") / F.col("__n")
    # identity chi2 = sum(o^2/e) - n: zero-observed cells contribute
    # (0-e)^2/e = e to the textbook sum, and the e's of ALL cells sum
    # to n — so summing o^2/e over only the OBSERVED cells and
    # subtracting n is exact without materializing empty cells
    out = with_m.agg(
        F.max("__n").alias("n"),
        F.max("__ka").alias("rows_a"),
        F.max("__kb").alias("cols_b"),
        (
            F.sum(F.col("__o") * F.col("__o") / exp) - F.max("__n")
        ).alias("__chi2"),
    ).collect()
    if not out or out[0]["n"] is None:
        raise ValueError("no rows with both categories present")
    r = out[0]
    ka, kb, n = int(r["rows_a"]), int(r["cols_b"]), int(r["n"])
    dof = (ka - 1) * (kb - 1)
    chi2 = float(r["__chi2"])
    import math

    v = (
        round(math.sqrt(chi2 / (n * (min(ka, kb) - 1))), 4)
        if dof > 0
        else None
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        [(n, ka, kb, dof, round(chi2, 4), v)],
        "n long, rows_a long, cols_b long, dof long, chi2 double, "
        "cramers_v double",
    )


def spearman_corr(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """Spearman rank correlation between two numeric columns: ONE row
    (n, rho). The metric-redundancy question for a quality pipeline —
    if the LM score and a trained gate rank documents the same way
    (rho -> 1), one of them is not earning its compute; if a new
    signal is rank-orthogonal (rho -> 0), it adds information.
    Spearman (not Pearson on raw values) because curation decisions
    are RANK decisions — thresholds, ntiles, top-k — and rank
    correlation is invariant to any monotone rescaling of either
    score.

    Exact treatment of ties: average (fractional) ranks via the
    standard cumulative construction — for a tie group of size ``g``
    preceded by ``c`` rows, every member ranks ``c + (g + 1) / 2`` —
    then rho is the Pearson correlation of the two rank columns
    (``F.corr``). All rank arithmetic is exact multiples of 0.5 far
    below 2^53, so ranks are engine-identical; the final correlation
    is one aggregate, rounded 4dp. Rows with a NULL on either side
    are excluded (no rank, no pair). Engine shape: two value-count
    windows (the threshold_sweep shape, bounded by distinct values)
    joined back by value + one correlation aggregate.
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(col_x).cast("double").alias("__x"),
        F.col(col_y).cast("double").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())

    def avg_ranks(col: str, out: str) -> DataFrame:
        g = base.groupBy(F.col(col)).agg(F.count(F.lit(1)).alias("__g"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return g.select(
            F.col(col),
            (
                F.coalesce(F.sum("__g").over(w), F.lit(0))
                + (F.col("__g") + 1) / 2.0
            ).alias(out),
        )
    rx = avg_ranks("__x", "__rx")
    ry = avg_ranks("__y", "__ry")
    ranked = base.join(rx, "__x").join(ry, "__y")
    out = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("__rx", "__ry"), 4).alias("rho"),
    ).collect()[0]
    if not out["n"]:
        raise ValueError("no rows with both values present")
    spark = df.sparkSession
    return spark.createDataFrame(
        [(int(out["n"]), out["rho"])], "n long, rho double"
    )


#: Cumulative Poisson(1) thresholds for hash-uniform -> weight lookup;
#: exact decimal literals so Spark and any SQL oracle parse the SAME
#: doubles (e^-1 * sum_{j<=k} 1/j! for k = 0..5; mass above c5 -> 6).
_POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
]


def bootstrap_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    replicas: int = 40,
    round_to: int = 4,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the corpus mean of an
    INTEGER metric column: one row (n, mean, ci_lo, ci_hi, replicas)
    with a nearest-rank 90% interval (5th/95th percentile of the
    replica means).

    The Poisson bootstrap (Chamandy et al. 2012, "Estimating
    uncertainty for massive data streams") replaces resampling-with-
    replacement — impossible in one distributed pass — with an
    independent Poisson(1) weight per (row, replica), drawn here from
    md5(id:replica) so every weight is a pure function of the data
    (the repo determinism contract, not RNG). Each replica's mean is
    a ratio of EXACT integer sums, so the whole interval is
    bit-reproducible on any engine or partitioning — no float
    summation order anywhere until the final rounding.

    Plan shape: ONE map-side-combined aggregate producing 2·replicas
    integer sums (plus n and the plain sum); the replica means sort
    as a constant-size in-plan array. Cost: ``replicas`` md5s per row
    inside codegen — linear, no shuffle beyond the single aggregate.
    """
    from atiesh_spark.functions.hashing import md5_long

    if replicas < 10:
        raise ValueError("replicas must be >= 10 for a usable interval")
    x = F.col(value_col).cast("long")

    def weight(b: int) -> Column:
        u = md5_long(
            F.concat(F.col(id_col).cast("string"), F.lit(f":{b}"))
        ) / F.lit(float(1 << 60))
        w = F.lit(6)
        for k in range(len(_POISSON1_CDF) - 1, -1, -1):
            w = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
        return w

    aggs = [
        F.count(F.lit(1)).alias("__n"),
        F.sum(x).alias("__sx"),
    ]
    for b in range(replicas):
        wb = weight(b)
        aggs.append(F.sum(wb * x).alias(f"__wx{b}"))
        aggs.append(F.sum(wb).alias(f"__w{b}"))
    agg = df.agg(*aggs)
    # a replica whose every Poisson weight drew 0 (likely only on
    # tiny inputs: P ~ replicas * 0.368^n) contributes the point
    # estimate instead of throwing ANSI DIVIDE_BY_ZERO
    means = F.array_sort(
        F.array(
            *[
                F.when(
                    F.col(f"__w{b}") > 0,
                    F.col(f"__wx{b}") / F.col(f"__w{b}"),
                ).otherwise(F.col("__sx") / F.col("__n"))
                for b in range(replicas)
            ]
        )
    )
    lo_rank = max(1, math.ceil(0.05 * replicas))
    hi_rank = math.ceil(0.95 * replicas)
    return agg.select(
        F.col("__n").cast("bigint").alias("n"),
        F.round(F.col("__sx") / F.col("__n"), round_to).alias("mean"),
        F.round(F.element_at(means, lo_rank), round_to).alias("ci_lo"),
        F.round(F.element_at(means, hi_rank), round_to).alias("ci_hi"),
        F.lit(replicas).cast("bigint").alias("replicas"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    round_to: int = 4,
) -> DataFrame:
    """Mann-Whitney U test (Mann & Whitney 1947) between ``group_a``
    and everything else: one row (n_a, n_b, u, z, p_value) — the
    nonparametric two-sample drift companion to the exact KS statistic
    (q191): does group A's metric distribution sit higher or lower
    than B's, with no normality assumption?

    Scale shape: U never ranks the corpus. From per-DISTINCT-VALUE
    counts (one map-side-combined groupBy),
    U_A = sum_v n_a(v) * (B_less(v) + n_b(v)/2) with B_less a running
    sum over the distinct-value frame — the only window sort is over
    distinct metric values, a histogram-sized relation, never the
    rows. Ties use the standard midrank convention and the
    tie-corrected normal approximation
    sigma^2 = n_a n_b / 12 * ((N + 1) - sum(t^3 - t) / (N (N - 1))).
    U is an exact multiple of 0.5 (integer arithmetic doubled), so
    everything up to the final z/p is engine-exact.
    """
    from pyspark.sql import Window

    counts = (
        df.select(
            F.col(value_col).alias("__v"),
            F.when(F.col(group_col) == group_a, F.lit(1))
            .otherwise(F.lit(0)).alias("__is_a"),
        )
        .groupBy("__v")
        .agg(
            F.sum("__is_a").alias("__na"),
            (F.count(F.lit(1)) - F.sum("__is_a")).alias("__nb"),
        )
    )
    w = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # 2U as an exact integer: 2 * sum n_a(v) * (B_less(v) + n_b(v)/2)
    #                       = sum n_a(v) * (2 B_less(v) + n_b(v))
    per_v = counts.select(
        "__na", "__nb",
        (F.col("__na")
         * (2 * F.coalesce(F.sum("__nb").over(w), F.lit(0))
            + F.col("__nb"))).alias("__u2"),
        # computed in DOUBLE: a tie group of ~2M rows cubes past the
        # long range; the term only feeds the variance, a double anyway
        ((F.col("__na") + F.col("__nb")).cast("double")
         * (F.col("__na") + F.col("__nb"))
         * (F.col("__na") + F.col("__nb"))
         - (F.col("__na") + F.col("__nb"))).alias("__t3t"),
    )
    agg = per_v.agg(
        F.sum("__na").alias("__NA"),
        F.sum("__nb").alias("__NB"),
        F.sum("__u2").alias("__U2"),
        F.sum("__t3t").alias("__T"),
    )
    na, nb = F.col("__NA"), F.col("__NB")
    n = na + nb
    u = F.col("__U2") / 2
    sigma2 = (
        na * nb / F.lit(12.0)
        * ((n + 1) - F.col("__T") / (n * (n - 1)))
    )
    # sigma2 = 0 (all values tied, or a group matched zero rows) has
    # no defined z; return z = 0 / p = 1 (no evidence of a shift)
    # instead of the ANSI DIVIDE_BY_ZERO the raw division throws
    z = F.when(
        sigma2 > 0, (u - na * nb / 2) / F.sqrt(sigma2)
    ).otherwise(F.lit(0.0))
    # Two-sided p = erfc(|z| / sqrt(2)). Neither Spark nor typical SQL
    # oracles ship erf, so both sides use the SAME closed form:
    # Abramowitz & Stegun 7.1.26 (|error| < 1.5e-7, far inside the 4dp
    # rounding) — pure +,*,exp arithmetic, mirrored verbatim in the
    # oracle so the doubles agree to the ulp.
    base = agg.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        u.alias("u"),
        F.round(z, round_to).alias("z"),
        (F.abs(z) / F.sqrt(F.lit(2.0))).alias("__x"),
    )
    t = 1 / (1 + 0.3275911 * F.col("__x"))
    erf_x = 1 - (
        0.254829592 * t
        - 0.284496736 * t * t
        + 1.421413741 * t * t * t
        - 1.453152027 * t * t * t * t
        + 1.061405429 * t * t * t * t * t
    ) * F.exp(-F.col("__x") * F.col("__x"))
    return base.select(
        "n_a", "n_b", "u", "z",
        F.round(1 - erf_x, round_to).alias("p_value"),
    )
