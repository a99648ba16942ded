"""As-of (point-in-time) and range (interval) joins — the temporal joins
Spark lacks natively.

as-of: each left row matched to the nearest right row at-or-before
(backward) or at-or-after (forward) it on an ordering column, within a
key. The classic uses: attach the latest dimension version to an event,
the last sensor reading to a trade, the active config to a log line.

Spark-first physical strategy (no pandas, no range explosion): tag and
UNION both sides, then one window per key ordered by (on, side) fills
each left row with the last non-null packed right row. One shuffle on
the key; whole-stage codegen throughout; at equal timestamps the right
row sorts first, so the match is inclusive (l.on >= r.on), matching
DuckDB/pandas ASOF semantics. Right value columns are packed into ONE
struct so a matched right row is atomic (no per-column fill mixing two
right rows); left key/on columns ride the union top-level only (packing
them again would double the shuffled bytes for narrow tables).

NULL semantics follow SQL: right rows with a NULL key or NULL ``on``
can never match (filtered up front), and a left row with NULL ``on``
matches nothing. Right rows with duplicate (key, on) values are
ambiguous — which one wins depends on partition layout; dedup the right
side first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


_ASOF_INTERNAL = ("__on", "__side", "__rrow", "__lrow", "__match")
_RANGE_INTERNAL = ("__bin",)


def _check_reserved(cols: list[str], reserved: tuple[str, ...], side: str) -> None:
    clash = sorted(set(cols) & set(reserved))
    if clash:
        raise ValueError(
            f"{side} columns {clash} collide with this join's internal "
            f"column names {list(reserved)}; rename them before joining"
        )


def _suffixed(name: str, taken: set[str], suffix: str) -> str:
    if name not in taken:
        return name
    cand = f"{name}{suffix}"
    if cand in taken:
        raise ValueError(
            f"cannot suffix column {name!r}: {cand!r} also exists; "
            "rename columns before joining"
        )
    return cand


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right row's
    value columns (NULL where no right row qualifies).

    ``on``: ordering column present in both sides (timestamp or
    numeric). ``by``: equality key(s). ``direction``: 'backward' (right
    row at-or-before the left row — the default everywhere) or
    'forward' (at-or-after). Right value columns colliding with left
    column names get ``suffix``.

    Scale note — key-cardinality skew: the physical plan is ONE window
    per ``by`` key, so parallelism equals the number of distinct keys.
    A low-cardinality key set (worst case: one global key) serializes
    the whole sort onto a handful of tasks regardless of cluster size.
    Correctness is unaffected (see the single-key test), but at scale
    prefer a higher-granularity key, or pre-bucket time into coarse
    ranges and as-of join within (bucket, key) with a boundary-carry
    pass — the standard range-bucketed fallback.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    _check_reserved(left.columns, _ASOF_INTERNAL, "left")
    _check_reserved(right.columns, _ASOF_INTERNAL, "right")
    by = [by] if isinstance(by, str) else list(by)
    rvals = [c for c in right.columns if c != on and c not in by]
    if not rvals:
        raise ValueError("right side has no value columns beyond key/on")
    # SQL join semantics: NULL keys / NULL on never match anything
    right = right.filter(F.col(on).isNotNull())
    for c in by:
        right = right.filter(F.col(c).isNotNull())

    lrest = [c for c in left.columns if c != on and c not in by]
    rrow_t = right.select(F.struct(*rvals).alias("s")).schema[0].dataType

    l_cols = [F.col(c) for c in by] + [
        F.col(on).alias("__on"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rrow_t).alias("__rrow"),
    ]
    r_cols = [F.col(c) for c in by] + [
        F.col(on).alias("__on"),
        F.lit(0).alias("__side"),
        F.struct(*rvals).alias("__rrow"),
    ]
    if lrest:
        lrow_t = left.select(F.struct(*lrest).alias("s")).schema[0].dataType
        l_cols.append(F.struct(*lrest).alias("__lrow"))
        r_cols.append(F.lit(None).cast(lrow_t).alias("__lrow"))
    l = left.select(*l_cols)
    r = right.select(*r_cols)

    order = (
        [F.col("__on").asc_nulls_first(), F.col("__side").asc()]
        if direction == "backward"
        else [F.col("__on").desc_nulls_first(), F.col("__side").asc()]
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l.unionByName(r)
        .withColumn(
            "__match",
            # a left row with NULL on matches nothing (SQL comparison
            # semantics); nulls_first ordering alone would leak matches
            # in one of the two directions
            F.when(
                F.col("__on").isNotNull(),
                F.last("__rrow", ignorenulls=True).over(w),
            ),
        )
        .filter(F.col("__side") == 1)
    )
    out_cols = []
    for c in left.columns:
        if c == on:
            out_cols.append(F.col("__on").alias(c))
        elif c in by:
            out_cols.append(F.col(c))
        else:
            out_cols.append(F.col(f"__lrow.{c}").alias(c))
    taken = set(left.columns)
    for c in rvals:
        out_cols.append(F.col(f"__match.{c}").alias(_suffixed(c, taken, suffix)))
    return filled.select(*out_cols)


_ASOF_BUCKETED_INTERNAL = (
    "__o", "__bin", "__side", "__rrow", "__lrow", "__match", "__best", "__carry",
)

_NUMERIC_PREFIXES = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    bucket_size: int,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """``asof_join`` semantics with time-bucketed parallelism — the scale
    remedy for low-cardinality ``by`` keys (see asof_join's scale note).

    Both sides are cut into fixed ``bucket_size`` bins of the (numeric)
    ``on`` column and the as-of window runs per (key, bin), so
    parallelism is #keys x #bins instead of #keys — a single global key
    no longer serializes onto one task. Correctness is restored by a
    BOUNDARY CARRY: for every (key, bin) the latest right row from any
    earlier bin rides along as one extra candidate (for a left row, the
    match is either in its own bin or is exactly that carry row). The
    carry is computed on the per-(key, bin) summary frame — #keys x
    #bins rows, never the data — so the only data-sized shuffles are
    the two (key, bin) hash partitionings.

    ``on`` must be numeric (convert timestamps to epoch units first,
    timezone-independently — same contract as ``range_join``). Output
    and NULL/tie semantics are identical to ``asof_join``; a property
    test asserts frame equality between the two.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if bucket_size <= 0:
        raise ValueError("bucket_size must be > 0")
    _check_reserved(left.columns, _ASOF_BUCKETED_INTERNAL, "left")
    _check_reserved(right.columns, _ASOF_BUCKETED_INTERNAL, "right")
    for side_name, df in (("left", left), ("right", right)):
        dt = dict(df.dtypes)[on]
        if not dt.startswith(_NUMERIC_PREFIXES):
            raise ValueError(
                f"{side_name}.{on} must be numeric for bucketing (got {dt}); "
                "convert timestamps to epoch units first"
            )
    by = [by] if isinstance(by, str) else list(by)
    rvals = [c for c in right.columns if c != on and c not in by]
    if not rvals:
        raise ValueError("right side has no value columns beyond key/on")
    right = right.filter(F.col(on).isNotNull())
    for c in by:
        right = right.filter(F.col(c).isNotNull())

    # direction folds into a sign: forward asof on t == backward on -t
    # (native numeric type preserved — no double cast that would lose
    # precision on large epoch longs)
    sgn = 1 if direction == "backward" else -1
    o = F.col(on) * F.lit(sgn)
    lrest = [c for c in left.columns if c not in by]  # incl. on (restored from __lrow)
    lf = left.select(
        *by,
        o.alias("__o"),
        F.floor(o / bucket_size).alias("__bin"),
        F.struct(*lrest).alias("__lrow"),
    )
    rf = right.select(
        *by,
        o.alias("__o"),
        F.floor(o / bucket_size).alias("__bin"),
        F.struct(*rvals).alias("__rrow"),
    )

    # per-(key, bin) latest right row — the summary frame the carry runs on
    rb = rf.groupBy(*by, "__bin").agg(
        F.max_by(F.struct(F.col("__o").alias("o"), F.col("__rrow").alias("r")), F.col("__o")).alias("__best")
    )
    best_t = rb.schema["__best"].dataType
    # carry per left bin: last __best from a STRICTLY earlier bin (markers
    # sort before same-bin right summaries, so own-bin rows are excluded —
    # they are already in-bin candidates)
    markers = lf.select(*by, "__bin").distinct()
    mb = markers.select(
        *by, "__bin", F.lit(0).alias("__side"), F.lit(None).cast(best_t).alias("__best")
    )
    rbb = rb.select(*by, "__bin", F.lit(1).alias("__side"), "__best")
    wc = (
        Window.partitionBy(*by)
        .orderBy(F.col("__bin").asc_nulls_first(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        mb.unionByName(rbb)
        .withColumn("__carry", F.last("__best", ignorenulls=True).over(wc))
        .filter(F.col("__side") == 0)
        .filter(F.col("__carry").isNotNull())
        .select(*by, "__bin", "__carry")
    )
    carried = carry.select(
        *by, "__bin",
        F.col("__carry.o").alias("__o"),
        F.col("__carry.r").alias("__rrow"),
    )

    lrow_t = lf.schema["__lrow"].dataType
    rrow_t = rf.schema["__rrow"].dataType
    l_u = lf.select(
        *by, "__bin", "__o", F.lit(1).alias("__side"),
        F.lit(None).cast(rrow_t).alias("__rrow"), "__lrow",
    )
    r_u = rf.select(*by, "__bin", "__o", F.lit(0).alias("__side"), "__rrow").unionByName(
        carried.select(*by, "__bin", "__o", F.lit(0).alias("__side"), "__rrow")
    ).withColumn("__lrow", F.lit(None).cast(lrow_t))
    w = (
        Window.partitionBy(*by, "__bin")
        .orderBy(F.col("__o").asc_nulls_first(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l_u.unionByName(r_u)
        .withColumn(
            "__match",
            F.when(F.col("__o").isNotNull(), F.last("__rrow", ignorenulls=True).over(w)),
        )
        .filter(F.col("__side") == 1)
    )
    out_cols = []
    for c in left.columns:
        if c in by:
            out_cols.append(F.col(c))
        else:
            out_cols.append(F.col(f"__lrow.{c}").alias(c))
    taken = set(left.columns)
    for c in rvals:
        out_cols.append(F.col(f"__match.{c}").alias(_suffixed(c, taken, suffix)))
    return filled.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    start_col: str,
    end_col: str,
    bin_size: int,
) -> DataFrame:
    """Interval join: left POINTS matched to right INTERVALS containing
    them (``start <= on <= end``, closed) within a key — the other
    temporal join Spark mishandles (a naive non-equi join degrades to a
    nested-loop cross product).

    Scale-safe strategy: time is cut into fixed ``bin_size`` bins; each
    interval EXPLODES to the bins it overlaps, each point lands in
    exactly one bin, and the join runs on (key, bin) equality with the
    range predicate as a post-filter. A qualifying pair meets in exactly
    the point's bin, so no dedup pass is needed. ``on``/``start_col``/
    ``end_col`` must be numeric (convert timestamps to epoch units
    first, timezone-independently). Pick ``bin_size`` near the typical
    interval length: the explode factor is ~len/bin_size + 1, and a
    pathological interval spanning the whole timeline fans out to every
    bin — cap interval lengths upstream. Inverted intervals
    (start > end) match nothing and are dropped BEFORE the explode
    (Spark's sequence() would otherwise fan them out descending).

    Output: all left columns + all right columns (right's key columns
    dropped; collisions get a ``_r`` suffix).
    """
    if bin_size <= 0:
        raise ValueError("bin_size must be > 0")
    _check_reserved(left.columns, _RANGE_INTERNAL, "left")
    _check_reserved(right.columns, _RANGE_INTERNAL, "right")
    by = [by] if isinstance(by, str) else list(by)
    lp = left.withColumn("__bin", F.floor(F.col(on) / bin_size))
    rvals = [c for c in right.columns if c not in by]
    ri = right.filter(F.col(start_col) <= F.col(end_col)).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_size),
                F.floor(F.col(end_col) / bin_size),
            )
        ),
    )
    taken = set(left.columns)
    renames = {c: _suffixed(c, taken, "_r") for c in rvals}
    r_sel = [F.col(c) for c in by] + [F.col("__bin")] + [
        F.col(c).alias(renames[c]) for c in rvals
    ]
    return (
        lp.join(ri.select(*r_sel), [*by, "__bin"])
        .filter(
            (F.col(renames[start_col]) <= F.col(on))
            & (F.col(on) <= F.col(renames[end_col]))
        )
        .drop("__bin")
    )
