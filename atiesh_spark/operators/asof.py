"""As-of (point-in-time) join — the temporal join Spark lacks natively.

Joins each left row to the nearest right row at-or-before (backward) or
at-or-after (forward) it on an ordering column, within a key. The
classic uses: attach the latest dimension version to an event, the last
sensor reading to a trade, the active config to a log line.

Spark-first physical strategy (no pandas, no range explosion): tag and
UNION both sides, then one window per key ordered by (on, side) fills
each left row with the last non-null packed right row. One shuffle on
the key; whole-stage codegen throughout; at equal timestamps the right
row sorts first, so the match is inclusive (l.on >= r.on), matching
DuckDB/pandas ASOF semantics. Both sides are packed into structs so a
matched right row is atomic (no per-column fill mixing two right rows).

Right rows with duplicate (key, on) values are ambiguous — which one
wins depends on partition layout; dedup the right side first (the
operator raises nothing but the contract is stated here and tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    rvals = [c for c in right.columns if c != on and c not in by]
    if not rvals:
        raise ValueError("right side has no value columns beyond key/on")

    lrow_t = left.select(F.struct(*left.columns).alias("s")).schema[0].dataType
    rrow_t = right.select(F.struct(*rvals).alias("s")).schema[0].dataType

    l = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__on"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__lrow"),
        F.lit(None).cast(rrow_t).alias("__rrow"),
    )
    r = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__on"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lrow_t).alias("__lrow"),
        F.struct(*rvals).alias("__rrow"),
    )
    order = (
        [F.col("__on").asc(), F.col("__side").asc()]
        if direction == "backward"
        else [F.col("__on").desc(), F.col("__side").asc()]
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l.unionByName(r)
        .withColumn("__match", F.last("__rrow", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    taken = set(left.columns)
    for c in rvals:
        name = c if c not in taken else f"{c}{suffix}"
        out_cols.append(F.col(f"__match.{c}").alias(name))
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
    bin — cap interval lengths upstream.

    Output: all left columns + all right columns (right's key columns
    dropped; collisions get a ``_r`` suffix).
    """
    if bin_size <= 0:
        raise ValueError("bin_size must be > 0")
    by = [by] if isinstance(by, str) else list(by)
    lp = left.withColumn("__bin", F.floor(F.col(on) / bin_size))
    rvals = [c for c in right.columns if c not in by]
    ri = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bin_size),
                F.floor(F.col(end_col) / bin_size),
            )
        ),
    )
    taken = set(left.columns)
    r_sel = [F.col(c) for c in by] + [F.col("__bin")] + [
        F.col(c).alias(c if c not in taken else f"{c}_r") for c in rvals
    ]
    start_out = start_col if start_col not in taken else f"{start_col}_r"
    end_out = end_col if end_col not in taken else f"{end_col}_r"
    return (
        lp.join(ri.select(*r_sel), [*by, "__bin"])
        .filter(
            (F.col(start_out) <= F.col(on)) & (F.col(on) <= F.col(end_out))
        )
        .drop("__bin")
    )
