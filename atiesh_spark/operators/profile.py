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

from pyspark.sql import DataFrame
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

    Scale note: exact ranks genuinely need the per-group sort — this IS
    a window over the fact table, unlike the moments-broadcast
    operators. When an approximate CDF is acceptable at 100 TB, bin
    against broadcast quantile bounds instead (the ``winsorize`` /
    ``histogram`` pattern) and no full-data sort happens.
    """
    from pyspark.sql.window import Window

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if out_col in df.columns:
        raise ValueError(f"out_col {out_col!r} collides with an input column")
    v = F.col(value_col)
    w = Window.partitionBy(*group_cols).orderBy(v)
    ranked = df.filter(v.isNotNull()).withColumn(
        out_col, F.round(F.percent_rank().over(w), round_to)
    )
    skipped = df.filter(v.isNull()).withColumn(
        out_col, F.lit(None).cast("double")
    )
    return ranked.unionByName(skipped)
