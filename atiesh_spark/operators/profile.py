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

