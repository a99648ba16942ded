"""Hypertable-style cascade rollups: multi-resolution time aggregates.

The continuous-aggregate pattern of time-series stores: raw events roll
up to the finest bucket once, and every coarser resolution re-aggregates
the NEXT-FINER level, never the raw data — at 100 TB the hourly rollup
reads the (tiny) 10-minute frame instead of re-scanning the raw table,
and the same cascade maintains materialized rollups incrementally.

Only cascade-safe aggregates are offered (count and sum re-aggregate as
sum; min/max as themselves). Averages are derived downstream as
sum/count; quantiles are NOT cascade-safe (store sketches instead —
see q45 for the sketch path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_REAGG = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def cascade_rollup(
    df: DataFrame,
    ts_col: str,
    levels: list[str],
    aggs: dict[str, tuple[str, str]],
    group_cols: list[str] | None = None,
    bucket_col: str = "bucket",
    level_col: str = "level",
) -> DataFrame:
    """Roll ``df`` up through ``levels`` (finest first, e.g. ["10
    minutes", "1 hour"]); each level after the first re-aggregates the
    previous level's frame. ``aggs``: output name -> (source column,
    'count'|'sum'|'min'|'max'); count follows SQL count(col) semantics
    (NULLs skipped) — pass ``None`` as the column for count(*). Returns
    the UNION of all levels:
    (level, bucket, *group_cols, *agg names) — ``bucket`` is the
    window start. Levels must nest (each duration a multiple of the
    previous) for the cascade to be exact; bucket alignment is Spark's
    epoch-aligned tumbling window, identical for any session timezone
    on TIMESTAMP_NTZ inputs.
    """
    if not levels:
        raise ValueError("need at least one level")
    for name, (_, kind) in aggs.items():
        if kind not in _REAGG:
            raise ValueError(
                f"agg {name!r}: {kind!r} is not cascade-safe "
                f"(supported: {sorted(_REAGG)})"
            )
    gcols = group_cols or []

    names = list(aggs)

    first = [
        (
            F.count(F.lit(1) if col is None else F.col(col))
            if kind == "count"
            else getattr(F, kind)(col)
        ).alias(name)
        for name, (col, kind) in aggs.items()
    ]
    cur = (
        df.groupBy(F.window(ts_col, levels[0]).alias("__w"), *gcols)
        .agg(*first)
        .select(F.col("__w.start").alias(bucket_col), *gcols, *names)
    )
    out = cur.select(F.lit(levels[0]).alias(level_col), "*")
    for lvl in levels[1:]:
        reagg = [
            getattr(F, _REAGG[kind])(name).alias(name)
            for name, (_, kind) in aggs.items()
        ]
        cur = (
            cur.groupBy(F.window(bucket_col, lvl).alias("__w"), *gcols)
            .agg(*reagg)
            .select(F.col("__w.start").alias(bucket_col), *gcols, *names)
        )
        out = out.unionByName(cur.select(F.lit(lvl).alias(level_col), "*"))
    return out
