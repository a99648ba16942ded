"""Hypertable-style cascade rollups: multi-resolution time aggregates.

The continuous-aggregate pattern of time-series stores: raw events roll
up to the finest bucket once, and every coarser resolution re-aggregates
the NEXT-FINER level, never the raw data — at 100 TB the hourly rollup
reads the (tiny) 10-minute frame instead of re-scanning the raw table,
and the same cascade maintains materialized rollups incrementally
(``StreamingCascadeRollup`` is that maintenance loop, run from
``foreachBatch``).

Only cascade-safe aggregates are offered (count and sum re-aggregate as
sum; min/max as themselves). Averages are derived downstream as
sum/count; quantiles are NOT cascade-safe (store sketches instead —
see q45 for the sketch path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
    # Enforce the docstring's nesting contract (previously prose-only):
    # with epoch-aligned tumbling windows, level i+1 is exactly a union
    # of level-i buckets iff its duration is an integer multiple of the
    # previous level's — otherwise coarse rows silently misattribute
    # mass across straddled fine buckets.
    from atiesh_spark.config import parse_duration_seconds

    secs = [parse_duration_seconds(lvl) for lvl in levels]
    for i in range(1, len(secs)):
        if secs[i] <= 0 or secs[i] % secs[i - 1] != 0:
            raise ValueError(
                f"levels do not nest: {levels[i]!r} is not an integer "
                f"multiple of {levels[i - 1]!r} — the cascade would "
                "re-aggregate straddled buckets"
            )
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


class StreamingCascadeRollup:
    """Maintain a multi-level cascade rollup incrementally from a stream:
    the continuous-aggregate loop the batch operator's docstring promises.

    Use as the ``foreachBatch`` function of any micro-batch stream of raw
    events. Each batch's delta is rolled up with ``cascade_rollup`` and
    MERGED into the persisted store per (level, bucket, group) — every
    offered aggregate is distributive over disjoint row subsets (counts
    and sums merge as sum, min/max as themselves), so after N batches
    the store exactly equals the batch cascade over the union of all
    batches. Late rows need no watermark: they merge into their original
    bucket whenever they arrive (the store IS the state, keyed by
    bucket).

    The state backend is ``sources/versioned.VersionedStore``: batch
    ``B`` reads the newest version with id < B, merges, and overwrites
    ``v{B}``, so failure replays converge (effectively-once on top of
    the checkpointed source); the scan cost per batch is the (small)
    rollup store, never the raw history.

    Read the current rollup with ``read()`` (or point any reader at the
    ``store.latest_path()`` directory).
    """

    def __init__(
        self,
        ts_col: str,
        levels: list[str],
        aggs: dict[str, tuple[str | None, str]],
        path: str,
        group_cols: list[str] | None = None,
        bucket_col: str = "bucket",
        level_col: str = "level",
        keep_versions: int = 2,
    ) -> None:
        from atiesh_spark.sources.versioned import VersionedStore

        self.ts_col, self.levels, self.aggs = ts_col, levels, aggs
        self.group_cols = group_cols or []
        self.bucket_col, self.level_col = bucket_col, level_col
        self.store = VersionedStore(path, keep_versions=keep_versions)

    def latest_path(self, spark: SparkSession, before: int | None = None) -> str | None:
        return self.store.latest_path(spark, before=before)

    def read(self, spark: SparkSession) -> DataFrame:
        return self.store.read(spark)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = cascade_rollup(
            batch_df, self.ts_col, self.levels, self.aggs,
            group_cols=self.group_cols, bucket_col=self.bucket_col,
            level_col=self.level_col,
        )
        prev = self.store.read_before(spark, batch_id)
        if prev is not None:
            delta = prev.unionByName(delta)
        merge = [
            getattr(F, _REAGG[kind])(name).alias(name)
            for name, (_, kind) in self.aggs.items()
        ]
        merged = delta.groupBy(
            self.level_col, self.bucket_col, *self.group_cols
        ).agg(*merge)
        self.store.write(merged, batch_id)


_NESTS = {
    "second": {"minute", "hour", "day", "week", "month", "quarter", "year"},
    "minute": {"hour", "day", "week", "month", "quarter", "year"},
    "hour": {"day", "week", "month", "quarter", "year"},
    "week": set(),  # ISO weeks straddle month/quarter/year boundaries
    "day": {"week", "month", "quarter", "year"},
    "month": {"quarter", "year"},
    "quarter": {"year"},
}


def _validate_nesting(fine: str, coarse: str) -> None:
    """Every fine bucket must lie wholly inside one coarse bucket, or
    coarse rows are computed from misattributed mass."""
    if coarse not in _NESTS.get(fine, set()):
        raise ValueError(
            f"(fine={fine!r}, coarse={coarse!r}) does not nest: every fine "
            "bucket must lie wholly inside one coarse bucket "
            f"(valid coarse for {fine!r}: {sorted(_NESTS.get(fine, set()))})"
        )


def sketch_rollup(
    df: DataFrame,
    time_col: str,
    value_col: str,
    fine: str = "day",
    coarse: str = "month",
    lg_k: int = 12,
) -> tuple[DataFrame, DataFrame]:
    """Mergeable distinct-count rollup: returns ``(fine_df, coarse_df)``
    where ``fine_df`` is (bucket, n_rows, distinct_est, sketch) per
    ``fine`` period and ``coarse_df`` re-aggregates to ``coarse``
    periods by MERGING the fine sketches (hll_union_agg) — the raw
    table is scanned exactly once.

    THE at-scale pattern for distinct-over-time: exact COUNT(DISTINCT)
    is not mergeable, so every coarser window re-shuffles the raw
    corpus; Datasketches HLL is a commutative monoid, so per-fine-
    bucket sketches (kilobytes each) roll up to any coarser period —
    month, rolling 7-day, all-time — with a bucket-count-sized merge.
    This is how the streaming side keeps "distinct users per hour/day/
    month" without unbounded state, and the batch side serves ad-hoc
    windows from a pre-aggregated sketch table.

    Error is the standard HLL ±1.04/sqrt(2^lg_k) (~1.6% at the default
    lg_k=12, ~kilobyte sketches). The sketch column is the binary
    Datasketches form — persistable and mergeable across batches.

    The ``(fine, coarse)`` pair must NEST — every fine bucket wholly
    inside one coarse bucket — or coarse rows are computed from
    misattributed mass (a week straddling a month boundary would land
    wholly in its start's month); non-nesting pairs (anything
    involving ``week`` above it, or reversed order) raise.
    """
    _validate_nesting(fine, coarse)
    fine_b = F.date_trunc(fine, F.col(time_col)).alias("bucket")
    fine_df = (
        df.groupBy(fine_b)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lg_k)).alias(
                "sketch"
            ),
        )
        .withColumn("distinct_est", F.hll_sketch_estimate("sketch"))
    )
    coarse_df = (
        fine_df.groupBy(F.date_trunc(coarse, F.col("bucket")).alias("bucket"))
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.hll_union_agg("sketch").alias("sketch"),
        )
        .withColumn("distinct_est", F.hll_sketch_estimate("sketch"))
    )
    return fine_df, coarse_df


def quantile_rollup(
    df: DataFrame,
    time_col: str,
    value_col: str,
    fine: str = "day",
    coarse: str = "month",
    num_bins: int = 256,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    lo: float | None = None,
    hi: float | None = None,
    round_to: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """Mergeable quantile rollup: ``(fine_df, coarse_df)``, each
    ``(bucket, q, est, n_rows)`` — per-period quantile estimates whose
    coarse level is computed by MERGING the fine level's histogram
    counts, never re-scanning raw data. The quantile companion to
    :func:`sketch_rollup`'s HLL story, for the same reason: exact
    percentiles are not mergeable (every coarser window re-sorts the
    raw corpus), but fixed-grid histogram counts are a commutative
    monoid — vector addition — so per-fine-bucket count rows
    (``num_bins`` longs each) roll up to any nesting coarser period
    with a bucket-count-sized sum. This is how latency/size/score
    percentile dashboards serve hour/day/month/all-time off ONE raw
    scan, batch or streaming.

    Estimator: global [lo, hi] bounds (min/max aggregate broadcast
    when not given — pass literals to skip the extra scan), values
    clamp into ``num_bins`` equal-width bins, and the q-quantile is
    the RIGHT EDGE of the first bin whose cumulative count reaches
    ``q * n_rows`` — deterministic, engine-portable arithmetic with
    absolute error bounded by one bin width ``(hi - lo) / num_bins``
    (tighten with more bins: counts stay longs, 4096 bins is still
    a kilobyte-scale row group per bucket). NULL values are excluded.
    The ``(fine, coarse)`` pair must nest, as in ``sketch_rollup``.
    """
    from pyspark.sql.window import Window

    _validate_nesting(fine, coarse)
    if num_bins < 1:
        raise ValueError("num_bins must be >= 1")
    if not quantiles or not all(0.0 < q <= 1.0 for q in quantiles):
        raise ValueError("quantiles must be in (0, 1]")
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull())
    if lo is None or hi is None:
        bounds = base.agg(
            F.min(v).cast("double").alias("__lo"),
            F.max(v).cast("double").alias("__hi"),
        )
        base = base.crossJoin(F.broadcast(bounds))
        lo_c, hi_c = F.col("__lo"), F.col("__hi")
    else:
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    width = (hi_c - lo_c) / F.lit(float(num_bins))
    raw_bin = F.when(width > 0, F.floor((v - lo_c) / width)).otherwise(F.lit(0))
    b = F.least(F.lit(num_bins - 1), F.greatest(F.lit(0), raw_bin)).cast("int")

    fine_hist = base.groupBy(
        F.date_trunc(fine, F.col(time_col)).alias("bucket"),
        b.alias("bin"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        # carry the bounds through the monoid so estimation never
        # rescans (first() of a broadcast constant)
        F.first(lo_c).alias("__blo"),
        F.first(hi_c).alias("__bhi"),
    )
    coarse_hist = fine_hist.groupBy(
        F.date_trunc(coarse, F.col("bucket")).alias("bucket"),
        "bin",
    ).agg(
        F.sum("n").alias("n"),
        F.first("__blo").alias("__blo"),
        F.first("__bhi").alias("__bhi"),
    )

    def _estimate(hist: DataFrame) -> DataFrame:
        w_cum = Window.partitionBy("bucket").orderBy("bin").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        w_all = Window.partitionBy("bucket")
        cum = hist.select(
            "bucket",
            "bin",
            "__blo",
            "__bhi",
            F.sum("n").over(w_cum).alias("__cum"),
            F.sum("n").over(w_all).alias("n_rows"),
        )
        qlit = F.explode(
            F.lit([float(q) for q in quantiles])
        ).alias("q")
        hit = cum.select("*", qlit).filter(
            F.col("__cum") >= F.col("q") * F.col("n_rows")
        )
        return (
            hit.groupBy("bucket", "q")
            .agg(
                F.min("bin").alias("__bin"),
                F.first("__blo").alias("__blo"),
                F.first("__bhi").alias("__bhi"),
                F.first("n_rows").alias("n_rows"),
            )
            .select(
                "bucket",
                "q",
                F.round(
                    F.when(
                        F.col("__bhi") > F.col("__blo"),
                        F.col("__blo")
                        + (F.col("__bin") + 1)
                        * (F.col("__bhi") - F.col("__blo"))
                        / F.lit(float(num_bins)),
                    ).otherwise(F.col("__blo")),
                    round_to,
                ).alias("est"),
                "n_rows",
            )
        )

    return _estimate(fine_hist), _estimate(coarse_hist)
