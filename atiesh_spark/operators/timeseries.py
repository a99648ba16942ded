"""Time-series rolling aggregates over event streams (batch side).

Trailing time-RANGE window statistics — the moving averages, rolling
counts, and rolling-z-score anomaly flags of metric pipelines. Frames
are VALUE-based (`rangeBetween` on epoch microseconds), not row-based:
ties in the timestamp all land in the same frame, so results are
deterministic even when event order within a timestamp is not.

Plan shape: one shuffle on the key column; every rolling statistic over
the same (key, window) pair shares that single sort — Spark evaluates
all frame aggregates in one `Window` physical operator. The epoch-micros
order key is wall-clock arithmetic from TIMESTAMP_NTZ
(`timestampdiff` against the NTZ epoch), session-timezone-independent
by the same argument as ``sources/tables.epoch_nanos_to_ntz``.

Scale note: a per-key window serializes each key onto one task — the
right plan when keys are plentiful (users, devices, series ids). For a
handful of global series, pre-bucket time as in
``operators/asof.asof_join_bucketed``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_US = 1_000_000


def epoch_micros(ts_col: str) -> Column:
    """TIMESTAMP_NTZ -> epoch microseconds, timezone-independent
    (wall-clock difference from the NTZ epoch, never through an instant).
    """
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
    )


def rolling_aggregate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    round_to: int = 4,
) -> DataFrame:
    """Trailing-window rolling stats per key: input columns plus
    ``rolling_avg``, ``rolling_sum``, ``rolling_n`` over the inclusive
    frame [ts - window_seconds, ts].

    One shuffle (the key partition sort); all three aggregates share a
    single Window operator.
    """
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    w = (
        Window.partitionBy(key_col)
        .orderBy(epoch_micros(ts_col))
        .rangeBetween(-window_seconds * _US, 0)
    )
    return df.select(
        "*",
        F.round(F.avg(value_col).over(w), round_to).alias("rolling_avg"),
        F.round(F.sum(value_col).over(w), round_to).alias("rolling_sum"),
        F.count(F.lit(1)).over(w).alias("rolling_n"),
    )


def zscore_outliers(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    z_threshold: float = 3.0,
    round_to: int = 4,
) -> DataFrame:
    """Rolling z-score anomaly detection: input columns plus ``zscore``
    (value's deviation from the trailing-window mean in trailing-window
    sample standard deviations, rounded) and ``is_outlier``.

    The frame INCLUDES the current row (the streaming-friendly
    convention: no look-ahead, stats well-defined from the second event
    per key). Frames with fewer than 2 rows or zero variance yield a
    NULL zscore and ``is_outlier = false`` — degenerate windows are
    never flagged.
    """
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    w = (
        Window.partitionBy(key_col)
        .orderBy(epoch_micros(ts_col))
        .rangeBetween(-window_seconds * _US, 0)
    )
    mean = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    z = F.round(
        F.when(sd > 0, (F.col(value_col) - mean) / sd), round_to
    )
    return df.select(
        "*",
        z.alias("zscore"),
        F.coalesce(F.abs(z) > F.lit(float(z_threshold)), F.lit(False)).alias(
            "is_outlier"
        ),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    threshold: float = 3.5,
    round_to: int = 4,
) -> DataFrame:
    """Robust per-group outlier flags via median absolute deviation:
    appends ``robust_z`` (0.6745 * |v - median| / MAD, the standard
    consistency-scaled modified z-score) and ``is_outlier``
    (robust_z > ``threshold``; false when MAD is 0 or the value NULL).

    The robust sibling of ``zscore_outliers``: mean/stddev move with the
    outliers they are supposed to expose (one 1e9 spike drags the mean),
    while median/MAD have a 50% breakdown point — the right detector for
    sensor glitches and billing spikes.

    Plan shape: two exact-percentile groupBys (Spark ``percentile``,
    interpolation-compatible with quantile_cont everywhere) with the
    group-sized results broadcast back; the fact table never shuffles —
    same moments-broadcast pattern as ``profile.group_standardize``,
    chosen over PARTITION BY windows for the same 100 TB reason. Exact
    medians need per-group value collection on the agg side, so group
    count must be >> partition count; swap in approx_percentile if a
    group's values outgrow executor memory.
    """
    if threshold <= 0:
        raise ValueError("threshold must be > 0")
    reserved = {"__med", "__mad", "__gm", "__gd", "robust_z", "is_outlier"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input columns collide with reserved names: {sorted(clash)}")
    v = F.col(value_col).cast("double")
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    # null-safe group joins: a NULL group is a group (SQL window/groupBy
    # semantics), not rows a plain equi-join may silently drop
    med_t = med.select(F.col(group_col).alias("__gm"), "__med")
    dev = df.join(F.broadcast(med_t), F.col(group_col).eqNullSafe(F.col("__gm")))
    mad = dev.groupBy(group_col).agg(
        F.expr(f"percentile(abs({value_col} - __med), 0.5)").alias("__mad")
    )
    mad_t = mad.select(F.col(group_col).alias("__gd"), "__mad")
    rz = F.when(
        F.col("__mad") > 0,
        F.round(F.lit(0.6745) * F.abs(v - F.col("__med")) / F.col("__mad"), round_to),
    )
    return (
        df.join(F.broadcast(med_t), F.col(group_col).eqNullSafe(F.col("__gm")))
        .join(F.broadcast(mad_t), F.col(group_col).eqNullSafe(F.col("__gd")))
        .withColumn("robust_z", rz)
        .withColumn(
            "is_outlier",
            F.coalesce(F.col("robust_z") > threshold, F.lit(False)),
        )
        .drop("__gm", "__gd", "__med", "__mad")
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    tiebreak_cols: list[str] | None = None,
    round_to: int = 4,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event sequences:
    (from_state, to_state, n, p) — the user-journey / process-mining
    report ("after search, 62% view, 9% exit").

    ``p`` is row-normalized: transitions out of ``from_state`` sum to 1.
    Sequence ends (no next event) are not transitions and are excluded.

    Plan shape: one window shuffle on ``key_col`` computes each event's
    successor (``lead``); the (from, to) pair counts are a map-side-
    combined groupBy over states^2 rows at most, and row normalization
    is a window over that tiny matrix — at 100 TB the only full-data
    stage is the per-key lead, which shares its partitioning with any
    other per-key sequence feature.
    """
    order = [F.col(order_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        df.withColumn("__next", F.lead(state_col).over(w))
        .filter(F.col("__next").isNotNull())
        .groupBy(
            F.col(state_col).alias("from_state"),
            F.col("__next").alias("to_state"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrow = Window.partitionBy("from_state")
    return pairs.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(wrow), round_to)
    )


def interarrival_stats(
    df: DataFrame,
    key_col: str,
    order_col: str,
    group_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Per-group inter-arrival-time statistics:
    (group, n_gaps, avg_gap_s, p50_gap_s, p90_gap_s, max_gap_s).

    The gap is seconds since the SAME KEY's previous event (first event
    per key has none), grouped by ``group_col`` of the later event — the
    latency/engagement-cadence report ("purchases arrive every ~2 h,
    errors in bursts of seconds").

    Plan shape: the same single per-key window shuffle as
    ``transition_matrix`` (lag over epoch micros), then one exact-
    percentile groupBy over the group-cardinality frame. Exact
    ``percentile`` interpolates like quantile_cont everywhere, keeping
    the report engine-checkable.
    """
    w = Window.partitionBy(key_col).orderBy(epoch_micros(order_col))
    gap = (
        epoch_micros(order_col) - F.lag(epoch_micros(order_col)).over(w)
    ) / F.lit(float(_US))
    return (
        df.withColumn("__gap", gap)
        .filter(F.col("__gap").isNotNull())
        .groupBy(F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg("__gap"), round_to).alias("avg_gap_s"),
            F.round(F.expr("percentile(__gap, 0.5)"), round_to).alias("p50_gap_s"),
            F.round(F.expr("percentile(__gap, 0.9)"), round_to).alias("p90_gap_s"),
            F.round(F.max("__gap"), round_to).alias("max_gap_s"),
        )
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    round_to: int = 4,
) -> DataFrame:
    """Resample each key's irregular series onto a regular grid with
    forward fill: (key_col, grid_ts, value, n_obs) — one row per
    ``step_seconds`` tick from the key's first observation's bucket to
    its last, ``value`` = the last observation WITHIN the tick's bucket
    ``[tick, tick+step)`` — the pandas left-labeled resample
    convention: a bucket's label is its left edge, so the value can
    come from up to ``step_seconds-1`` after the label — carried
    forward over empty buckets (ties broken by LARGEST value for
    determinism under duplicate timestamps), ``n_obs`` = observations
    inside that tick's bucket (0 for gap ticks that exist only by
    fill).

    The gap-filling step of every metric/feature pipeline (regular
    grids are what joins, models and charts consume; sensors and
    events are never regular). NULL observed values are treated as
    absent for fill purposes (the previous non-NULL value carries
    forward — the pandas ``ffill`` contract).

    Plan: per-key min/max bound the grid (one map-side-combined
    groupBy), ``sequence()`` generates each key's ticks executor-side
    (never a driver-side calendar), observations bucket to their tick
    with a groupBy agg of (last ts, its value, count), and the fill is
    a running ``last(..., ignorenulls)`` over the union of grid and
    bucket rows inside ONE per-key window sort. Total rows = grid
    ticks + buckets — linear in span/step, no cross join against a
    calendar table.
    """
    if step_seconds <= 0:
        raise ValueError("step_seconds must be positive")
    step_us = step_seconds * _US
    us = epoch_micros(ts_col)
    obs = df.select(
        F.col(key_col),
        (F.floor(us / step_us) * step_us).cast("long").alias("__tick"),
        us.alias("__us"),
        F.col(value_col).cast("double").alias("__v"),
    )
    # per-bucket reduction: the value of the LATEST observation in the
    # bucket (max (us, value) struct — value tiebreak makes duplicate
    # timestamps deterministic), plus the observation count
    buckets = obs.groupBy(key_col, "__tick").agg(
        F.max(
            F.when(
                F.col("__v").isNotNull(),
                F.struct(F.col("__us").alias("u"), F.col("__v").alias("v")),
            )
        ).alias("__last"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    span = obs.groupBy(key_col).agg(
        F.min("__tick").alias("__t0"), F.max("__tick").alias("__t1")
    )
    grid = span.select(
        F.col(key_col),
        F.explode(
            F.sequence(F.col("__t0"), F.col("__t1"), F.lit(step_us))
        ).alias("__tick"),
    )
    joined = grid.join(buckets, [key_col, "__tick"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("__tick")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = joined.select(
        F.col(key_col),
        F.timestamp_micros(F.col("__tick")).alias("grid_ts"),
        F.round(
            F.last(F.col("__last.v"), ignorenulls=True).over(w), round_to
        ).alias("value"),
        F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
    )
    return filled
