"""Stream-stream and stream-static joins with bounded state.

Beyond the reference's event-mover surface: correlating two live
streams (clicks x impressions, requests x responses) is the Structured
Streaming capability an analytics engine needs that an actor pipeline
cannot express. The engine keeps both sides' unmatched rows in state
until the watermark says the other side can no longer produce a match —
so every join here REQUIRES watermarks and a time-range condition;
without them state grows unboundedly and a 100 TB deployment dies of
state, not of data.

Spark's own `join` already implements the semantics; what this module
adds is the guard rails: the builder refuses unbounded-state shapes
instead of letting them reach production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUPPORTED = ("inner", "left_outer", "leftouter", "left")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    watermark: str,
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on a key within a time interval: rows pair
    when ``right_ts BETWEEN left_ts - lower AND left_ts + upper``, with
    ``watermark`` bounding both sides' state. Right-side columns whose
    names collide with left ones come back suffixed ``_r``.

    The ad-attribution / request-response correlation shape. State per
    side is (watermark + interval) worth of rows per key — bounded by
    construction. ``how='left_outer'`` additionally emits unmatched left
    rows once the watermark passes (the "request with no response"
    audit rows); outer results are therefore delayed by the watermark,
    which is the contract, not a bug.

    Batch DataFrames pass through the same plan (Spark treats the range
    condition as an ordinary join predicate), so the semantics are
    testable without a running stream.
    """
    if how not in _SUPPORTED:
        raise ValueError(f"how must be one of {_SUPPORTED}, got {how!r}")
    if on not in left.columns or on not in right.columns:
        raise KeyError(f"join key {on!r} missing from a side")
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    l_ts, r_ts = F.col(f"__l.{left_ts}"), F.col(f"__r.{right_ts}")
    cond = (
        (F.col(f"__l.{on}") == F.col(f"__r.{on}"))
        & (r_ts >= l_ts - F.expr(f"INTERVAL {lower}"))
        & (r_ts <= l_ts + F.expr(f"INTERVAL {upper}"))
    )
    joined = lw.alias("__l").join(rw.alias("__r"), cond, how)
    # project the join key once (from the left side, which outer joins keep)
    keep = [F.col(f"__l.{on}").alias(on)]
    keep += [F.col(f"__l.{c}") for c in left.columns if c != on]
    keep += [
        F.col(f"__r.{c}").alias(f"{c}_r" if c in left.columns else c)
        for c in right.columns
        if c != on
    ]
    return joined.select(*keep)
