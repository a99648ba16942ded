"""Metrics parity: observe() + listeners mirror the reference's Kamon
counters and distribution instruments (Metrics.scala:26-146,
SourceMetrics.scala:22-79)."""

from __future__ import annotations

import time
from types import SimpleNamespace

import pytest

from pyspark.sql import functions as F

from atiesh_spark.metrics import (
    CounterListener,
    Histogram,
    MetricsListener,
    Timer,
    with_counters,
)


def test_counters_accumulate_over_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text("x\ny\n")
    (src / "b.txt").write_text("z\n")

    listener = CounterListener()
    spark.streams.addListener(listener)
    try:
        df = spark.readStream.format("text").load(str(src))
        observed = with_counters(
            df.select(F.col("value"), F.create_map().alias("headers")),
            extra={"clicks": F.count(F.when(F.col("value") == "x", 1))},
        )
        q = (
            observed.writeStream.format("noop")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()
        deadline = time.time() + 10
        while listener.batches == 0 and time.time() < deadline:
            time.sleep(0.2)
        assert listener.totals["events_accepted"] == 3
        assert listener.totals["events_with_value"] == 3
        assert listener.totals["clicks"] == 1
    finally:
        spark.streams.removeListener(listener)


def test_histogram_buckets_and_stats():
    h = Histogram()
    for v in [1, 2, 3, 100, 1000]:
        h.record(v)
    snap = h.snapshot()
    assert snap["count"] == 5 and snap["min"] == 1 and snap["max"] == 1000
    assert snap["mean"] == pytest.approx(1106 / 5)
    # log2 buckets: 1->le_2^0, 2->le_2^1, 3->le_2^2, 100->le_2^7, 1000->le_2^10
    assert snap["buckets"] == {
        "le_2^0": 1, "le_2^1": 1, "le_2^2": 1, "le_2^7": 1, "le_2^10": 1,
    }
    with pytest.raises(ValueError, match=">= 0"):
        h.record(-1)


def test_histogram_fractional_values_round_up():
    """Fractional samples (timer ms) must land in the bucket whose
    'value <= 2^k' contract actually holds."""
    h = Histogram()
    h.record(2.5)   # > 2 -> le_2^2, not le_2^1
    h.record(1.5)   # > 1 -> le_2^1
    h.record(2.0)   # == 2 -> le_2^1
    h.record(0.25)  # <= 1 -> le_2^0
    assert h.snapshot()["buckets"] == {"le_2^0": 1, "le_2^1": 2, "le_2^2": 1}


def test_timer_context_manager_records_ms():
    t = Timer()
    with t:
        time.sleep(0.01)
    assert t.histogram.count == 1
    assert t.histogram.min >= 5  # at least ~10ms slept, generous lower bound


def _progress(duration_ms, rows, in_rps=5.0, out_rps=4.0):
    return SimpleNamespace(
        progress=SimpleNamespace(
            observedMetrics={},
            durationMs={"triggerExecution": duration_ms},
            numInputRows=rows,
            inputRowsPerSecond=in_rps,
            processedRowsPerSecond=out_rps,
        )
    )


def test_metrics_listener_records_distributions():
    ml = MetricsListener()
    ml.onQueryProgress(_progress(40, 100))
    ml.onQueryProgress(_progress(80, 300, in_rps=9.0))
    assert ml.batch_duration_ms.histogram.count == 2
    assert ml.batch_duration_ms.histogram.sum == pytest.approx(120.0)
    assert ml.input_rows.count == 2 and ml.input_rows.max == 300
    assert ml.gauges["last_input_rows_per_sec"] == 9.0
    assert ml.gauges["last_processed_rows_per_sec"] == 4.0


def test_metrics_listener_on_live_stream(spark, tmp_path):
    """MetricsListener must also work against real progress events."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.txt").write_text("x\ny\n")

    ml = MetricsListener()
    spark.streams.addListener(ml)
    try:
        df = spark.readStream.format("text").load(str(src))
        q = (
            df.writeStream.format("noop")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )
        q.awaitTermination()
        deadline = time.time() + 10
        while ml.input_rows.count == 0 and time.time() < deadline:
            time.sleep(0.2)
        assert ml.input_rows.count >= 1
        assert ml.input_rows.sum >= 2  # both lines seen
        assert ml.batch_duration_ms.histogram.count >= 1
    finally:
        spark.streams.removeListener(ml)
