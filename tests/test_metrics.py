"""Counter parity: observe() + listener mirror the reference's Kamon
event counters (SourceMetrics.scala:22-79)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from atiesh_spark.metrics import CounterListener, with_counters


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
