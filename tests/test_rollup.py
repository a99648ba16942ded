"""Cascade rollup: coarse levels re-aggregate fine levels exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from atiesh_spark.operators.rollup import cascade_rollup
from atiesh_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_cascade_equals_direct_aggregation(spark):
    ev = load_table(spark, SF_SMALL, "events")
    out = cascade_rollup(
        ev, "ts", ["10 minutes", "1 hour"],
        aggs={"n": ("event_id", "count"), "s": ("value", "sum"),
              "mx": ("value", "max")},
    )
    hourly = {r["bucket"]: r for r in out.filter("level = '1 hour'").collect()}
    direct = {
        r["b"]: r
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"),
             F.max("value").alias("mx"))
        .select(F.col("w.start").alias("b"), "n", "s", "mx")
        .collect()
    }
    assert hourly.keys() == direct.keys() and len(hourly) > 0
    for b in hourly:
        assert hourly[b]["n"] == direct[b]["n"]
        assert abs(hourly[b]["s"] - direct[b]["s"]) < 1e-6
        assert hourly[b]["mx"] == direct[b]["mx"]
    # totals conserved across levels
    fine = out.filter("level = '10 minutes'")
    assert fine.agg(F.sum("n")).first()[0] == ev.count()


def test_cascade_with_group_cols_and_validation(spark):
    ev = load_table(spark, SF_SMALL, "events")
    out = cascade_rollup(
        ev, "ts", ["30 minutes", "1 hour"],
        aggs={"n": ("event_id", "count")}, group_cols=["event_type"],
    )
    assert set(out.columns) == {"level", "bucket", "event_type", "n"}
    assert out.filter("level = '1 hour'").count() > 0

    with pytest.raises(ValueError, match="not cascade-safe"):
        cascade_rollup(ev, "ts", ["1 hour"], aggs={"a": ("value", "avg")})
    with pytest.raises(ValueError, match="at least one level"):
        cascade_rollup(ev, "ts", [], aggs={"n": ("event_id", "count")})


_AGGS = {"n": ("event_id", "count"), "s": ("value", "sum"), "mx": ("value", "max")}


def _canon(df):
    return sorted(
        (r["level"], r["bucket"], r["n"], round(r["s"], 6), round(r["mx"], 6))
        for r in df.collect()
    )


def test_streaming_rollup_equals_batch_cascade(spark, tmp_path):
    """N micro-batches through the foreachBatch maintainer == one batch
    cascade over the union — and a replayed batch changes nothing
    (idempotent versioned store)."""
    from atiesh_spark.operators.rollup import StreamingCascadeRollup

    ev = load_table(spark, SF_SMALL, "events")
    b1 = ev.filter("event_id % 3 = 0")
    b2 = ev.filter("event_id % 3 = 1")
    b3 = ev.filter("event_id % 3 = 2")  # includes "late" ts older than b1's

    roll = StreamingCascadeRollup(
        "ts", ["10 minutes", "1 hour"], _AGGS, str(tmp_path / "roll")
    )
    roll(b1, 0)
    roll(b2, 1)
    roll(b3, 2)

    expect = cascade_rollup(ev, "ts", ["10 minutes", "1 hour"], _AGGS)
    assert _canon(roll.read(spark)) == _canon(expect)

    # failure replay: batch 2 runs again -> reads pre-2 state, same result
    roll(b3, 2)
    assert _canon(roll.read(spark)) == _canon(expect)

    # old versions pruned (keep_versions=2)
    import os

    vs = sorted(os.listdir(tmp_path / "roll"))
    assert vs == ["v1", "v2"]


def test_streaming_rollup_from_real_stream(spark, tmp_path):
    """End-to-end through Structured Streaming: a file-source stream
    drained in micro-batches must leave the exact batch-cascade state."""
    from atiesh_spark.operators.rollup import StreamingCascadeRollup

    ev = load_table(spark, SF_SMALL, "events").select("event_id", "ts", "value")
    src = str(tmp_path / "src")
    ev.filter("event_id % 2 = 0").write.parquet(f"{src}/part=a")
    ev.filter("event_id % 2 = 1").write.parquet(f"{src}/part=b")

    roll = StreamingCascadeRollup(
        "ts", ["10 minutes", "1 hour"], _AGGS, str(tmp_path / "roll")
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(f"{src}/part=*")
    )
    q = (
        stream.writeStream.foreachBatch(roll)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    expect = cascade_rollup(ev, "ts", ["10 minutes", "1 hour"], _AGGS)
    assert _canon(roll.read(spark)) == _canon(expect)


def test_count_skips_nulls_and_star_variant(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:01:00", 1.0), ("2024-01-01 00:02:00", None)],
        "ts_s string, v double",
    ).selectExpr("CAST(ts_s AS TIMESTAMP_NTZ) AS ts", "v")
    out = cascade_rollup(
        df, "ts", ["1 hour"],
        aggs={"n_v": ("v", "count"), "n_all": (None, "count")},
    ).collect()[0]
    assert out["n_v"] == 1 and out["n_all"] == 2


def test_sketch_rollup_merge_matches_direct_and_exact(spark):
    """Small cardinalities sit in HLL's exact (sparse) range: per-day
    estimates equal the true distincts, and the month-level MERGE of
    day sketches equals sketching the month directly."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from atiesh_spark.operators.rollup import sketch_rollup

    rows = []
    for day in (1, 2, 15):
        for u in range(day * 10):  # day1: u0-9, day2: u0-19, day15: u0-149
            rows.append((datetime(2024, 3, day, 12, 0), u % 40))
    df = spark.createDataFrame(rows, "ts timestamp, user_id int")
    fine, coarse = sketch_rollup(df, "ts", "user_id")
    got_fine = {
        r["bucket"].day: (r["n_rows"], r["distinct_est"]) for r in fine.collect()
    }
    assert got_fine[1] == (10, 10.0)
    assert got_fine[2] == (20, 20.0)
    assert got_fine[15] == (150, 40.0)  # u % 40 wraps
    got_coarse = coarse.collect()
    assert len(got_coarse) == 1
    assert got_coarse[0]["n_rows"] == 180
    assert got_coarse[0]["distinct_est"] == 40.0  # union over days
    direct = df.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12))
        ).alias("e")
    ).first()["e"]
    assert got_coarse[0]["distinct_est"] == direct


def test_sketch_rollup_rejects_non_nesting_pairs(spark):
    import pytest

    from atiesh_spark.operators.rollup import sketch_rollup

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "v long, ts string"
    ).selectExpr("v", "CAST(ts AS TIMESTAMP) AS ts")
    for fine, coarse in [("week", "month"), ("week", "year"),
                         ("month", "day"), ("day", "day")]:
        with pytest.raises(ValueError, match="does not nest"):
            sketch_rollup(df, "ts", "v", fine=fine, coarse=coarse)
    sketch_rollup(df, "ts", "v", fine="day", coarse="week")  # nests: ok


# ------------------------------------------------------- quantile rollup

def _qr_events(spark):
    import random

    rng = random.Random(13)
    rows = [
        (
            f"2024-{m:02d}-{d:02d} {h:02d}:00:00",
            rng.uniform(0, 100) if rng.random() > 0.02 else None,
        )
        for m in (1, 2)
        for d in (1, 5, 9, 20)
        for h in range(6)
    ]
    return spark.createDataFrame(rows, "ts string, value double").select(
        F.to_timestamp("ts").alias("ts"), "value"
    )


def test_quantile_rollup_merge_equals_direct(spark):
    from atiesh_spark.operators.rollup import quantile_rollup

    df = _qr_events(spark)
    _, merged = quantile_rollup(df, "ts", "value", "day", "month", num_bins=32)
    direct, _ = quantile_rollup(
        df, "ts", "value", "month", "quarter", num_bins=32
    )
    m = sorted(tuple(r) for r in merged.collect())
    d = sorted(tuple(r) for r in direct.collect())
    assert m == d


def test_quantile_rollup_error_bounded_by_bin_width(spark):
    from atiesh_spark.operators.rollup import quantile_rollup

    df = _qr_events(spark)
    nb = 64
    fine, coarse = quantile_rollup(
        df, "ts", "value", "day", "month", num_bins=nb
    )
    bounds = df.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    ).first()
    width = (bounds["hi"] - bounds["lo"]) / nb
    for frame, unit in ((fine, "day"), (coarse, "month")):
        exact = {
            (r["bucket"], r["q"]): r["x"]
            for r in df.filter(F.col("value").isNotNull())
            .groupBy(F.date_trunc(unit, "ts").alias("bucket"))
            .agg(
                F.explode(
                    F.arrays_zip(
                        F.lit([0.5, 0.95, 0.99]).alias("q"),
                        F.percentile_approx(
                            "value", F.lit([0.5, 0.95, 0.99]), F.lit(100000)
                        ).alias("x"),
                    )
                ).alias("zz")
            )
            .select("bucket", F.col("zz.q").alias("q"), F.col("zz.x").alias("x"))
            .collect()
        }
        for r in frame.collect():
            assert abs(r["est"] - exact[(r["bucket"], r["q"])]) <= width + 1e-9, (
                unit,
                r,
            )


def test_quantile_rollup_excludes_nulls_and_validates(spark):
    import pytest as _pt

    from atiesh_spark.operators.rollup import quantile_rollup

    df = _qr_events(spark)
    fine, _ = quantile_rollup(df, "ts", "value", "day", "month")
    n_nonnull = df.filter(F.col("value").isNotNull()).count()
    assert (
        fine.select(F.sum("n_rows")).first()[0]
        == n_nonnull * 3  # one row per quantile
    )
    with _pt.raises(ValueError, match="nest"):
        quantile_rollup(df, "ts", "value", "week", "month")
    with _pt.raises(ValueError, match="quantiles"):
        quantile_rollup(df, "ts", "value", quantiles=(0.0,))
    with _pt.raises(ValueError, match="num_bins"):
        quantile_rollup(df, "ts", "value", num_bins=0)


def test_cascade_rollup_rejects_non_nesting_levels(spark):
    import pytest as _pt

    from atiesh_spark.operators.rollup import cascade_rollup

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1)], "ts string, v long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with _pt.raises(ValueError, match="do not nest"):
        cascade_rollup(df, "ts", ["7 hours", "1 day"], {"n": (None, "count")})
    # nesting multiples still accepted
    cascade_rollup(df, "ts", ["3 hours", "1 day"], {"n": (None, "count")})
