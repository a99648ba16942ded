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
