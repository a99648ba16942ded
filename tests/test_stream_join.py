"""Stream-stream interval join: batch-semantics parity + a true
two-stream end-to-end run (file sources, availableNow) proving the
streaming plan accepts the watermark + time-range shape and produces
exactly the batch answer.
"""

from __future__ import annotations

import json

import pytest

from atiesh_spark.streaming.joins import interval_join

_CLICKS = [
    # (user, ts, page)
    (1, "2024-01-01 00:00:00", "a"),
    (1, "2024-01-01 00:10:00", "b"),
    (2, "2024-01-01 00:00:30", "c"),
    (3, "2024-01-01 00:00:00", "d"),
]
_BUYS = [
    # (user, ts, amount)
    (1, "2024-01-01 00:04:00", 10.0),   # within 5m of click a
    (1, "2024-01-01 00:14:00", 20.0),   # within 5m of click b
    (2, "2024-01-01 00:00:10", 30.0),   # BEFORE the click -> no match (lower=0)
    (4, "2024-01-01 00:01:00", 40.0),   # no click for user 4
]


def _frames(spark):
    clicks = spark.createDataFrame(
        [(u, t, p) for u, t, p in _CLICKS], "user_id long, ts string, page string"
    ).selectExpr("user_id", "cast(ts as timestamp) as ts", "page")
    buys = spark.createDataFrame(
        [(u, t, a) for u, t, a in _BUYS], "user_id long, ts string, amount double"
    ).selectExpr("user_id", "cast(ts as timestamp) as ts", "amount")
    return clicks, buys


def test_interval_join_batch_semantics(spark):
    clicks, buys = _frames(spark)
    out = interval_join(
        clicks, buys, on="user_id", left_ts="ts", right_ts="ts",
        watermark="10 minutes", lower="0 seconds", upper="5 minutes",
    ).collect()
    got = sorted((r["user_id"], r["page"], r["amount"]) for r in out)
    assert got == [(1, "a", 10.0), (1, "b", 20.0)]
    # collision suffix: right ts surfaces as ts_r
    assert "ts_r" in interval_join(
        clicks, buys, on="user_id", left_ts="ts", right_ts="ts",
        watermark="10 minutes",
    ).columns


def test_interval_join_left_outer_keeps_unmatched_left(spark):
    clicks, buys = _frames(spark)
    out = interval_join(
        clicks, buys, on="user_id", left_ts="ts", right_ts="ts",
        watermark="10 minutes", lower="0 seconds", upper="5 minutes",
        how="left_outer",
    ).collect()
    unmatched = sorted(r["page"] for r in out if r["amount"] is None)
    assert unmatched == ["c", "d"]  # user2's buy was pre-click; user3 never bought


def test_interval_join_validates(spark):
    clicks, buys = _frames(spark)
    with pytest.raises(ValueError, match="how"):
        interval_join(clicks, buys, on="user_id", left_ts="ts", right_ts="ts",
                      watermark="1 minutes", how="full_outer")
    with pytest.raises(KeyError):
        interval_join(clicks, buys, on="nope", left_ts="ts", right_ts="ts",
                      watermark="1 minutes")


def test_interval_join_two_streams_end_to_end(spark, tmp_path):
    ldir, rdir = tmp_path / "clicks", tmp_path / "buys"
    ldir.mkdir(), rdir.mkdir()
    (ldir / "part1.json").write_text(
        "\n".join(json.dumps({"user_id": u, "ts": t, "page": p}) for u, t, p in _CLICKS)
    )
    (rdir / "part1.json").write_text(
        "\n".join(json.dumps({"user_id": u, "ts": t, "amount": a}) for u, t, a in _BUYS)
    )
    clicks = (
        spark.readStream.schema("user_id long, ts string, page string")
        .json(str(ldir))
        .selectExpr("user_id", "cast(ts as timestamp) as ts", "page")
    )
    buys = (
        spark.readStream.schema("user_id long, ts string, amount double")
        .json(str(rdir))
        .selectExpr("user_id", "cast(ts as timestamp) as ts", "amount")
    )
    joined = interval_join(
        clicks, buys, on="user_id", left_ts="ts", right_ts="ts",
        watermark="10 minutes", lower="0 seconds", upper="5 minutes",
    )
    assert joined.isStreaming
    rows: list = []
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda df, _id: rows.extend(df.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = sorted((r["user_id"], r["page"], r["amount"]) for r in rows)
    assert got == [(1, "a", 10.0), (1, "b", 20.0)]
