import pytest
from pyspark.sql import functions as F

from atiesh_spark.operators.diffing import snapshot_diff


def _collect(df):
    return {r["k"]: r for r in df.collect()}


def test_snapshot_diff_classifies_all_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "c", 3.5), (4, "D", 4.5), (5, "e", 5.0)],
        "k long, s string, v double",
    )
    out = _collect(snapshot_diff(old, new, keys=["k"]))
    assert len(out) == 5
    assert out[1]["status"] == "removed" and out[1]["changed_cols"] == ""
    assert out[5]["status"] == "added" and out[5]["n_changed"] == 0
    assert out[2]["status"] == "unchanged"
    # null -> value is a change (null-safe comparison)
    assert out[3]["status"] == "changed" and out[3]["changed_cols"] == "v"
    # two columns changed: names sorted, comma-joined
    assert out[4]["status"] == "changed"
    assert out[4]["changed_cols"] == "s,v" and out[4]["n_changed"] == 2


def test_snapshot_diff_null_equals_null(spark):
    old = spark.createDataFrame([(1, None)], "k long, v double")
    new = spark.createDataFrame([(1, None)], "k long, v double")
    out = _collect(snapshot_diff(old, new, keys=["k"]))
    assert out[1]["status"] == "unchanged"


def test_snapshot_diff_validates_inputs(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    with pytest.raises(ValueError):
        snapshot_diff(df, df, keys=[])
    with pytest.raises(KeyError):
        snapshot_diff(df, df, keys=["missing"])
    with pytest.raises(KeyError):
        snapshot_diff(df, df, keys=["k"], compare_cols=["nope"])
    bad = df.withColumnRenamed("s", "status")
    with pytest.raises(ValueError, match="reserved"):
        snapshot_diff(bad, bad, keys=["k"])


def test_snapshot_diff_no_compare_cols_is_presence_only(spark):
    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    out = _collect(snapshot_diff(old, new, keys=["k"]))
    assert out[1]["status"] == "removed"
    assert out[2]["status"] == "unchanged"
    assert out[3]["status"] == "added"


def _canon_scd2(df):
    return sorted(
        (r["user_id"], str(r["valid_from"]), r["event_type"],
         str(r["valid_to"]), r["is_current"])
        for r in df.collect()
    )


def test_streaming_scd2_equals_batch_over_time_split_batches(spark, tmp_path):
    from atiesh_spark.operators.diffing import StreamingScd2, scd2_intervals
    from atiesh_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    cut1, cut2 = "2024-01-01 08:00:00", "2024-01-01 16:00:00"
    # time-split batches: each key's observations arrive in event order
    # across batches — the operator's stated exactness contract
    b1 = ev.filter(f"ts < '{cut1}'")
    b2 = ev.filter(f"ts >= '{cut1}' AND ts < '{cut2}'")
    b3 = ev.filter(f"ts >= '{cut2}'")

    scd = StreamingScd2(
        ["user_id"], "ts", ["event_type"], str(tmp_path / "scd"),
        tiebreak_cols=["event_id"],
    )
    scd(b1, 0)
    scd(b2, 1)
    scd(b3, 2)

    expect = scd2_intervals(
        ev, ["user_id"], "ts", ["event_type"], tiebreak_cols=["event_id"]
    )
    assert _canon_scd2(scd.read(spark)) == _canon_scd2(expect)

    # failure replay: batch 2 reruns against pre-2 state -> same result
    scd(b3, 2)
    assert _canon_scd2(scd.read(spark)) == _canon_scd2(expect)

    import os

    assert sorted(os.listdir(tmp_path / "scd")) == ["v1", "v2"]


def test_streaming_scd2_untouched_keys_pass_through(spark, tmp_path):
    from atiesh_spark.operators.diffing import StreamingScd2

    scd = StreamingScd2(["user_id"], "ts", ["event_type"], str(tmp_path / "s"))
    b1 = spark.createDataFrame(
        [("u1", 1, "a"), ("u2", 1, "x")], ["user_id", "ts", "event_type"]
    )
    b2 = spark.createDataFrame([("u1", 5, "b")], ["user_id", "ts", "event_type"])
    scd(b1, 0)
    scd(b2, 1)
    got = {
        (r["user_id"], r["ts"], r["event_type"], r["valid_to"], r["is_current"])
        for r in scd.read(spark)
        .select("user_id", F.col("valid_from").alias("ts"), "event_type",
                "valid_to", "is_current")
        .collect()
    }
    assert got == {
        ("u1", 1, "a", 5, False),
        ("u1", 5, "b", None, True),
        ("u2", 1, "x", None, True),  # untouched by b2, passed through
    }


def test_streaming_scd2_late_row_updates_its_interval(spark, tmp_path):
    """The documented late-data boundary: a late observation between two
    stored change points splits the interval it falls in (it cannot
    resurrect collapsed non-change rows, but the visible history stays
    consistent)."""
    from atiesh_spark.operators.diffing import StreamingScd2

    scd = StreamingScd2(["user_id"], "ts", ["event_type"], str(tmp_path / "s"))
    scd(spark.createDataFrame(
        [("u1", 1, "a"), ("u1", 9, "c")], ["user_id", "ts", "event_type"]
    ), 0)
    scd(spark.createDataFrame(
        [("u1", 5, "b")], ["user_id", "ts", "event_type"]
    ), 1)  # late: lands inside [1, 9)
    got = _canon_scd2(scd.read(spark))
    assert got == [
        ("u1", "1", "a", "5", False),
        ("u1", "5", "b", "9", False),
        ("u1", "9", "c", "None", True),
    ]
