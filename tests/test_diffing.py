import pytest

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
