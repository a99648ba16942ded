from datetime import datetime, timedelta

import pytest

from atiesh_spark.operators.timeseries import rolling_aggregate, zscore_outliers

_SCHEMA = "event_id long, user_id long, ts timestamp_ntz, value double"


def _ev(i, u, sec, v):
    return (i, u, datetime(2024, 1, 1) + timedelta(seconds=sec), v)


def test_rolling_aggregate_trailing_frame_and_key_isolation(spark):
    df = spark.createDataFrame(
        [
            _ev(1, 1, 0, 10.0),
            _ev(2, 1, 30, 20.0),
            _ev(3, 1, 100, 30.0),  # 60s window: only itself + t=100-60..100
            _ev(4, 2, 30, 99.0),   # other key never mixes in
        ],
        _SCHEMA,
    )
    out = {
        r["event_id"]: r
        for r in rolling_aggregate(df, "user_id", "ts", "value", 60).collect()
    }
    assert out[1]["rolling_n"] == 1 and out[1]["rolling_avg"] == 10.0
    assert out[2]["rolling_n"] == 2 and out[2]["rolling_sum"] == 30.0
    # frame is [40s, 100s]: event at 30s has fallen out
    assert out[3]["rolling_n"] == 1 and out[3]["rolling_avg"] == 30.0
    assert out[4]["rolling_n"] == 1 and out[4]["rolling_sum"] == 99.0


def test_rolling_aggregate_ties_share_a_frame(spark):
    # value-based frames: equal timestamps see each other regardless of
    # sort-order nondeterminism
    df = spark.createDataFrame(
        [_ev(1, 1, 10, 1.0), _ev(2, 1, 10, 3.0)], _SCHEMA
    )
    out = rolling_aggregate(df, "user_id", "ts", "value", 60).collect()
    assert {r["rolling_n"] for r in out} == {2}
    assert {r["rolling_avg"] for r in out} == {2.0}


def test_rolling_aggregate_rejects_bad_window(spark):
    df = spark.createDataFrame([_ev(1, 1, 0, 1.0)], _SCHEMA)
    with pytest.raises(ValueError):
        rolling_aggregate(df, "user_id", "ts", "value", 0)


def test_zscore_outliers_flags_spike_not_degenerate_frames(spark):
    rows = [_ev(i, 1, i, 10.0) for i in range(1, 10)] + [_ev(10, 1, 10, 500.0)]
    df = spark.createDataFrame(rows, _SCHEMA)
    out = {
        r["event_id"]: r
        for r in zscore_outliers(df, "user_id", "ts", "value", 600, 2.0).collect()
    }
    # first frame has n=1 -> NULL z, never flagged
    assert out[1]["zscore"] is None and out[1]["is_outlier"] is False
    # constant frames (zero variance) -> NULL z, never flagged
    assert out[5]["zscore"] is None and out[5]["is_outlier"] is False
    # the spike is flagged
    assert out[10]["is_outlier"] is True and out[10]["zscore"] > 2.0


def test_transition_matrix_row_normalized(spark):
    from atiesh_spark.operators.timeseries import transition_matrix

    rows = [
        ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "a"), ("u1", 4, "c"),
        ("u2", 1, "a"), ("u2", 2, "b"),
        ("u3", 1, "x"),  # single event: no transitions
    ]
    df = spark.createDataFrame(rows, ["k", "t", "s"])
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["p"])
        for r in transition_matrix(df, "k", "t", "s").collect()
    }
    assert got == {
        ("a", "b"): (2, 0.6667),
        ("a", "c"): (1, 0.3333),
        ("b", "a"): (1, 1.0),
    }


def test_interarrival_stats_known_gaps_and_tie_determinism(spark):
    from atiesh_spark.operators.timeseries import interarrival_stats

    rows = [
        ("u1", "2024-01-01 00:00:00", "g"),
        ("u1", "2024-01-01 00:00:10", "g"),
        ("u1", "2024-01-01 00:00:10", "g"),  # tie: one zero gap
        ("u1", "2024-01-01 00:00:40", "g"),
        ("u2", "2024-01-01 00:00:00", "g"),  # single event: no gap
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, ["k", "ts", "g"]).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    out = interarrival_stats(df, "k", "ts", "g").collect()
    assert len(out) == 1
    r = out[0]
    # gaps multiset {10, 0, 30} regardless of tie permutation
    assert r["n_gaps"] == 3
    assert r["avg_gap_s"] == round((10 + 0 + 30) / 3, 4)
    assert r["p50_gap_s"] == 10.0
    assert r["max_gap_s"] == 30.0


def test_resample_ffill_grid_and_fill(spark):
    """3-tick span with a gap: the gap tick exists with the carried
    value and n_obs=0; values round; grid is per-key bounded."""
    from datetime import datetime

    from atiesh_spark.operators.timeseries import resample_ffill

    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 5), 1.0),
        ("a", datetime(2024, 1, 1, 0, 0, 20), 2.0),   # same 30s bucket as :05
        ("a", datetime(2024, 1, 1, 0, 1, 35), 7.0),   # bucket 90 (gaps at 30, 60)
        ("b", datetime(2024, 1, 1, 0, 0, 10), 5.0),   # single-tick key
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        (r["k"], r["grid_ts"].isoformat()): (r["value"], r["n_obs"])
        for r in resample_ffill(df, "k", "ts", "v", step_seconds=30).collect()
    }
    assert got == {
        ("a", "2024-01-01T00:00:00"): (2.0, 2),   # latest obs in bucket wins
        ("a", "2024-01-01T00:00:30"): (2.0, 0),   # gap tick, carried
        ("a", "2024-01-01T00:01:00"): (2.0, 0),
        ("a", "2024-01-01T00:01:30"): (7.0, 1),
        ("b", "2024-01-01T00:00:00"): (5.0, 1),
    }


def test_resample_ffill_null_values_carry_previous(spark):
    from datetime import datetime

    from atiesh_spark.operators.timeseries import resample_ffill

    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 1), 4.0),
        ("a", datetime(2024, 1, 1, 0, 0, 31), None),  # NULL-only bucket
        ("a", datetime(2024, 1, 1, 0, 1, 1), None),
        ("a", datetime(2024, 1, 1, 0, 1, 2), 6.0),    # same bucket: non-NULL wins
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        r["grid_ts"].isoformat(): (r["value"], r["n_obs"])
        for r in resample_ffill(df, "k", "ts", "v", step_seconds=30).collect()
    }
    assert got == {
        "2024-01-01T00:00:00": (4.0, 1),
        "2024-01-01T00:00:30": (4.0, 1),   # observed but NULL: fill carries
        "2024-01-01T00:01:00": (6.0, 2),
    }


def test_resample_ffill_duplicate_ts_tiebreak_and_validation(spark):
    from datetime import datetime

    import pytest as _pytest

    from atiesh_spark.operators.timeseries import resample_ffill

    rows = [
        ("a", datetime(2024, 1, 1), 1.0),
        ("a", datetime(2024, 1, 1), 9.0),  # same ts: larger value wins
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = resample_ffill(df, "k", "ts", "v", step_seconds=60).collect()
    assert len(out) == 1 and out[0]["value"] == 9.0 and out[0]["n_obs"] == 2
    with _pytest.raises(ValueError):
        resample_ffill(df, "k", "ts", "v", step_seconds=0)
