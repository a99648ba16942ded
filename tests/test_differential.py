"""Seeded-random differential tests: the newest operators vs pure-Python
brute-force references on a few hundred random rows (one Spark job per
operator — the repo's property-testing convention, SURVEY §5.2 item 5).

These catch the class of bug the oracle queries cannot: the oracle SQL
is written by the same author with the same mental model, while the
brute-force reference below is an independent O(n^2) restatement of the
semantics.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from atiesh_spark.operators.diffing import snapshot_diff
from atiesh_spark.operators.timeseries import rolling_aggregate

_R = random.Random(42)
_T0 = datetime(2024, 1, 1)


def test_rolling_aggregate_matches_bruteforce(spark):
    rows = [
        (i, _R.randrange(5), _T0 + timedelta(seconds=_R.randrange(0, 400)),
         round(_R.uniform(0, 100), 2))
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double"
    )
    out = {
        r["event_id"]: r
        for r in rolling_aggregate(df, "user_id", "ts", "value", 60).collect()
    }
    for i, k, ts, v in rows:
        frame = [v2 for (_, k2, t2, v2) in rows
                 if k2 == k and ts - timedelta(seconds=60) <= t2 <= ts]
        assert out[i]["rolling_n"] == len(frame), i
        assert abs(out[i]["rolling_sum"] - round(sum(frame), 4)) <= 1e-4, i


def test_snapshot_diff_matches_set_algebra(spark):
    old_rows = {k: (_R.choice("abc"), _R.randrange(5)) for k in range(200)
                if _R.random() < 0.8}
    new_rows = {k: (_R.choice("abc"), _R.randrange(5)) for k in range(200)
                if _R.random() < 0.8}
    old = spark.createDataFrame(
        [(k, s, v) for k, (s, v) in old_rows.items()], "k long, s string, v long"
    )
    new = spark.createDataFrame(
        [(k, s, v) for k, (s, v) in new_rows.items()], "k long, s string, v long"
    )
    out = {r["k"]: r for r in snapshot_diff(old, new, keys=["k"]).collect()}
    assert set(out) == set(old_rows) | set(new_rows)
    for k, r in out.items():
        if k not in old_rows:
            want = "added"
        elif k not in new_rows:
            want = "removed"
        elif old_rows[k] != new_rows[k]:
            want = "changed"
        else:
            want = "unchanged"
        assert r["status"] == want, (k, r, old_rows.get(k), new_rows.get(k))
        if want == "changed":
            diff = [c for c, (a, b) in zip(("s", "v"),
                    zip(old_rows[k], new_rows[k])) if a != b]
            assert r["changed_cols"] == ",".join(sorted(diff)), k


def test_interval_join_matches_bruteforce(spark):
    from atiesh_spark.streaming.joins import interval_join

    lrows = [(i, _R.randrange(8), _T0 + timedelta(seconds=_R.randrange(0, 600)))
             for i in range(150)]
    rrows = [(1000 + i, _R.randrange(8), _T0 + timedelta(seconds=_R.randrange(0, 600)))
             for i in range(150)]
    left = spark.createDataFrame(lrows, "lid long, user_id long, ts timestamp_ntz")
    right = spark.createDataFrame(rrows, "rid long, user_id long, ts timestamp_ntz")
    out = interval_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        watermark="10 minutes", lower="30 seconds", upper="45 seconds",
    ).collect()
    got = sorted((r["lid"], r["rid"]) for r in out)
    want = sorted(
        (li, ri)
        for (li, lk, lt) in lrows
        for (ri, rk, rt) in rrows
        if lk == rk and lt - timedelta(seconds=30) <= rt <= lt + timedelta(seconds=45)
    )
    assert got == want
