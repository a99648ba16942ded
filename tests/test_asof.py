"""As-of join semantics: inclusive boundary, direction, no-match NULLs,
atomic right-row fill, collision suffixing."""

from __future__ import annotations

import pytest

from atiesh_spark.operators.asof import asof_join


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (1, 5, "z"), (2, 7, "c")],
        "uid long, t long, ev string",
    )
    right = spark.createDataFrame(
        [(1, 10, "m1", 100), (1, 20, "m2", 200), (2, 50, "m3", 300)],
        "uid long, t long, m string, score long",
    )
    return left, right


def test_backward_inclusive_and_null_on_no_match(sides):
    left, right = sides
    out = {r["ev"]: (r["m"], r["score"]) for r in
           asof_join(left, right, on="t", by="uid").collect()}
    assert out["a"] == ("m1", 100)   # equal timestamp matches (inclusive)
    assert out["b"] == ("m2", 200)   # latest at-or-before 25
    assert out["z"] == (None, None)  # before any marker
    assert out["c"] == (None, None)  # marker only at t=50 > 7


def test_forward_direction(sides):
    left, right = sides
    out = {r["ev"]: r["m"] for r in
           asof_join(left, right, on="t", by="uid", direction="forward").collect()}
    assert out["a"] == "m1"   # inclusive at equal t
    assert out["b"] is None   # nothing at-or-after 25 for uid 1
    assert out["z"] == "m1"
    assert out["c"] == "m3"


def test_atomic_right_row_fill(spark):
    """A NULL attribute inside the matched right row must stay NULL —
    never backfilled per-column from an older right row."""
    left = spark.createDataFrame([(1, 30, "x")], "uid long, t long, ev string")
    right = spark.createDataFrame(
        [(1, 10, "old", 1), (1, 20, None, None)],
        "uid long, t long, m string, score long",
    )
    row = asof_join(left, right, on="t", by="uid").collect()[0]
    assert row["m"] is None and row["score"] is None  # the t=20 row, intact


def test_collision_suffix_and_validation(spark, sides):
    left, right = sides
    right2 = right.withColumnRenamed("m", "ev")  # collides with left.ev
    cols = asof_join(left, right2, on="t", by="uid").columns
    assert "ev" in cols and "ev_r" in cols

    with pytest.raises(ValueError, match="direction must be"):
        asof_join(left, right, on="t", by="uid", direction="nearest")
    with pytest.raises(ValueError, match="no value columns"):
        asof_join(left, right.select("uid", "t"), on="t", by="uid")


def test_range_join_bins_and_boundaries(spark):
    from atiesh_spark.operators.asof import range_join

    pts = spark.createDataFrame(
        [(1, 0, "p0"), (1, 100, "p1"), (1, 250, "p2"), (1, 251, "p3"), (2, 100, "p4")],
        "uid long, t long, tag string",
    )
    iv = spark.createDataFrame(
        [(1, 50, 250, "w1"), (2, 0, 99, "w2")],
        "uid long, lo long, hi long, w string",
    )
    out = {(r["tag"], r["w"]) for r in
           range_join(pts, iv, on="t", by="uid", start_col="lo", end_col="hi",
                      bin_size=64).collect()}
    # closed interval: 100 and 250 match w1; 0 and 251 don't; uid 2's
    # point at 100 is outside [0, 99]
    assert out == {("p1", "w1"), ("p2", "w1")}

    # a pair is emitted exactly once even when the interval spans many bins
    rows = range_join(pts, iv, on="t", by="uid", start_col="lo", end_col="hi",
                      bin_size=8).collect()
    assert len(rows) == len({(r["tag"], r["w"]) for r in rows}) == 2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="bin_size must be > 0"):
        range_join(pts, iv, on="t", by="uid", start_col="lo", end_col="hi", bin_size=0)


def test_null_on_and_null_key_never_match(spark):
    """SQL semantics: NULL timestamps and NULL keys match nothing —
    in either direction."""
    left = spark.createDataFrame(
        [(1, 5, "early"), (1, None, "no_ts"), (None, 7, "no_key")],
        "uid long, t long, ev string",
    )
    right = spark.createDataFrame(
        [(1, None, "null_ts"), (1, 100, "m"), (None, 3, "null_key")],
        "uid long, t long, m string",
    )
    back = {r["ev"]: r["m"] for r in asof_join(left, right, on="t", by="uid").collect()}
    assert back == {"early": None, "no_ts": None, "no_key": None}
    fwd = {r["ev"]: r["m"] for r in
           asof_join(left, right, on="t", by="uid", direction="forward").collect()}
    assert fwd == {"early": "m", "no_ts": None, "no_key": None}


def test_suffix_collision_rejected(spark):
    left = spark.createDataFrame([(1, 10, "a", "b")], "uid long, t long, m string, m_r string")
    right = spark.createDataFrame([(1, 5, "x")], "uid long, t long, m string")
    with pytest.raises(ValueError, match="cannot suffix"):
        asof_join(left, right, on="t", by="uid")

    from atiesh_spark.operators.asof import range_join

    left2 = spark.createDataFrame([(1, 10, 0, 0)], "uid long, t long, lo long, lo_r long")
    iv = spark.createDataFrame([(1, 0, 20)], "uid long, lo long, hi long")
    with pytest.raises(ValueError, match="cannot suffix"):
        range_join(left2, iv, on="t", by="uid", start_col="lo", end_col="hi", bin_size=8)


def test_reserved_internal_names_rejected(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="collide with this join's internal"):
        asof_join(left.withColumnRenamed("ev", "__side"), right, on="t", by="uid")
    with pytest.raises(ValueError, match="collide with this join's internal"):
        asof_join(left, right.withColumnRenamed("m", "__rrow"), on="t", by="uid")

    from atiesh_spark.operators.asof import range_join

    pts = spark.createDataFrame([(1, 10, "p")], "uid long, t long, __bin string")
    iv = spark.createDataFrame([(1, 0, 20)], "uid long, lo long, hi long")
    with pytest.raises(ValueError, match="collide with this join's internal"):
        range_join(pts, iv, on="t", by="uid", start_col="lo", end_col="hi", bin_size=8)


def test_single_key_correct_despite_skew(spark):
    """One global `by` key serializes the window onto one task — a
    documented scale hazard, but the ANSWER must stay exact. 1k left
    rows against 100 right markers, all under a single key, across a
    multi-partition layout."""
    left = spark.range(1000).selectExpr(
        "CAST(1 AS LONG) AS uid", "id * 3 AS t", "CAST(id AS STRING) AS ev"
    ).repartition(16)
    right = spark.range(100).selectExpr(
        "CAST(1 AS LONG) AS uid", "id * 31 AS t", "concat('m', id) AS m"
    ).repartition(16)
    out = {int(r["ev"]): r["m"] for r in
           asof_join(left, right, on="t", by="uid").collect()}
    assert len(out) == 1000
    for i in (0, 1, 500, 999):
        expect = (i * 3) // 31  # latest marker at-or-before i*3
        assert out[i] == f"m{expect}", i


def test_inverted_interval_matches_nothing_cheaply(spark):
    from atiesh_spark.operators.asof import range_join

    pts = spark.createDataFrame([(1, 10, "p")], "uid long, t long, tag string")
    iv = spark.createDataFrame(
        [(1, 1_000_000, 0, "bad"), (1, 5, 15, "good")],
        "uid long, lo long, hi long, w string",
    )
    out = range_join(pts, iv, on="t", by="uid", start_col="lo", end_col="hi",
                     bin_size=8)
    # the inverted row is dropped BEFORE the explode: no 125k-bin fanout
    assert [r["w"] for r in out.collect()] == ["good"]


def _asof_frames(spark, n_left=400, n_right=60, keys=2):
    left = spark.range(n_left).selectExpr(
        f"CAST(id % {keys} AS LONG) AS uid",
        # gaps + clusters + an exact-equal point; some NULL timestamps
        "CASE WHEN id % 37 = 0 THEN NULL ELSE (id * 13) % 997 END AS t",
        "CAST(id AS STRING) AS ev",
    )
    right = spark.range(n_right).selectExpr(
        f"CAST(id % {keys} AS LONG) AS uid",
        "CASE WHEN id % 29 = 0 THEN NULL ELSE (id * 53) % 997 END AS t",
        "concat('m', id) AS m",
        "CAST(id * 2 AS LONG) AS score",
    ).dropDuplicates(["uid", "t"])  # asof right-side dup-(key,on) is ambiguous
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("bucket_size", [1, 7, 100, 10_000])
def test_bucketed_asof_equals_plain_asof(spark, direction, bucket_size):
    """The bucketed variant is a pure physical rewrite: frame-identical
    to asof_join across directions and bucket sizes (1 row/bin, mid,
    one-bin-holds-everything) — including empty bins the carry must
    cross, NULL timestamps, and NULL keys."""
    from atiesh_spark.operators.asof import asof_join_bucketed

    left, right = _asof_frames(spark)
    left = left.unionByName(
        spark.createDataFrame([(None, 5, "nullkey")], "uid long, t long, ev string")
    )
    plain = asof_join(left, right, on="t", by="uid", direction=direction)
    bucketed = asof_join_bucketed(
        left, right, on="t", by="uid", bucket_size=bucket_size, direction=direction
    )
    from collections import Counter

    assert Counter(map(tuple, plain.collect())) == Counter(map(tuple, bucketed.collect()))
    assert plain.columns == bucketed.columns


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas_merge_asof(spark, direction):
    """Randomized differential against pandas.merge_asof — an
    independent reference implementation of as-of semantics (inclusive
    boundary, per-key, NULL on no match). The fixed-fixture tests
    above pin the documented edge cases; this pins the bulk semantics
    on 200x80 random rows where hand-enumeration can't reach. Right
    (uid, t) pairs are unique so both engines' answers are
    tie-free-identical by construction."""
    import random

    import pandas as pd

    rng = random.Random(20240816)
    left_rows = [
        (rng.randint(1, 6), rng.randint(0, 300), f"e{i}")
        for i in range(200)
    ]
    right_keys = {(rng.randint(1, 6), rng.randint(0, 300))
                  for _ in range(80)}
    right_rows = [(u, t, f"m{u}_{t}", u * 1000 + t)
                  for u, t in sorted(right_keys)]

    left = spark.createDataFrame(left_rows, "uid long, t long, ev string")
    right = spark.createDataFrame(
        right_rows, "uid long, t long, m string, score long"
    )
    got = {
        r["ev"]: (r["m"], r["score"])
        for r in asof_join(left, right, on="t", by="uid",
                           direction=direction).collect()
    }

    lp = pd.DataFrame(left_rows, columns=["uid", "t", "ev"]).sort_values("t")
    rp = pd.DataFrame(
        right_rows, columns=["uid", "t", "m", "score"]
    ).sort_values("t")
    ref = pd.merge_asof(lp, rp, on="t", by="uid", direction=direction)
    want = {
        row.ev: (None if pd.isna(row.m) else row.m,
                 None if pd.isna(row.score) else int(row.score))
        for row in ref.itertuples()
    }
    assert got == want


def test_bucketed_asof_validation(spark, sides):
    from atiesh_spark.operators.asof import asof_join_bucketed

    left, right = sides
    with pytest.raises(ValueError, match="bucket_size"):
        asof_join_bucketed(left, right, on="t", by="uid", bucket_size=0)
    ts_left = left.selectExpr("uid", "CAST('2024-01-01' AS TIMESTAMP_NTZ) AS t", "ev")
    with pytest.raises(ValueError, match="must be numeric"):
        asof_join_bucketed(ts_left, right, on="t", by="uid", bucket_size=10)
