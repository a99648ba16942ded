"""Misra-Gries heavy hitters (operators/frequent.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from atiesh_spark.operators.frequent import heavy_hitters, heavy_hitters_report


def test_heavy_hitters_never_overcounts_and_bound(spark):
    # Zipf-ish stream: item i appears 2^(10-i) times, i=0..9
    rows = [(f"it{i}",) for i in range(10) for _ in range(2 ** (10 - i))]
    df = spark.createDataFrame(rows, "item string").repartition(4)
    n = len(rows)
    k = 8
    est = {r["item"]: r["est"] for r in heavy_hitters(df, "item", k=k).collect()}
    exact = {f"it{i}": 2 ** (10 - i) for i in range(10)}
    bound = n // (k + 1)
    for it, e in est.items():
        assert e <= exact[it], f"{it} overcounted"
        assert e >= exact[it] - bound, f"{it} below bound"
    # frequent-items guarantee: everything above n/(k+1) is present
    for it, c in exact.items():
        if c > bound:
            assert it in est, f"{it} (exact {c} > bound {bound}) missing"


def test_heavy_hitters_exact_when_k_covers_all(spark):
    # k >= distinct items: MG never decrements, estimates are exact
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2
    df = spark.createDataFrame(rows, "item string").repartition(2)
    est = {r["item"]: r["est"] for r in heavy_hitters(df, "item", k=10).collect()}
    assert est == {"a": 5, "b": 3, "c": 2}


def test_heavy_hitters_top_and_nulls_and_validation(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [(None,)] * 4 + [("b",)] * 3 + [("c",)] * 1,
        "item string",
    )
    got = heavy_hitters(df, "item", k=10, top=2).collect()
    assert [(r["item"], r["est"]) for r in got] == [("a", 5), ("b", 3)]
    with pytest.raises(ValueError):
        heavy_hitters(df, "item", k=0)


def test_heavy_hitters_report_all_green(spark):
    docs = spark.createDataFrame(
        [(i, "the quick fox " + f"w{i % 7}") for i in range(200)],
        "doc_id long, text string",
    )
    words = docs.select(
        F.explode(F.split("text", r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    row = heavy_hitters_report(words, "word", k=16).collect()[0]
    assert row["all_within_bound"]
    assert row["never_overcounts"]
    assert row["guaranteed_items_present"]
    assert row["n_items"] == 3 + 7
    assert row["error_bound"] == (200 * 4) // 17


def test_streaming_heavy_hitters_bounds_and_cap(spark, tmp_path):
    from atiesh_spark.operators.frequent import StreamingHeavyHitters

    # Zipf stream split into 3 batches + a replay of the last batch
    rows = [(f"it{i}",) for i in range(30) for _ in range(2 ** max(0, 9 - i))]
    df = spark.createDataFrame(rows, "item string")
    k = 8
    hh = StreamingHeavyHitters("item", str(tmp_path / "hh"), k=k)
    import pyspark.sql.functions as F

    batches = [
        df.filter(F.length("item") == 3),            # it0..it9
        df.filter(F.col("item").isin([f"it{i}" for i in range(10, 20)])),
        df.filter(F.col("item").isin([f"it{i}" for i in range(20, 30)])),
    ]
    for i, b in enumerate(batches):
        hh(b, i + 1)
    hh(batches[-1], len(batches))  # replay converges

    store = hh.read(spark).collect()
    assert len(store) <= k, "store must never exceed k rows"
    n_total = store[0]["n_total"]
    assert n_total == len(rows)
    bound = n_total // (k + 1)
    exact = {}
    for (it,) in rows:
        exact[it] = exact.get(it, 0) + 1
    est = {r["item"]: r["est"] for r in store}
    for it, e in est.items():
        assert e <= exact[it], f"{it} overcounts"
        assert e >= exact[it] - bound, f"{it} below bound"
    for it, c in exact.items():
        if c > bound:
            assert it in est, f"{it} (exact {c} > bound {bound}) missing"


def test_streaming_heavy_hitters_survives_full_prune(spark, tmp_path):
    from atiesh_spark.operators.frequent import StreamingHeavyHitters

    hh = StreamingHeavyHitters("item", str(tmp_path / "hh2"), k=2)
    # 3 distinct singletons with k=2: everything prunes away
    b1 = spark.createDataFrame([("a",), ("b",), ("c",)], "item string").coalesce(1)
    hh(b1, 1)
    assert hh.read(spark).count() == 0
    # n_total must survive the empty store for the next merge
    b2 = spark.createDataFrame([("d",)] * 10, "item string")
    hh(b2, 2)
    store = hh.read(spark).collect()
    assert store and store[0]["n_total"] == 13
    assert {r["item"] for r in store} == {"d"}


def test_countmin_never_undercounts_and_eps_bound(spark):
    from atiesh_spark.operators.frequent import (
        countmin_estimate,
        countmin_sketch,
    )

    rows = [(f"k{i % 37}",) for i in range(3000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "key string")
    n = df.count()
    d, w = 4, 64
    sketch = countmin_sketch(df, "key", depth=d, width=w)
    # sketch is summary-sized and each hash row conserves mass
    per_row = {
        r["r"]: r["s"]
        for r in sketch.groupBy("r").agg(F.sum("cnt").alias("s")).collect()
    }
    assert per_row == {r: n for r in range(d)}
    assert sketch.count() <= d * w

    exact = {r["key"]: r["c"] for r in
             df.groupBy("key").agg(F.count(F.lit(1)).alias("c")).collect()}
    keys = df.select("key").distinct()
    est = {r["key"]: r["est"]
           for r in countmin_estimate(sketch, keys, "key", d, w).collect()}
    eps_n = (2.718281828 / w) * n  # e/w * n, the classic bound
    for k, ex in exact.items():
        assert est[k] >= ex, f"{k}: undercount {est[k]} < {ex}"
        assert est[k] <= ex + eps_n


def test_countmin_absent_key_estimates_bounded_and_nulls_ignored(spark):
    from atiesh_spark.operators.frequent import (
        countmin_estimate,
        countmin_sketch,
    )

    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,)], "key string"
    )
    sketch = countmin_sketch(df, "key", depth=4, width=32)
    assert sketch.agg(F.sum("cnt")).collect()[0][0] == 3 * 4  # NULL dropped
    probe = spark.createDataFrame([("zzz",), ("a",)], "key string")
    est = {r["key"]: r["est"]
           for r in countmin_estimate(sketch, probe, "key", 4, 32).collect()}
    assert est["a"] >= 2
    assert 0 <= est["zzz"] <= 3  # absent key: only collision mass

    with pytest.raises(ValueError):
        countmin_sketch(df, "key", depth=0, width=32)


def test_countmin_sketch_is_mergeable(spark):
    """Building the sketch on a union == summing the two sketches
    cell-wise: the monoid property that makes CMS shard-safe."""
    from atiesh_spark.operators.frequent import countmin_sketch

    a = spark.createDataFrame([(f"x{i % 5}",) for i in range(100)], "key string")
    b = spark.createDataFrame([(f"x{i % 7}",) for i in range(80)], "key string")
    merged = (
        countmin_sketch(a, "key", 4, 32)
        .unionByName(countmin_sketch(b, "key", 4, 32))
        .groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    direct = countmin_sketch(a.unionByName(b), "key", 4, 32)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_countmin_estimate_validates_build_params(spark):
    """A (depth, width) that differs from the sketch's build params
    re-derives DIFFERENT buckets and silently estimates wrong (often
    0); countmin_estimate now checks the sketch relation itself and
    raises instead."""
    from atiesh_spark.operators.frequent import (
        countmin_estimate,
        countmin_sketch,
    )

    df = spark.createDataFrame(
        [(f"k{i % 10}",) for i in range(200)], "key string"
    )
    sketch = countmin_sketch(df, "key", depth=4, width=32)
    probe = spark.createDataFrame([("k0",)], "key string")

    with pytest.raises(ValueError, match="different depth"):
        countmin_estimate(sketch, probe, "key", depth=6, width=32).collect()
    with pytest.raises(ValueError, match="different width"):
        countmin_estimate(sketch, probe, "key", depth=4, width=16).collect()
    # matching params estimate normally; validate=False skips the probe
    est = countmin_estimate(sketch, probe, "key", 4, 32).collect()
    assert est[0]["est"] >= 20
    est2 = countmin_estimate(
        sketch, probe, "key", 4, 32, validate=False
    ).collect()
    assert est2[0]["est"] == est[0]["est"]
    # an EMPTY sketch carries no build evidence: every key is 0, no raise
    empty = countmin_sketch(
        spark.createDataFrame([], "key string"), "key", 4, 32
    )
    assert countmin_estimate(empty, probe, "key", 9, 99).collect()[0][
        "est"
    ] == 0
