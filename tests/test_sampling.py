"""Sampling operator tests: split determinism/stability, budget takes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from atiesh_spark.operators.sampling import budgeted_take, deterministic_split


def test_split_is_deterministic_and_stable(spark):
    df = spark.range(1000).select(F.col("id"))
    s1 = {r["id"]: r["split"] for r in
          deterministic_split(df, "id", {"train": 0.9, "val": 0.1}).collect()}
    s2 = {r["id"]: r["split"] for r in
          deterministic_split(df.repartition(7), "id", {"train": 0.9, "val": 0.1}).collect()}
    assert s1 == s2  # partitioning-independent
    # growing the dataset never reshuffles existing assignments
    s3 = {r["id"]: r["split"] for r in
          deterministic_split(spark.range(2000), "id", {"train": 0.9, "val": 0.1}).collect()}
    assert all(s3[k] == v for k, v in s1.items())
    frac = sum(1 for v in s1.values() if v == "train") / len(s1)
    assert 0.85 < frac < 0.95


def test_split_fractions_validated(spark):
    df = spark.range(10)
    with pytest.raises(ValueError, match="must sum to 1"):
        deterministic_split(df, "id", {"train": 0.5, "val": 0.1})


def test_budgeted_take_per_group(spark):
    rows = [("a", i, 10) for i in range(10)] + [("b", i, 100) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, ord int, cost int")
    taken = budgeted_take(df, "g", "cost", budget=35, order_col="ord").collect()
    by_g = {}
    for r in taken:
        by_g.setdefault(r["g"], []).append(r["ord"])
    # group a: rows 0..3 (running-before 0,10,20,30 < 35)
    assert sorted(by_g["a"]) == [0, 1, 2, 3]
    # group b: first row exceeds budget alone but is kept (at least one)
    assert sorted(by_g["b"]) == [0]


def test_mixture_take_per_stratum_budgets(spark):
    from atiesh_spark.operators.sampling import mixture_take

    rows = (
        [("en", i, 10) for i in range(10)]
        + [("fr", i, 10) for i in range(10)]
        + [("xx", i, 10) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "lang string, ord int, cost int")
    taken = mixture_take(
        df, "lang", "cost", budgets={"en": 35, "fr": 15}, order_col="ord"
    ).collect()
    by_lang = {}
    for r in taken:
        by_lang.setdefault(r["lang"], []).append(r["ord"])
    assert sorted(by_lang["en"]) == [0, 1, 2, 3]   # budget 35 -> 4 rows
    assert sorted(by_lang["fr"]) == [0, 1]         # budget 15 -> 2 rows
    assert "xx" not in by_lang                     # default budget 0 -> excluded


def test_mixture_take_default_budget_and_validation(spark):
    from atiesh_spark.operators.sampling import mixture_take

    df = spark.createDataFrame([("aa", 0, 10), ("bb", 0, 10)], "lang string, ord int, cost int")
    got = {r["lang"] for r in
           mixture_take(df, "lang", "cost", budgets={"aa": 5}, order_col="ord",
                        default_budget=5).collect()}
    assert got == {"aa", "bb"}  # default budget admits unlisted strata
    import pytest as _pytest

    with _pytest.raises(ValueError, match="budgets must be >= 0"):
        mixture_take(df, "lang", "cost", budgets={"aa": -1}, order_col="ord")


def test_stratified_sample_rates_and_nesting(spark):
    from atiesh_spark.operators.sampling import stratified_sample

    df = spark.range(4000).selectExpr(
        "id AS doc_id", "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'fr' END AS lang"
    )
    out = stratified_sample(df, "lang", "doc_id", {"en": 0.5, "fr": 0.1})
    by_lang = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert 0.4 < by_lang["en"] / 2000 < 0.6
    assert 0.05 < by_lang["fr"] / 2000 < 0.15

    # nested: the 10% sample is a subset of the 50% sample (same stratum)
    small = {r["doc_id"] for r in
             stratified_sample(df, "lang", "doc_id", {"en": 0.1}).collect()}
    large = {r["doc_id"] for r in
             stratified_sample(df, "lang", "doc_id", {"en": 0.5}).collect()}
    assert small and small <= large

    # unlisted strata follow default_fraction (0 = dropped)
    assert {r["lang"] for r in
            stratified_sample(df, "lang", "doc_id", {"en": 0.5}).collect()} == {"en"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="must be in \\[0, 1\\]"):
        stratified_sample(df, "lang", "doc_id", {"en": 1.5})


def test_stratified_sample_partitioning_independent(spark):
    from atiesh_spark.operators.sampling import stratified_sample

    df = spark.range(1000).selectExpr("id AS doc_id", "'en' AS lang")
    a = {r["doc_id"] for r in
         stratified_sample(df, "lang", "doc_id", {"en": 0.3}).collect()}
    b = {r["doc_id"] for r in
         stratified_sample(df.repartition(11), "lang", "doc_id", {"en": 0.3}).collect()}
    assert a == b


def test_mixture_take_int_strata_keys(spark):
    """Non-string budget keys (int strata values) must work: the map is
    built with stringified keys so the string lookup never depends on
    implicit coercion."""
    from atiesh_spark.operators.sampling import mixture_take

    rows = [(1, i, 10) for i in range(5)] + [(2, i, 10) for i in range(5)]
    df = spark.createDataFrame(rows, "grp int, ord int, cost int")
    taken = mixture_take(df, "grp", "cost", budgets={1: 25, 2: 5}, order_col="ord").collect()
    by_g = {}
    for r in taken:
        by_g.setdefault(r["grp"], []).append(r["ord"])
    assert sorted(by_g[1]) == [0, 1, 2]
    assert sorted(by_g[2]) == [0]


def test_pack_id_is_long(spark):
    """pack_id must stay BIGINT: a 100 TB corpus with few shards makes
    running_sum // budget exceed int32 (an ANSI cast would fail there)."""
    from atiesh_spark.operators.sampling import pack_documents

    df = spark.createDataFrame([(0, 10)], "doc_id long, cost int")
    out = pack_documents(df, "doc_id", "cost", budget=100, shards=1)
    assert dict(out.dtypes)["pack_id"] == "bigint"
    # int32-overflow regression: a doc landing past 2^31 packs still packs
    big = spark.createDataFrame(
        [(0, 2**40), (1, 10)], "doc_id long, cost long"
    )
    got = {r["doc_id"]: r["pack_id"]
           for r in pack_documents(big, "doc_id", "cost", budget=100, shards=1).collect()}
    assert got[1] == 2**40 // 100


def test_pack_documents_greedy_per_shard(spark):
    from atiesh_spark.operators.sampling import pack_documents

    # one shard (shards=1) makes the greedy packing easy to assert
    rows = [(i, 30) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, cost int")
    packed = {r["doc_id"]: r["pack_id"]
              for r in pack_documents(df, "doc_id", "cost", budget=100, shards=1).collect()}
    # cumulative-before: 0,30,60,90 -> pack 0; 120.. -> pack 1; etc.
    assert packed == {0: 0, 1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1, 7: 2, 8: 2, 9: 2}

    # oversized doc still gets a pack (starts where it lands)
    big = spark.createDataFrame([(0, 500), (1, 10)], "doc_id long, cost int")
    got = {r["doc_id"]: r["pack_id"]
           for r in pack_documents(big, "doc_id", "cost", budget=100, shards=1).collect()}
    assert got[0] == 0 and got[1] == 5  # cumulative-before 500 -> pack 5

    import pytest as _pytest

    with _pytest.raises(ValueError, match="budget must be > 0"):
        pack_documents(df, "doc_id", "cost", budget=0)


def test_pack_documents_matches_python_replay_random_costs(spark):
    """Randomized differential: md5 shard assignment and the per-shard
    greedy running-sum packing (doc belongs to the pack where it
    STARTS) replayed sequentially over 120 docs with random costs,
    oversized docs included — shard and pack_id must match row for
    row."""
    import hashlib
    import random

    from atiesh_spark.operators.sampling import pack_documents

    rng = random.Random(157)
    rows = [(i, rng.choice([5, 17, 30, 99, 250])) for i in range(120)]
    budget, shards = 100, 4

    def shard_of(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % shards

    want = {}
    by_shard: dict[int, list] = {}
    for i, c in rows:
        by_shard.setdefault(shard_of(i), []).append((i, c))
    for s, docs in by_shard.items():
        run = 0
        for i, c in sorted(docs):
            want[i] = (s, run // budget)
            run += c

    df = spark.createDataFrame(rows, "doc_id long, cost int")
    got = {r["doc_id"]: (r["shard"], r["pack_id"])
           for r in pack_documents(df, "doc_id", "cost",
                                   budget=budget, shards=shards).collect()}
    assert got == want


def test_deterministic_split_matches_python_replay(spark):
    """Randomized differential: the md5-bucket split boundaries
    (cumulative rounded cutoffs over 10k buckets) replayed
    sequentially for 300 random keys and three named fractions must
    match every assignment — the exact-boundary arithmetic is where a
    cumulative-rounding bug would silently shift ~0.01% of a corpus."""
    import hashlib

    from atiesh_spark.operators.sampling import deterministic_split

    fractions = {"train": 0.823, "val": 0.1, "test": 0.077}
    keys = [f"doc-{i}" for i in range(300)]

    def replay(key):
        b = int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % 10_000
        cum = 0.0
        for name, frac in fractions.items():
            cum += frac
            if b < int(round(cum * 10_000)):
                return name
        return None

    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {r["key"]: r["split"] for r in
           deterministic_split(df, "key", fractions).collect()}
    assert got == {k: replay(k) for k in keys}


def test_pack_documents_partitioning_independent(spark):
    from atiesh_spark.operators.sampling import pack_documents

    df = spark.range(200).selectExpr("id AS doc_id", "CAST(10 + id % 37 AS INT) AS cost")
    a = {(r["doc_id"]): (r["shard"], r["pack_id"])
         for r in pack_documents(df, "doc_id", "cost", budget=150, shards=8).collect()}
    b = {(r["doc_id"]): (r["shard"], r["pack_id"])
         for r in pack_documents(df.repartition(13), "doc_id", "cost", budget=150, shards=8).collect()}
    assert a == b


def test_global_index_matches_window(spark):
    from atiesh_spark.operators.sampling import global_index

    df = spark.range(1000).selectExpr(
        "id AS doc_id", "CAST(id % 17 AS LONG) AS n_chars"
    ).repartition(7)  # scrambled input partitioning
    got = {r["doc_id"]: r["global_idx"]
           for r in global_index(df, ["n_chars", "doc_id"], num_partitions=5).collect()}
    expect = {
        r["doc_id"]: i
        for i, r in enumerate(
            sorted(df.collect(), key=lambda r: (r["n_chars"], r["doc_id"]))
        )
    }
    assert got == expect


def test_global_index_start_offset_and_empty_partitions(spark):
    from atiesh_spark.operators.sampling import global_index

    # more partitions than rows -> some range partitions are empty
    df = spark.createDataFrame([(3,), (1,), (2,)], "k long")
    rows = global_index(df, "k", start=100, num_partitions=8).collect()
    assert {(r["k"], r["global_idx"]) for r in rows} == {(1, 100), (2, 101), (3, 102)}


def test_global_index_rejects_collisions(spark):
    import pytest as _pytest
    from atiesh_spark.operators.sampling import global_index

    df = spark.createDataFrame([(1, 0)], "k long, global_idx long")
    with _pytest.raises(ValueError, match="collides"):
        global_index(df, "k")
    with _pytest.raises(ValueError, match="non-empty"):
        global_index(df.select("k"), [])


def test_deterministic_shuffle_reproducible_and_seed_sensitive(spark):
    from atiesh_spark.operators.sampling import deterministic_shuffle

    df = spark.range(500).selectExpr("id AS doc_id")
    a = {r["doc_id"]: r["shuffle_idx"]
         for r in deterministic_shuffle(df, "doc_id", seed="epoch-0").collect()}
    b = {r["doc_id"]: r["shuffle_idx"]
         for r in deterministic_shuffle(df.repartition(11), "doc_id", seed="epoch-0").collect()}
    c = {r["doc_id"]: r["shuffle_idx"]
         for r in deterministic_shuffle(df, "doc_id", seed="epoch-1").collect()}
    assert a == b                       # partitioning-independent
    assert sorted(a.values()) == list(range(500))  # a true permutation
    assert a != c                       # different epoch, different order
    assert sorted(c.values()) == list(range(500))


def test_weighted_sample_matches_python_reference(spark):
    """The draw is documented as a pure function of (key, weight) any
    engine can replay — so replay it: -ln((md5_60(key)+1)/2^60)/w
    rounded 6dp, smallest-k with key tiebreak, computed sequentially
    over 80 random rows (duplicate weights, zero/NULL exclusions) and
    compared row-for-row including the emitted sample_key. Also pins
    the nesting property on the same data (k=10 prefix of k=25)."""
    import hashlib
    import math
    import random

    from atiesh_spark.operators.sampling import weighted_sample

    rng = random.Random(106)
    rows = [(f"k{i}", round(rng.choice([0.5, 1.0, 2.0, rng.uniform(0.1, 5)]), 3))
            for i in range(76)]
    rows += [("z0", 0.0), ("zn", -1.0), (None, 2.0), ("dup", 1.0)]

    def es_key(key: str, w: float) -> float:
        h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
        return round(-math.log((h + 1) / float(1 << 60)) / w, 6)

    eligible = [(s, w) for s, w in rows if s is not None and w > 0]
    ranked = sorted(((es_key(s, w), s) for s, w in eligible))

    df = spark.createDataFrame(rows, "doc string, w double")
    got25 = [(r["sample_key"], r["doc"])
             for r in weighted_sample(df, "doc", "w", 25).collect()]
    assert sorted(got25) == ranked[:25]
    got10 = [(r["sample_key"], r["doc"])
             for r in weighted_sample(df, "doc", "w", 10).collect()]
    assert sorted(got10) == ranked[:10]  # nested prefix


def test_streaming_weighted_sample_equals_batch(spark, tmp_path):
    from atiesh_spark.operators.sampling import StreamingWeightedSample, weighted_sample

    df = spark.createDataFrame(
        [(i, float(i % 11 + 1)) for i in range(300)], ["id", "w"]
    )
    b1 = df.filter("id % 3 = 0")
    b2 = df.filter("id % 3 = 1")
    b3 = df.filter("id % 3 = 2")
    res = StreamingWeightedSample("id", "w", k=25, path=str(tmp_path / "res"))
    res(b1, 0)
    res(b2, 1)
    res(b3, 2)
    expect = [
        (r["id"], r["sample_key"])
        for r in weighted_sample(df, "id", "w", k=25).collect()
    ]
    got = sorted(
        ((r["id"], r["sample_key"]) for r in res.read(spark).collect()),
        key=lambda t: (t[1], t[0]),
    )
    assert got == expect

    # replay converges
    res(b3, 2)
    got2 = sorted(
        ((r["id"], r["sample_key"]) for r in res.read(spark).collect()),
        key=lambda t: (t[1], t[0]),
    )
    assert got2 == expect


def test_weighted_sample_per_group_matches_per_group_global(spark, tmp_path):
    from atiesh_spark.operators.sampling import weighted_sample, weighted_sample_per_group

    rows = [(i, f"g{i % 3}", float(i % 5 + 1)) for i in range(120)]
    df = spark.createDataFrame(rows, ["id", "g", "w"])
    got = {
        g: sorted((r["id"], r["sample_key"]) for r in rws)
        for g, rws in __import__("itertools").groupby(
            sorted(
                weighted_sample_per_group(df, "g", "id", "w", k=7).collect(),
                key=lambda r: r["g"],
            ),
            key=lambda r: r["g"],
        )
    }
    for g in ("g0", "g1", "g2"):
        expect = sorted(
            (r["id"], r["sample_key"])
            for r in weighted_sample(df.filter(F.col("g") == g), "id", "w", k=7).collect()
        )
        assert got[g] == expect, g


def test_weighted_sample_per_group_small_groups_and_validation(spark):
    import pytest

    from atiesh_spark.operators.sampling import weighted_sample_per_group

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 0.0), (3, "b", 2.0)], ["id", "g", "w"]
    )
    out = weighted_sample_per_group(df, "g", "id", "w", k=10).collect()
    # zero-weight row excluded; small groups kept whole
    assert sorted(r["id"] for r in out) == [1, 3]
    with pytest.raises(ValueError):
        weighted_sample_per_group(df, "g", "id", "w", k=0)


def test_balanced_shards_matches_serpentine_reference(spark):
    import random

    from atiesh_spark.operators.sampling import balanced_shards

    rng = random.Random(17)
    rows = [(i, rng.randrange(1, 5000)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_bytes long")
    S = 7
    got = {
        r["doc_id"]: r["shard"]
        for r in balanced_shards(df, "n_bytes", S, "doc_id").collect()
    }
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    for r, (doc_id, _) in enumerate(order):
        block, pos = divmod(r, S)
        want = pos if block % 2 == 0 else S - 1 - pos
        assert got[doc_id] == want, doc_id


def test_balanced_shards_balance_bound(spark):
    import random

    from atiesh_spark.operators.sampling import balanced_shards, shard_report

    rng = random.Random(23)
    # heavy-tailed: a few huge docs + many small ones
    rows = [(i, int(rng.paretovariate(1.5) * 100)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_bytes long")
    sharded = balanced_shards(df, "n_bytes", 8, "doc_id")
    rep = shard_report(sharded, "n_bytes").collect()
    assert len(rep) == 8
    assert sum(r["n_rows"] for r in rep) == 500
    totals = [r["total_weight"] for r in rep]
    max_item = max(w for _, w in rows)
    # serpentine on weight-desc order: spread stays within ~2 max items
    assert max(totals) - min(totals) <= 2 * max_item


def test_balanced_shards_validation(spark):
    import pytest

    from atiesh_spark.operators.sampling import balanced_shards

    df = spark.createDataFrame([(1, 10)], "doc_id long, n_bytes long")
    with pytest.raises(ValueError):
        balanced_shards(df, "n_bytes", 0, "doc_id")
    with pytest.raises(ValueError, match="collides"):
        balanced_shards(
            df.withColumnRenamed("n_bytes", "shard"), "shard", 2, "doc_id"
        )


def test_balanced_shards_rejects_reserved_column(spark):
    import pytest

    from atiesh_spark.operators.sampling import balanced_shards

    df = spark.createDataFrame(
        [(1, 10, 0.0)], "doc_id long, n_bytes long, __negw double"
    )
    with pytest.raises(ValueError, match="__negw"):
        balanced_shards(df, "n_bytes", 2, "doc_id")


# ------------------------------------------------------ leakage-safe split

def test_leakage_safe_split_keeps_duplicates_together(spark):
    from atiesh_spark.operators.sampling import (
        deterministic_split,
        leakage_safe_split,
    )

    rows = [(i, f"text-{i % 20}") for i in range(200)]  # 10 copies each
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(
        df, "doc_id", {"train": 0.5, "val": 0.5}, text_col="text"
    ).collect()
    by_text = {}
    for r in out:
        by_text.setdefault(r["text"], set()).add(r["split"])
        assert r["cluster_rep"] == int(r["text"].split("-")[1])
    assert all(len(s) == 1 for s in by_text.values())
    # the naive id split DOES leak on this data (sanity that the
    # guard is doing something)
    naive = deterministic_split(
        df, "doc_id", {"train": 0.5, "val": 0.5}
    ).collect()
    naive_by_text = {}
    for r in naive:
        naive_by_text.setdefault(r["text"], set()).add(r["split"])
    assert any(len(s) > 1 for s in naive_by_text.values())


def test_leakage_safe_split_with_cluster_frame(spark):
    from atiesh_spark.operators.sampling import leakage_safe_split

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "doc_id long, text string"
    )
    clusters = spark.createDataFrame(
        [(1, 0), (2, 0), (5, 4)], "doc_id long, cluster_rep long"
    )
    out = {
        r["doc_id"]: r
        for r in leakage_safe_split(
            df, "doc_id", {"train": 0.8, "val": 0.2}, clusters=clusters
        ).collect()
    }
    assert out[1]["split"] == out[2]["split"] == out[0]["split"]
    assert out[5]["split"] == out[4]["split"]
    # unmapped rows are their own rep
    assert out[7]["cluster_rep"] == 7


def test_leakage_safe_split_validates_args(spark):
    import pytest as _pt

    from atiesh_spark.operators.sampling import leakage_safe_split

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pt.raises(ValueError, match="exactly one"):
        leakage_safe_split(df, "doc_id", {"train": 1.0})
    with _pt.raises(ValueError, match="collide"):
        leakage_safe_split(
            df.withColumn("split", F.lit("x")),
            "doc_id",
            {"train": 1.0},
            text_col="text",
        )


def test_leakage_safe_split_keeps_null_text_rows(spark):
    # md5(NULL) is NULL and a NULL key never equi-joins: before the
    # round-6 fix NULL-text docs vanished from the split entirely.
    from atiesh_spark.operators.sampling import leakage_safe_split

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, "other")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in leakage_safe_split(
            df, "doc_id", {"train": 0.5, "val": 0.5}, text_col="text"
        ).collect()
    }
    # no row lost
    assert sorted(out) == [1, 2, 3, 4, 5]
    # NULL-text rows are singleton clusters: each is its own rep
    assert out[3]["cluster_rep"] == 3
    assert out[4]["cluster_rep"] == 4
    # duplicate cluster still moves as one unit
    assert out[1]["cluster_rep"] == out[2]["cluster_rep"] == 1
    assert out[1]["split"] == out[2]["split"]


def test_balanced_shards_uses_integer_division_for_parity(spark):
    # The serpentine block parity must be computed with integer 'div',
    # never a double quotient cast back to long (exact-integer doubles
    # flip boundary parities at very large ranks).
    from atiesh_spark.operators.sampling import balanced_shards

    df = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, n_bytes long")
    plan = balanced_shards(df, "n_bytes", 7, "doc_id")._jdf.queryExecution().analyzed().toString()
    assert "cast(__r as double)" not in plan.lower()


def test_materialize_mixture_counts_and_monotonicity(spark):
    from atiesh_spark.operators.sampling import materialize_mixture

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(1000)],
        "doc_id long, lang string",
    )
    out = materialize_mixture(df, "lang", "doc_id", {"en": 2.3, "fr": 0.5})
    counts = {
        (r["lang"], r["epoch_copy"]): r["count"]
        for r in out.groupBy("lang", "epoch_copy").count().collect()
    }
    assert counts[("en", 0)] == 500 and counts[("en", 1)] == 500
    assert 100 <= counts[("en", 2)] <= 200          # ~30% of 500
    assert 200 <= counts[("fr", 0)] <= 300          # ~50% of 500
    assert ("fr", 1) not in counts
    # raising epochs only ADDS pairs
    a = {(r["doc_id"], r["epoch_copy"]) for r in out.collect()}
    more = materialize_mixture(df, "lang", "doc_id", {"en": 2.8, "fr": 0.9})
    b = {(r["doc_id"], r["epoch_copy"]) for r in more.collect()}
    assert a <= b
    # default epoch is one clean copy
    other = materialize_mixture(df, "lang", "doc_id", {"zz": 3.0})
    assert other.count() == 1000
    import pytest as _pt

    with _pt.raises(ValueError):
        materialize_mixture(df, "lang", "doc_id", {"en": 0.0})


def test_pack_with_offsets_layout(spark):
    from atiesh_spark.operators.sampling import pack_with_offsets

    df = spark.createDataFrame(
        [(i, 10) for i in range(20)], "doc_id long, cost long"
    )
    out = pack_with_offsets(df, "doc_id", "cost", budget=25, shards=1)
    rows = sorted(
        (r["pack_id"], r["seq_index"], r["doc_id"], r["start_offset"], r["end_offset"])
        for r in out.collect()
    )
    # budget 25, cost 10: packs of 3 docs (third straddles, overflow rule)
    by_pack: dict = {}
    for pack, seq, doc, s, e in rows:
        by_pack.setdefault(pack, []).append((seq, doc, s, e))
    for pack, docs in by_pack.items():
        assert [d[0] for d in docs] == list(range(len(docs)))  # seq_index dense
        off = 0
        for seq, doc, s, e in docs:
            assert s == off and e == off + 10  # contiguous spans
            off = e
    # offsets restart at every pack
    assert all(docs[0][2] == 0 for docs in by_pack.values())


class TestExcessLossWeights:
    def test_hand_computed(self, spark):
        import math

        from atiesh_spark.operators.sampling import excess_loss_weights

        # two domains, equal sizes: mean bits = 5; only 'hard' (6 bits)
        # has excess 1; weights = share*exp(excess) normalized.
        pg = spark.createDataFrame(
            [("easy", 10, 4.0), ("hard", 10, 6.0)],
            "dom string, n bigint, bits double",
        )
        out = {r["dom"]: r for r in excess_loss_weights(
            pg, "dom", "n", "bits", eta=1.0).collect()}
        assert out["easy"]["excess"] == 0.0
        assert out["hard"]["excess"] == 1.0
        raw_e, raw_h = 0.5 * 1.0, 0.5 * math.exp(1.0)
        z = raw_e + raw_h
        assert out["easy"]["weight"] == round(raw_e / z, 4)
        assert out["hard"]["weight"] == round(raw_h / z, 4)

    def test_weights_sum_to_one_and_uniform_when_equal(self, spark):
        from atiesh_spark.operators.sampling import excess_loss_weights

        pg = spark.createDataFrame(
            [("a", 30, 5.0), ("b", 10, 5.0), ("c", 60, 5.0)],
            "dom string, n bigint, bits double",
        )
        rows = excess_loss_weights(pg, "dom", "n", "bits").collect()
        # equal losses: zero excess everywhere -> weights = natural
        # shares
        got = {r["dom"]: r["weight"] for r in rows}
        assert got == {"a": 0.3, "b": 0.1, "c": 0.6}
        assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-6

    def test_size_weighted_corpus_mean(self, spark):
        from atiesh_spark.operators.sampling import excess_loss_weights

        # corpus mean is SIZE-weighted: (90*1 + 10*11)/100 = 2, so the
        # big easy domain sits below the mean and the small hard one
        # carries excess 9.
        pg = spark.createDataFrame(
            [("big", 90, 1.0), ("small", 10, 11.0)],
            "dom string, n bigint, bits double",
        )
        out = {r["dom"]: r for r in excess_loss_weights(
            pg, "dom", "n", "bits").collect()}
        assert out["big"]["excess"] == 0.0
        assert out["small"]["excess"] == 9.0


class TestMixtureTakeRangeParallel:
    """Path-equality pin: the range-parallel two-pass mixture_take must
    match the one-window restatement (_cumulative_take_window) row for
    row — the same digest-vs-distributed pin the Bradley-Terry MM has."""

    @staticmethod
    def _key(r):
        return tuple((c, r[c]) for c in sorted(r.asDict()))

    def _assert_paths_equal(self, df, strata, cost, budgets, order, default):
        from atiesh_spark.operators.sampling import (
            _cumulative_take_window,
            mixture_take,
        )

        fast = mixture_take(
            df, strata, cost, budgets, order, default_budget=default
        ).collect()
        ref = _cumulative_take_window(
            df, strata, cost, budgets, order, default_budget=default
        ).collect()
        assert sorted(map(self._key, fast), key=repr) == sorted(
            map(self._key, ref), key=repr
        )
        return fast

    def test_randomized_skewed_with_nulls(self, spark):
        import random

        rng = random.Random(12)
        langs = ["en"] * 60 + ["fr"] * 20 + ["zh"] * 10 + ["de", "ja", None]
        rows = []
        for i in range(2000):
            lang = rng.choice(langs)
            cost = None if rng.random() < 0.05 else rng.randint(1, 400)
            rows.append((lang, i, cost))
        df = spark.createDataFrame(
            rows, "lang string, doc_id int, cost int"
        ).repartition(13)
        for budgets, default in [
            ({"en": 5000, "fr": 800, "zh": 1}, 0),
            ({}, 3000),
            ({"en": 0}, 500),
        ]:
            self._assert_paths_equal(df, "lang", "cost", budgets, "doc_id", default)

    def test_null_order_and_null_stratum_groups(self, spark):
        # NULL order sorts first (taken first); NULL stratum is its own
        # group under the default budget; NULL cost rows are dropped but
        # never consume budget.
        rows = [
            ("a", None, 30), ("a", 1, 30), ("a", 2, 30),
            (None, 1, 10), (None, 2, 10), (None, 3, 100),
            ("b", 1, None), ("b", 2, 5),
        ]
        df = spark.createDataFrame(rows, "g string, ord int, cost int")
        fast = self._assert_paths_equal(df, "g", "cost", {}, "ord", 40)
        got = {(r["g"], r["ord"]) for r in fast}
        assert got == {
            (None, 1), (None, 2), (None, 3),
            ("a", None), ("a", 1),
            ("b", 2),
        }

    def test_dominant_group_spans_many_partitions(self, spark):
        # one group >> num_partitions rows: the per-stratum prefix must
        # chain offsets across every partition it spans
        rows = [("en", i, 1) for i in range(5000)] + [("fr", i, 1000) for i in range(3)]
        df = spark.createDataFrame(rows, "lang string, doc_id int, cost int")
        from atiesh_spark.operators.sampling import mixture_take

        out = mixture_take(
            df, "lang", "cost", {"en": 3777, "fr": 1500}, "doc_id",
            num_partitions=16,
        ).collect()
        en = sorted(r["doc_id"] for r in out if r["lang"] == "en")
        fr = sorted(r["doc_id"] for r in out if r["lang"] == "fr")
        assert en == list(range(3777))
        assert fr == [0, 1]  # row 0 (1000) then row 1 crosses 1500

    def test_no_per_group_window_in_plan(self, spark):
        from atiesh_spark.operators.sampling import budgeted_take

        df = spark.createDataFrame(
            [("a", 1, 5)], "g string, ord int, cost int"
        )
        plan = budgeted_take(
            df, "g", "cost", budget=10, order_col="ord"
        )._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan

    def test_reserved_columns_rejected(self, spark):
        from atiesh_spark.operators.sampling import mixture_take

        df = spark.createDataFrame([("a", 1, 5, 0)],
                                   "g string, ord int, cost int, __pid int")
        with pytest.raises(ValueError, match="__pid"):
            mixture_take(df, "g", "cost", {}, "ord", default_budget=10)

    def test_negative_costs_fall_back_to_general_path(self, spark):
        # negative costs break the prefix property (the window semantics
        # re-admit later rows); the general per-row path must still
        # match the one-window restatement exactly
        import random

        rng = random.Random(7)
        rows = [
            (rng.choice(["a", "b", "c"]), i,
             None if rng.random() < 0.1 else rng.randint(-50, 100))
            for i in range(600)
        ]
        df = spark.createDataFrame(rows, "g string, ord int, cost int")
        self._assert_paths_equal(df, "g", "cost", {"a": 300}, "ord", 500)


class TestMixtureTakeNaN:
    """ADVICE r12: NaN cost must POISON the stratum's running sum from
    the NaN row onward (matching SUM() OVER), independent of where the
    partition boundaries fall — while NULL cost contributes 0 and drops
    only its own row. NaN STRATUM values are rejected loudly."""

    def test_nan_cost_poisons_rest_of_stratum(self, spark):
        import math

        nan = float("nan")
        rows = [
            # stratum a: keep ord 1 only — NaN at ord 2 poisons 3..6
            ("a", 1, 10.0), ("a", 2, nan), ("a", 3, 10.0),
            ("a", 4, 10.0), ("a", 5, None), ("a", 6, 10.0),
            # stratum b: NULL first (dropped, free), then kept rows,
            # then NaN poisons the tail
            ("b", 1, None), ("b", 2, 5.0), ("b", 3, 5.0),
            ("b", 4, nan), ("b", 5, 5.0),
            # stratum c: untouched by NaN, normal cumulative take
            ("c", 1, 60.0), ("c", 2, 60.0), ("c", 3, 60.0),
        ]
        df = spark.createDataFrame(rows, "g string, ord int, cost double")
        from atiesh_spark.operators.sampling import mixture_take

        for n_parts in (1, 3, 16):
            out = mixture_take(
                df, "g", "cost", {}, "ord", default_budget=100,
                num_partitions=n_parts,
            ).collect()
            got = sorted((r["g"], r["ord"]) for r in out)
            assert got == [
                ("a", 1), ("b", 2), ("b", 3), ("c", 1), ("c", 2),
            ], f"num_partitions={n_parts}: {got}"
            assert not any(
                r["cost"] is None or math.isnan(r["cost"]) for r in out
            )

    def test_randomized_nan_costs_match_window(self, spark):
        import random

        rng = random.Random(29)
        rows = []
        for i in range(800):
            g = rng.choice(["a"] * 6 + ["b", "c"])
            r = rng.random()
            if r < 0.03:
                cost = float("nan")
            elif r < 0.10:
                cost = None
            else:
                cost = float(rng.randint(1, 80))
            rows.append((g, i, cost))
        df = spark.createDataFrame(
            rows, "g string, ord int, cost double"
        ).repartition(11)
        t = TestMixtureTakeRangeParallel()
        t._assert_paths_equal(df, "g", "cost", {"a": 900}, "ord", 400)

    def test_nan_stratum_rejected(self, spark):
        rows = [(1.0, 1, 5), (float("nan"), 2, 5), (None, 3, 5)]
        df = spark.createDataFrame(rows, "g double, ord int, cost int")
        from atiesh_spark.operators.sampling import mixture_take

        with pytest.raises(ValueError, match="NaN strat"):
            mixture_take(df, "g", "cost", {}, "ord", default_budget=10)

    def test_task_pid_invariant_check(self):
        import pandas as pd

        from atiesh_spark.operators.sampling import _task_pid

        ok = pd.DataFrame({"__pid": [3, 3, 3]})
        assert _task_pid(ok, None) == 3
        assert _task_pid(ok, 3) == 3
        mixed = pd.DataFrame({"__pid": [3, 3, 4]})
        with pytest.raises(RuntimeError, match="invariant"):
            _task_pid(mixed, None)
        with pytest.raises(RuntimeError, match="invariant"):
            _task_pid(ok, 2)

    def test_nan_gate_single_authority(self, spark):
        """r14 (ADVICE): both NaN paths (mixture_take's monotone probe
        and _general_take_joinback's NULL/NaN flag) gate on the one
        _nan_capable helper — float/double flag via isnan, every other
        numeric gets an exact literal False."""
        from pyspark.sql.types import (
            DecimalType, DoubleType, FloatType, IntegerType, LongType,
        )

        from atiesh_spark.operators.sampling import (
            _cost_nan_flag, _nan_capable,
        )

        assert _nan_capable(DoubleType()) and _nan_capable(FloatType())
        assert not _nan_capable(LongType())
        assert not _nan_capable(IntegerType())
        assert not _nan_capable(DecimalType(10, 2))

        df = spark.createDataFrame(
            [(1.0, 1)], "c_double double, c_int int"
        )
        assert "isnan" in str(_cost_nan_flag(df, "c_double")).lower()
        assert "false" in str(_cost_nan_flag(df, "c_int")).lower()
