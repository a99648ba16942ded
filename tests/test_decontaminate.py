"""Benchmark decontamination: overlap math, threshold, anti-join."""

from __future__ import annotations

import pytest

from atiesh_spark.operators.decontaminate import contamination_pairs, decontaminate


@pytest.fixture()
def corpus_and_bench(spark):
    # bigrams of "a b c d e": {a b, b c, c d, d e} (4)
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e"),      # 2/4 bigrams in bench doc 100 -> 0.5
            (2, "a b x y z"),      # 1/4 -> 0.25
            (3, "q r s t u"),      # 0 overlap
            (4, "one"),            # <2 tokens: no shingles, never flagged
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a b c z z z"), (101, "nothing shared here at all")],
        "doc_id long, text string",
    )
    return corpus, bench


def test_contamination_pairs_fractions(corpus_and_bench):
    corpus, bench = corpus_and_bench
    pairs = {
        (r["doc_id"], r["bench_id"]): (r["n_shared"], r["overlap_frac"])
        for r in contamination_pairs(corpus, bench, n=2).collect()
    }
    assert pairs[(1, 100)] == (2, 0.5)    # {a b, b c} shared
    assert pairs[(2, 100)] == (1, 0.25)   # {a b}
    assert (3, 100) not in pairs          # zero-overlap pairs not emitted
    assert not any(d == 4 for d, _ in pairs)


def test_decontaminate_threshold_and_columns(corpus_and_bench):
    corpus, bench = corpus_and_bench
    kept = decontaminate(corpus, bench, threshold=0.5, n=2)
    assert set(kept.columns) == set(corpus.columns)  # all columns survive
    assert {r["doc_id"] for r in kept.collect()} == {2, 3, 4}
    # higher threshold keeps everything
    kept_all = decontaminate(corpus, bench, threshold=0.51, n=2)
    assert kept_all.count() == 4
    with pytest.raises(ValueError, match="threshold"):
        decontaminate(corpus, bench, threshold=0.0)


def test_bench_side_broadcast_plan(corpus_and_bench):
    """The benchmark side must broadcast (the corpus is the 100 TB side;
    shuffling it on the shingle to meet a tiny eval set is the failure
    mode this operator exists to avoid)."""
    corpus, bench = corpus_and_bench
    pairs = contamination_pairs(corpus, bench, n=2)
    plan = pairs._sc._jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan


def test_bloom_decontaminate_no_false_negatives(spark):
    from atiesh_spark.operators.decontaminate import decontaminate_bloom

    docs = spark.createDataFrame(
        [
            (1, "the exact benchmark question appears here word word"),
            (2, "totally unrelated content nothing shared at all here"),
            (3, "tiny"),  # < n words: trivially clean, must not vanish
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("the exact benchmark question appears here",)], "text string"
    )
    got = {r["doc_id"]: r for r in decontaminate_bloom(docs, bench, n=3).collect()}
    assert sorted(got) == [1, 2, 3]
    # every truly-shared trigram MUST register (no false negatives)
    assert not got[1]["clean"] and got[1]["n_maybe_hits"] >= 4
    assert got[3]["clean"] and got[3]["n_shingles"] == 0


def test_bloom_positions_mergeable_and_bounded(spark):
    from atiesh_spark.operators.decontaminate import bloom_positions

    a = spark.createDataFrame([("x",), ("y",)], "s string")
    b = spark.createDataFrame([("y",), ("z",)], "s string")
    m, k = 1024, 4
    pa = bloom_positions(a, "s", m, k)
    pb = bloom_positions(b, "s", m, k)
    u = pa.unionByName(pb).distinct()
    both = bloom_positions(a.unionByName(b), "s", m, k)
    assert sorted(r["pos"] for r in u.collect()) == sorted(
        r["pos"] for r in both.collect()
    ), "union-distinct of filters == filter of the union (bitwise OR)"
    assert both.count() <= min(4 * k, m)
    import pytest as _pt

    with _pt.raises(ValueError):
        bloom_positions(a, "s", 0, k)


def test_bloom_positions_match_python_reference(spark):
    """The filter is documented as engine-portable (any engine with
    md5 can rebuild it bit-identically) — so rebuild it in Python:
    Kirsch-Mitzenmacher positions (h1 + i*h2) mod m over 48-bit md5
    halves for random strings, including unicode and a string whose
    md5 half is large enough to stress the long arithmetic."""
    import hashlib
    import random

    from atiesh_spark.operators.decontaminate import bloom_positions

    rng = random.Random(48)
    items = ["".join(rng.choice("abcdé 123") for _ in range(rng.randint(1, 12)))
             for _ in range(60)]
    m, k = 509, 5  # prime m: no power-of-two masking accidents

    def ref_pos(s: str) -> set[int]:
        h = hashlib.md5(s.encode()).hexdigest()
        h1, h2 = int(h[:12], 16), int(h[12:24], 16)
        return {(h1 + i * h2) % m for i in range(k)}

    want = set()
    for s in set(items):
        want |= ref_pos(s)
    df = spark.createDataFrame([(s,) for s in items], "s string")
    got = {r["pos"] for r in bloom_positions(df, "s", m, k).collect()}
    assert got == want


def test_two_stage_equals_one_stage_exact(spark):
    from atiesh_spark.operators.decontaminate import (
        decontaminate,
        decontaminate_two_stage,
    )
    from atiesh_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    two = sorted(
        r["doc_id"]
        for r in decontaminate_two_stage(corpus, bench, n=3).select("doc_id").collect()
    )
    one = sorted(
        r["doc_id"]
        for r in decontaminate(corpus, bench, threshold=0.5, n=3)
        .select("doc_id")
        .collect()
    )
    assert two == one


def test_ngram_novelty_planted_split(spark):
    from atiesh_spark.operators.decontaminate import ngram_novelty

    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [
            # 100% memorized: a verbatim train fragment
            (10, "quick brown fox jumps over"),
            # 100% novel tokens
            (11, "xq1 xq2 xq3 xq4"),
            # half and half: 3 memorized trigrams + boundary + novel
            (12, "the quick brown fox nova1 nova2 nova3"),
            # too short for a trigram
            (13, "just two"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in ngram_novelty(
        evals, train, "doc_id", "text", n=3).collect()}
    assert got[10]["novelty"] == 0.0 and got[10]["n_novel"] == 0
    assert got[11]["novelty"] == 1.0 and got[11]["n_ngrams"] == 2
    r12 = got[12]
    # grams: 2 memorized ('the quick brown','quick brown fox'),
    # 3 boundary/novel -> novelty 3/5
    assert (r12["n_ngrams"], r12["n_novel"]) == (5, 3)
    assert abs(r12["novelty"] - 0.6) < 1e-6
    assert got[13]["n_ngrams"] == 0 and got[13]["novelty"] is None
    import pytest
    with pytest.raises(ValueError):
        ngram_novelty(evals, train, "doc_id", "text", n=0)
