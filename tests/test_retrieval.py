"""BM25 retrieval tests: differential against a pure-Python scorer on a
hand-built corpus, contract checks (term dedup, empty query, k cap),
and a plan-shape guard (the tf shuffle is query-filtered; ranking is
TakeOrderedAndProject, never a global sort)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from atiesh_spark.operators.retrieval import bm25_topk


def _py_bm25(texts, terms, k1=1.2, b=0.75):
    toks = [[w for w in re.split(r"\s+", t) if w] for t in texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    tfs = [Counter(t) for t in toks]
    df = Counter()
    for tf in tfs:
        for term in set(terms):
            if tf[term]:
                df[term] += 1
    scores = {}
    for i, tf in enumerate(tfs):
        s, hit = 0.0, 0
        for term in set(terms):
            if not tf[term]:
                continue
            hit += 1
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            s += (
                idf
                * tf[term]
                * (k1 + 1)
                / (tf[term] + k1 * (1 - b + b * len(toks[i]) / avgdl))
            )
        if hit:
            scores[i] = (hit, s)
    return scores


CORPUS = [
    "spark merge sort merge join window",
    "scan scan scan filter key value",
    "the quick brown fox",
    "window merge window scan merge merge",
    "a lone scan",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_bm25_matches_python_reference(docs):
    got = {
        r["doc_id"]: (r["n_terms_hit"], r["score"])
        for r in bm25_topk(docs, ["merge", "scan"], k=10).collect()
    }
    want = _py_bm25(CORPUS, ["merge", "scan"])
    assert set(got) == set(want)  # non-matching docs (fox) never appear
    for d, (hit, s) in want.items():
        assert got[d][0] == hit
        assert got[d][1] == pytest.approx(round(s, 6), abs=1e-6)


def test_bm25_ranking_and_k(docs):
    rows = bm25_topk(docs, ["merge", "scan"], k=2).collect()
    assert len(rows) == 2
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # doc 3 has the most merges + a scan: must rank first
    assert rows[0]["doc_id"] == 3


def test_bm25_duplicate_query_terms_count_once(docs):
    once = bm25_topk(docs, ["merge"], k=10).collect()
    twice = bm25_topk(docs, ["merge", "merge"], k=10).collect()
    assert [tuple(r) for r in once] == [tuple(r) for r in twice]


def test_bm25_empty_query_raises(docs):
    with pytest.raises(ValueError):
        bm25_topk(docs, [])
    with pytest.raises(ValueError):
        bm25_topk(docs, ["merge"], k=0)


def test_bm25_plan_query_filtered_topk(docs):
    plan = bm25_topk(docs, ["merge", "scan"], k=5)._jdf.queryExecution().executedPlan().toString()
    # ranking is top-k, never a global Sort+Limit
    assert "TakeOrderedAndProject" in plan
    # the tf aggregation only sees query terms: the isin filter must sit
    # in the plan (as an In predicate over the literal term list)
    assert "merge" in plan and "scan" in plan


def test_bm25_join_degenerates_to_topk_for_one_query(docs):
    from atiesh_spark.operators.retrieval import bm25_join

    spark = docs.sparkSession
    queries = spark.createDataFrame(
        [(7, "merge scan")], "query_id long, query_text string"
    )
    joined = {
        (r["doc_id"]): (r["n_terms_hit"], r["score"])
        for r in bm25_join(docs, queries, k=10).collect()
    }
    solo = {
        r["doc_id"]: (r["n_terms_hit"], r["score"])
        for r in bm25_topk(docs, ["merge", "scan"], k=10).collect()
    }
    assert joined == solo


def test_bm25_join_multi_query_matches_python(docs):
    from atiesh_spark.operators.retrieval import bm25_join

    spark = docs.sparkSession
    qs = [(1, "merge scan"), (2, "window"), (3, "zebra")]
    queries = spark.createDataFrame(qs, "query_id long, query_text string")
    got = {}
    for r in bm25_join(docs, queries, k=10).collect():
        got.setdefault(r["query_id"], {})[r["doc_id"]] = (
            r["n_terms_hit"],
            r["score"],
            r["rank"],
        )
    for qid, qtext in qs:
        want = _py_bm25(CORPUS, qtext.split())
        got_q = got.get(qid, {})
        assert set(got_q) == set(want), qid
        ranked = sorted(want, key=lambda d: (-round(want[d][1], 6), d))
        for rk, d in enumerate(ranked, start=1):
            assert got_q[d][0] == want[d][0]
            assert got_q[d][1] == pytest.approx(round(want[d][1], 6), abs=1e-6)
            assert got_q[d][2] == rk
    assert 3 not in got  # no doc contains 'zebra'


def test_bm25_join_duplicate_query_terms_count_once(docs):
    from atiesh_spark.operators.retrieval import bm25_join

    spark = docs.sparkSession
    a = spark.createDataFrame([(1, "merge merge scan")], "query_id long, query_text string")
    b = spark.createDataFrame([(1, "merge scan")], "query_id long, query_text string")
    ra = sorted(tuple(r) for r in bm25_join(docs, a, k=10).collect())
    rb = sorted(tuple(r) for r in bm25_join(docs, b, k=10).collect())
    assert ra == rb


def test_bm25_join_equals_topk_on_random_corpora(spark):
    """Randomized pin of the shared-scorer contract: for every random
    query, batch retrieval rows equal the single-query operator's."""
    import random

    from atiesh_spark.operators.retrieval import bm25_join

    rng = random.Random(23)
    vocab = ["scan", "merge", "sort", "join", "key", "row", "agg"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 20)))
        for _ in range(40)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    qs = [
        (qid, " ".join(rng.sample(vocab, rng.randrange(1, 4))))
        for qid in range(4)
    ]
    queries = spark.createDataFrame(qs, "query_id long, query_text string")
    batch = {}
    for r in bm25_join(docs, queries, k=7).collect():
        batch.setdefault(r["query_id"], {})[r["doc_id"]] = (
            r["n_terms_hit"], r["score"],
        )
    for qid, qtext in qs:
        solo = {
            r["doc_id"]: (r["n_terms_hit"], r["score"])
            for r in bm25_topk(docs, qtext.split(), k=7).collect()
        }
        assert batch.get(qid, {}) == solo, qid


def test_bm25_indexed_equals_query_time(spark, tmp_path):
    """The persisted-index path must score IDENTICALLY to the
    query-time operator — same tokenizer, same stats, same shared
    term-score expression — including after a parquet round-trip of
    the index (the artifact a 100 TB deployment would persist)."""
    import random

    from atiesh_spark.operators.retrieval import (
        bm25_index,
        bm25_topk,
        bm25_topk_indexed,
    )

    rng = random.Random(31)
    vocab = ["scan", "merge", "sort", "join", "key", "row", "agg", "spill"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 25)))
        for _ in range(60)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    postings, doclens = bm25_index(docs)
    postings.write.mode("overwrite").parquet(str(tmp_path / "postings"))
    doclens.write.mode("overwrite").parquet(str(tmp_path / "doclens"))
    p2 = spark.read.parquet(str(tmp_path / "postings"))
    d2 = spark.read.parquet(str(tmp_path / "doclens"))

    for terms in (["merge", "scan"], ["spill"], ["key", "row", "agg", "zzz"]):
        direct = sorted(
            map(tuple, bm25_topk(docs, terms, k=12).collect())
        )
        from_index = sorted(
            map(tuple, bm25_topk_indexed(p2, d2, terms, k=12).collect())
        )
        assert direct == from_index, terms


def test_streaming_bm25_index_equals_batch(spark, tmp_path):
    """After N batches (replay + re-ingest included) the maintained
    store must score exactly like a from-scratch bm25_topk."""
    import random

    from pyspark.sql import functions as F

    from atiesh_spark.operators.retrieval import StreamingBm25Index, bm25_topk

    rng = random.Random(41)
    vocab = ["scan", "merge", "sort", "join", "key", "row"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 15))))
        for i in range(50)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = StreamingBm25Index(str(tmp_path / "bm25"))
    for bnum in range(3):
        idx(docs.filter(F.col("doc_id") % 3 == bnum), bnum + 1)
    idx(docs.filter(F.col("doc_id") % 3 == 2), 3)  # replay converges

    direct = sorted(map(tuple, bm25_topk(docs, ["merge", "key"], k=10).collect()))
    streamed = sorted(map(tuple, idx.topk(spark, ["merge", "key"], k=10).collect()))
    assert direct == streamed

    # re-ingest doc 5 with new text: index must reflect the NEW corpus
    new5 = spark.createDataFrame([(5, "merge merge merge")], "doc_id long, text string")
    idx(new5, 4)
    updated = docs.filter("doc_id != 5").unionByName(new5)
    direct = sorted(map(tuple, bm25_topk(updated, ["merge", "key"], k=10).collect()))
    streamed = sorted(map(tuple, idx.topk(spark, ["merge", "key"], k=10).collect()))
    assert direct == streamed


def test_streaming_bm25_within_batch_duplicates_collapse(spark, tmp_path):
    """A doc id duplicated inside one batch must index exactly one
    version (deterministic max text) — tf must not sum across versions
    and doclens must not double-count the corpus size."""
    from atiesh_spark.operators.retrieval import StreamingBm25Index

    idx = StreamingBm25Index(str(tmp_path / "bm25_dup"))
    dup = spark.createDataFrame(
        [(5, "alpha beta"), (5, "gamma gamma"), (6, "delta")],
        "doc_id long, text string",
    )
    idx(dup, 1)
    post, lens = idx.read(spark)
    assert lens.count() == 2  # one length row per key
    got5 = {
        (r["token"], r["tf"]) for r in post.filter("doc_id = 5").collect()
    }
    assert got5 == {("gamma", 2)}  # max text wins; no cross-version tf


def test_retrieval_eval_hand_computed(spark):
    """Metrics against hand-computed values: relevant at ranks 2 and 5
    with one more relevant outside the top-k."""
    import math

    from atiesh_spark.operators.retrieval import retrieval_eval

    runs = spark.createDataFrame(
        [("a", f"d{r}", r) for r in range(1, 6)]
        + [("b", f"d{r}", r) for r in range(1, 4)],
        "query_id string, doc_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [("a", "d2"), ("a", "d5"), ("a", "d99"), ("b", "d1")],
        "query_id string, doc_id string",
    )
    got = {r.query_id: r for r in retrieval_eval(runs, qrels, k=5).collect()}
    a = got["a"]
    assert a.mrr == 0.5
    dcg = 1 / math.log2(3) + 1 / math.log2(6)
    idcg = 1 + 1 / math.log2(3) + 1 / math.log2(4)
    assert a.ndcg_at_5 == round(dcg / idcg, 4)
    assert a.recall_at_5 == round(2 / 3, 4)
    assert a.n_rel == 3
    b = got["b"]
    assert b.mrr == 1.0 and b.ndcg_at_5 == 1.0 and b.recall_at_5 == 1.0


def test_retrieval_eval_matches_python_reference_random_runs(spark):
    """Randomized differential: 12 queries x 20-doc rankings against
    random qrels (some empty, some larger than k); MRR, NDCG@k,
    recall@k and n_rel recomputed sequentially from the definitions
    must match every row to the 4dp rounding."""
    import math
    import random

    import pytest

    from atiesh_spark.operators.retrieval import retrieval_eval

    rng = random.Random(2002)
    k = 10
    queries = [f"q{i}" for i in range(12)]
    runs_rows, qrels_rows = [], []
    truth = {}
    for q in queries:
        docs = [f"d{j}" for j in range(20)]
        rng.shuffle(docs)
        runs_rows += [(q, d, r + 1) for r, d in enumerate(docs)]
        rel = set(rng.sample([f"d{j}" for j in range(25)],
                             rng.choice([0, 1, 3, 8, 15])))
        qrels_rows += [(q, d) for d in sorted(rel)]
        truth[q] = (docs, rel)

    def ref(q):
        docs, rel = truth[q]
        top = docs[:k]
        n_rel = len(rel)
        hits = [r + 1 for r, d in enumerate(top) if d in rel]
        mrr = 1.0 / hits[0] if hits else 0.0
        dcg = sum(1.0 / math.log2(r + 1) for r in hits)
        idcg = sum(1.0 / math.log2(r + 1)
                   for r in range(1, min(k, n_rel) + 1))
        ndcg = dcg / idcg if idcg > 0 else 0.0
        recall = len(hits) / n_rel if n_rel else 0.0
        return (round(mrr, 4), round(ndcg, 4), round(recall, 4), n_rel)

    runs = spark.createDataFrame(
        runs_rows, "query_id string, doc_id string, rank int")
    qrels = spark.createDataFrame(
        qrels_rows, "query_id string, doc_id string")
    got = {r["query_id"]: r
           for r in retrieval_eval(runs, qrels, k=k).collect()}
    assert set(got) == set(queries)
    for q in queries:
        mrr, ndcg, recall, n_rel = ref(q)
        assert got[q]["n_rel"] == n_rel, q
        assert got[q]["mrr"] == pytest.approx(mrr, abs=1e-4), q
        assert got[q][f"ndcg_at_{k}"] == pytest.approx(ndcg, abs=1e-4), q
        assert got[q][f"recall_at_{k}"] == pytest.approx(recall, abs=1e-4), q


def test_retrieval_eval_no_qrels_query_zeroes(spark):
    from atiesh_spark.operators.retrieval import retrieval_eval

    runs = spark.createDataFrame(
        [("q", "d1", 1)], "query_id string, doc_id string, rank int"
    )
    qrels = spark.createDataFrame(
        [], "query_id string, doc_id string"
    )
    [r] = retrieval_eval(runs, qrels, k=10).collect()
    assert (r.mrr, r.ndcg_at_10, r.recall_at_10, r.n_rel) == (0.0, 0.0, 0.0, 0)


class TestPhraseSearch:
    def test_counts_and_rejects(self, spark):
        from atiesh_spark.operators.retrieval import (
            phrase_search,
            positional_postings,
        )

        docs = spark.createDataFrame(
            [(1, "the fast key order the fast key"),
             (2, "fast the key"),          # right words, wrong order
             (3, "the fast"),              # too short for the phrase
             (4, "x the fast key y")],
            "doc_id bigint, text string",
        )
        idx = positional_postings(docs)
        out = {r["doc_id"]: r["n_occurrences"] for r in
               phrase_search(idx, ["the", "fast", "key"]).collect()}
        assert out == {1: 2, 4: 1}

    def test_repeated_term_in_phrase(self, spark):
        from atiesh_spark.operators.retrieval import (
            phrase_search,
            positional_postings,
        )

        docs = spark.createDataFrame(
            [(1, "go go go stop"), (2, "go stop go")],
            "doc_id bigint, text string",
        )
        idx = positional_postings(docs)
        out = {r["doc_id"]: r["n_occurrences"] for r in
               phrase_search(idx, ["go", "go"]).collect()}
        assert out == {1: 2}  # positions 1-2 and 2-3

    def test_matches_bruteforce_on_random_corpus(self, spark):
        """Randomized differential: overlapping-occurrence counts for
        random 2-4-token phrases over 40 random docs recomputed by a
        sequential sliding-window scan — the positional-join pipeline
        must return exactly the docs with >= 1 occurrence and the
        exact counts (including self-overlapping phrases like
        'go go')."""
        import random

        from atiesh_spark.operators.retrieval import (
            phrase_search,
            positional_postings,
        )

        rng = random.Random(1111)
        vocab = ["go", "stop", "fast", "key", "the"]
        texts = [" ".join(rng.choice(vocab)
                          for _ in range(rng.randint(0, 15)))
                 for _ in range(40)]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id bigint, text string",
        )
        idx = positional_postings(docs)
        for _ in range(6):
            phrase = [rng.choice(vocab)
                      for _ in range(rng.randint(2, 4))]
            want = {}
            for i, t in enumerate(texts):
                toks = t.split()
                c = sum(
                    toks[j:j + len(phrase)] == phrase
                    for j in range(len(toks) - len(phrase) + 1)
                )
                if c:
                    want[i] = c
            got = {r["doc_id"]: r["n_occurrences"]
                   for r in phrase_search(idx, phrase).collect()}
            assert got == want, phrase

    def test_indexed_equals_direct_scan(self, spark):
        from pyspark.sql import functions as F

        from atiesh_spark.functions.text import ws_tokens
        from atiesh_spark.operators.retrieval import (
            phrase_search,
            positional_postings,
        )

        docs = spark.createDataFrame(
            [(i, f"w{i % 3} common w{i % 5} common w{i % 3} tail")
             for i in range(40)],
            "doc_id bigint, text string",
        )
        phrase = ["common", "w2"]
        idx = positional_postings(docs)
        indexed = {r["doc_id"]: r["n_occurrences"] for r in
                   phrase_search(idx, phrase).collect()}
        toks = docs.select(
            "doc_id", ws_tokens(F.col("text")).alias("w")
        )
        scan = {
            r["doc_id"]: r["c"]
            for r in toks.select(
                "doc_id",
                F.size(F.expr(
                    "filter(sequence(1, greatest(size(w) - 1, 1)), "
                    "i -> i + 1 <= size(w) AND w[i - 1] = 'common' "
                    "AND w[i] = 'w2')"
                )).alias("c"),
            ).filter(F.col("c") > 0).collect()
        }
        assert indexed == scan and len(indexed) > 0

    def test_short_phrase_rejected(self, spark):
        import pytest as _pt

        from atiesh_spark.operators.retrieval import (
            phrase_search,
            positional_postings,
        )

        docs = spark.createDataFrame(
            [(1, "a b")], "doc_id bigint, text string"
        )
        with _pt.raises(ValueError, match="phrase"):
            phrase_search(positional_postings(docs), ["solo"])


class TestRrfFuse:
    @staticmethod
    def _rank(spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, rank int")

    def test_hand_computed_fusion(self, spark):
        from atiesh_spark.operators.retrieval import rrf_fuse

        a = self._rank(spark, [(1, 1), (2, 2), (3, 3)])
        b = self._rank(spark, [(3, 1), (1, 2), (4, 3)])
        out = {r["doc_id"]: r for r in
               rrf_fuse([a, b], top_k=4).collect()}
        assert out[1]["rrf"] == round(1 / 61 + 1 / 62, 4)
        assert out[1]["n_lists"] == 2
        assert out[3]["rrf"] == round(1 / 63 + 1 / 61, 4)
        assert out[4]["n_lists"] == 1
        # doc 1 (ranks 1+2) beats doc 3 (ranks 3+1): 1/61+1/62 > 1/63+1/61
        ordered = rrf_fuse([a, b], top_k=4).collect()
        assert ordered[0]["doc_id"] == 1

    def test_single_list_presence_still_scores(self, spark):
        from atiesh_spark.operators.retrieval import rrf_fuse

        a = self._rank(spark, [(1, 1)])
        b = self._rank(spark, [(2, 1)])
        out = {r["doc_id"]: r["rrf"] for r in
               rrf_fuse([a, b], top_k=5).collect()}
        assert out == {1: round(1 / 61, 4), 2: round(1 / 61, 4)}

    def test_top_k_cut_with_id_tiebreak(self, spark):
        from atiesh_spark.operators.retrieval import rrf_fuse

        # docs 5 and 9 fuse to identical scores; the cut keeps the
        # smaller id
        a = self._rank(spark, [(5, 1), (9, 1)])
        b = self._rank(spark, [(5, 2), (9, 2)])
        out = rrf_fuse([a, b], top_k=1).collect()
        assert [r["doc_id"] for r in out] == [5]

    def test_validation(self, spark):
        import pytest as _pt

        from atiesh_spark.operators.retrieval import rrf_fuse

        a = self._rank(spark, [(1, 1)])
        with _pt.raises(ValueError, match="rankings"):
            rrf_fuse([a])


class TestStreamingPositionalIndex:
    def test_replay_and_upsert_converge_to_batch(self, spark, tmp_path):
        from atiesh_spark.operators.retrieval import (
            StreamingPositionalIndex,
            positional_postings,
        )

        docs = spark.createDataFrame(
            [(i, f"w{i % 3} shared w{i % 5} shared tail") for i in range(9)],
            "doc_id long, text string",
        )
        idx = StreamingPositionalIndex(str(tmp_path / "st"))
        for b, pred in enumerate(
            ["doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"]
        ):
            idx(docs.filter(pred), b + 1)
        idx(docs.filter("doc_id % 3 = 2"), 3)  # replay the last batch
        got = sorted(map(tuple, idx.postings(spark).collect()))
        want = sorted(map(tuple,
                          positional_postings(docs).collect()))
        assert got == want and len(got) > 0
        # UPSERT: re-ingest doc 0 with new text; its old postings must
        # vanish and everyone else stays
        new0 = spark.createDataFrame(
            [(0, "completely different body")], "doc_id long, text string"
        )
        idx(new0, 4)
        updated = docs.filter("doc_id != 0").unionByName(new0)
        got2 = sorted(map(tuple, idx.postings(spark).collect()))
        want2 = sorted(map(tuple,
                           positional_postings(updated).collect()))
        assert got2 == want2

    def test_from_real_stream(self, spark, tmp_path):
        """Checkpointed foreachBatch + availableNow drain: the drained
        index equals the one-shot batch index (the q233 contract on
        the real engine)."""
        from atiesh_spark.operators.retrieval import (
            StreamingPositionalIndex,
            positional_postings,
        )

        docs = spark.createDataFrame(
            [(i, f"stream doc {i % 4} with common words") for i in range(12)],
            "doc_id long, text string",
        )
        src = str(tmp_path / "src")
        docs.filter("doc_id % 2 = 0").write.parquet(f"{src}/part=a")
        docs.filter("doc_id % 2 = 1").write.parquet(f"{src}/part=b")
        idx = StreamingPositionalIndex(str(tmp_path / "idx"))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/part=*")
        )
        q = (
            stream.writeStream.foreachBatch(idx)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(map(tuple, idx.postings(spark).collect()))
        want = sorted(map(tuple, positional_postings(docs).collect()))
        assert got == want and len(got) > 0
