"""Interpolated Kneser-Ney bigram LM (operators/ngramlm.py) against
hand-computed Chen & Goodman values."""

import math

import pytest
from pyspark.sql import functions as F

from atiesh_spark.operators.ngramlm import kn_bigram_model, kn_score_docs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_kn_model_and_scoring_match_python_reference(spark):
    """Randomized differential: 30 random docs train the model and a
    sequential implementation of interpolated KN (Chen & Goodman's
    formula exactly as documented — absolute discount, continuation
    counts over the distinct-bigram table) must reproduce every model
    row; scoring (training docs + held-out docs with OOV bigrams)
    must match per-doc counts and the rounded mean log2 p."""
    import random
    from collections import Counter

    rng = random.Random(1995)
    vocab = ["a", "b", "c", "dd", "e"]
    texts = [" ".join(rng.choice(vocab)
                      for _ in range(rng.randint(0, 12)))
             for _ in range(30)]
    rows = [(i, t) for i, t in enumerate(texts)]
    held = [(100, "a b zz c"), (101, "zz zz"), (102, "e"), (103, "")]
    d = 0.75

    def bigrams(t):
        toks = t.split()
        return list(zip(toks, toks[1:]))

    c12 = Counter(bg for _, t in rows for bg in bigrams(t))
    c1 = Counter()
    r1 = Counter()
    l2 = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        r1[w1] += 1
        l2[w2] += 1
    d_total = len(c12)
    p_kn = {
        (w1, w2): max(c - d, 0.0) / c1[w1]
        + d * r1[w1] / c1[w1] * l2[w2] / d_total
        for (w1, w2), c in c12.items()
    }

    docs = _docs(spark, rows)
    model = kn_bigram_model(docs)
    got_model = {(r["w1"], r["w2"]): r for r in model.collect()}
    assert set(got_model) == set(c12)
    for bg, r in got_model.items():
        assert (r["c12"], r["c1"], r["r1"], r["l2"]) == \
            (c12[bg], c1[bg[0]], r1[bg[0]], l2[bg[1]]), bg
        assert r["p_kn"] == pytest.approx(p_kn[bg], abs=1e-12), bg

    score_in = _docs(spark, rows + held)
    got = {r["doc_id"]: r for r in
           kn_score_docs(score_in, model).collect()}
    for i, t in rows + held:
        bgs = bigrams(t)
        if not bgs:
            assert i not in got
            continue
        iv = [bg for bg in bgs if bg in p_kn]
        assert got[i]["n_bigrams"] == len(iv), i
        assert got[i]["oov_bigrams"] == len(bgs) - len(iv), i
        if iv:
            want = round(sum(math.log2(p_kn[bg]) for bg in iv) / len(iv), 4)
            assert got[i]["mean_log2p"] == pytest.approx(want, abs=1e-4), i
        else:
            assert got[i]["mean_log2p"] is None


class TestModel:
    def test_hand_computed_counts_and_probability(self, spark):
        # Corpus: "a b a b a c". Bigrams: (a,b)x2, (b,a)x2, (a,c)x1.
        # c(a)=3, N1+(a *)=2; c(b)=2, N1+(b *)=1.
        # N1+(* a)=1, N1+(* b)=1, N1+(* c)=1; N1+(* *)=3.
        m = {
            (r["w1"], r["w2"]): r
            for r in kn_bigram_model(
                _docs(spark, [(1, "a b a b a c")]), "doc_id", "text"
            ).collect()
        }
        ab = m[("a", "b")]
        assert (ab["c12"], ab["c1"], ab["r1"], ab["l2"]) == (2, 3, 2, 1)
        # P(b|a) = (2-.75)/3 + (.75*2/3)*(1/3)
        assert ab["p_kn"] == pytest.approx(
            (2 - 0.75) / 3 + (0.75 * 2 / 3) * (1 / 3), abs=1e-12
        )
        ac = m[("a", "c")]
        assert ac["p_kn"] == pytest.approx(
            (1 - 0.75) / 3 + (0.75 * 2 / 3) * (1 / 3), abs=1e-12
        )

    def test_probabilities_normalize_per_context(self, spark):
        # Interpolated KN is a proper distribution over seen
        # continuations' mass: summing P(w2|w1) over the model rows of
        # one context w1 gives max(c-d,0)/c1 totals plus the backoff
        # mass spread over the CONTINUATION distribution — for a w1
        # whose every w2 is seen, the sum over seen w2 is
        # 1 - d*r1/c1 * (1 - sum_seen P_cont). With this tiny corpus
        # every w2 in the vocab follows 'a', so P(.|a) sums to 1.
        rows = kn_bigram_model(
            _docs(spark, [(1, "a b a c a b")]), "doc_id", "text"
        ).filter(F.col("w1") == "a").collect()
        # bigrams: (a,b)x2 (b,a)x1 (c,a)x1 (a,c)x1 -> contexts of a:
        # b,c seen; P_cont covers {a,b,c}; a also continues (after
        # b and c) so sum_seen P_cont for w2 in {b,c} < 1 and the
        # total is < 1 by exactly the unseen continuation mass.
        total = sum(r["p_kn"] for r in rows)
        d, c1, r1 = 0.75, 3, 2
        # seen mass + backoff weight * P_cont(b,c) where
        # l2: b=1 (after a), c=1 (after a), a=2 (after b, after c);
        # d_total = 4
        expected = ((2 - d) / c1 + (1 - d) / c1) + (d * r1 / c1) * (2 / 4)
        assert total == pytest.approx(expected, abs=1e-12)


class TestScoring:
    def test_self_scoring_no_oov(self, spark):
        docs = _docs(spark, [(1, "a b a b"), (2, "b a b")])
        model = kn_bigram_model(docs, "doc_id", "text")
        out = {r["doc_id"]: r for r in
               kn_score_docs(docs, model, "doc_id", "text").collect()}
        assert out[1]["n_bigrams"] == 3 and out[1]["oov_bigrams"] == 0
        assert out[2]["n_bigrams"] == 2 and out[2]["oov_bigrams"] == 0

    def test_mean_log2p_hand_computed(self, spark):
        docs = _docs(spark, [(1, "a b a b a c")])
        model = kn_bigram_model(docs, "doc_id", "text")
        row = kn_score_docs(docs, model, "doc_id", "text").collect()[0]
        pab = (2 - 0.75) / 3 + (0.75 * 2 / 3) * (1 / 3)
        pba = (2 - 0.75) / 2 + (0.75 * 1 / 2) * (1 / 3)
        pac = (1 - 0.75) / 3 + (0.75 * 2 / 3) * (1 / 3)
        expected = (
            2 * math.log2(pab) + 2 * math.log2(pba) + math.log2(pac)
        ) / 5
        assert row["mean_log2p"] == pytest.approx(round(expected, 4),
                                                  abs=1e-9)

    def test_oov_bigrams_counted_not_scored(self, spark):
        train = _docs(spark, [(1, "a b a b")])
        model = kn_bigram_model(train, "doc_id", "text")
        test = _docs(spark, [(9, "a b x y")])
        row = kn_score_docs(test, model, "doc_id", "text").collect()[0]
        # bigrams: (a,b) in-vocab; (b,x) and (x,y) OOV
        assert row["n_bigrams"] == 1
        assert row["oov_bigrams"] == 2
        # mean over the single in-vocab bigram only
        pab = (2 - 0.75) / 2 + (0.75 * 1 / 2) * (1 / 2)
        assert row["mean_log2p"] == pytest.approx(round(math.log2(pab), 4),
                                                  abs=1e-9)

    def test_single_token_doc_has_no_row(self, spark):
        docs = _docs(spark, [(1, "a b"), (2, "solo")])
        model = kn_bigram_model(docs, "doc_id", "text")
        ids = {r["doc_id"] for r in
               kn_score_docs(docs, model, "doc_id", "text").collect()}
        assert ids == {1}


def test_plan_model_join_reuses_partitioning(spark):
    # Scoring joins on (w1, w2) — the model's groupBy key. The executed
    # plan must not Python-evaluate anything, and the distinct-bigram
    # total must arrive as a broadcast, not a shuffle.
    docs = _docs(spark, [(1, "a b c a b")])
    model = kn_bigram_model(docs, "doc_id", "text")
    df = kn_score_docs(docs, model, "doc_id", "text")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BroadcastExchange" in plan


class TestStreamingNgramLM:
    def test_replay_converges_to_batch_counts(self, spark, tmp_path):
        from atiesh_spark.operators.ngramlm import (
            StreamingNgramLM,
            kn_bigram_model,
        )

        docs = spark.createDataFrame(
            [(i, f"w{i % 3} common w{i % 5} tail common w{i % 3}")
             for i in range(12)],
            "doc_id long, text string",
        )
        lm = StreamingNgramLM(str(tmp_path / "st"), "doc_id", "text")
        for b, pred in enumerate(
            ["doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"]
        ):
            lm(docs.filter(pred), b + 1)
        lm(docs.filter("doc_id % 3 = 2"), 3)  # replay the last batch
        got = sorted(map(tuple, lm.model(spark).collect()))
        want = sorted(map(tuple,
                          kn_bigram_model(docs, "doc_id", "text").collect()))
        assert got == want and len(got) > 0

    def test_from_real_stream(self, spark, tmp_path):
        """End-to-end through Structured Streaming (checkpointed
        foreachBatch, availableNow): the drained incremental model must
        equal the one-shot batch fit — the q220 contract on the REAL
        engine."""
        from atiesh_spark.operators.ngramlm import (
            StreamingNgramLM,
            kn_bigram_model,
        )

        docs = spark.createDataFrame(
            [(i, f"stream doc {i} shares these filler words {i % 4}")
             for i in range(16)],
            "doc_id long, text string",
        )
        src = str(tmp_path / "src")
        docs.filter("doc_id % 2 = 0").write.parquet(f"{src}/part=a")
        docs.filter("doc_id % 2 = 1").write.parquet(f"{src}/part=b")

        lm = StreamingNgramLM(str(tmp_path / "lm"), "doc_id", "text")
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/part=*")
        )
        q = (
            stream.writeStream.foreachBatch(lm)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(map(tuple, lm.model(spark).collect()))
        want = sorted(map(tuple,
                          kn_bigram_model(docs, "doc_id", "text").collect()))
        assert got == want and len(got) > 0
