"""Unit tests for text-statistics operators (char entropy)."""

from __future__ import annotations


def test_char_entropy_values_and_degenerate_inputs(spark):
    import math

    from atiesh_spark.operators.textstats import char_entropy

    df = spark.createDataFrame(
        [(1, "aabbc"), (2, "aaaa"), (3, ""), (4, None), (5, "ab")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    want = -sum(p * math.log2(p) for p in (0.4, 0.4, 0.2))
    assert out[1]["char_entropy"] == round(want, 4) and out[1]["n_chars_seen"] == 5
    assert out[2]["char_entropy"] == 0.0  # single repeated char: zero bits
    assert out[3]["char_entropy"] == 0.0 and out[3]["n_chars_seen"] == 0
    assert out[4]["char_entropy"] == 0.0 and out[4]["n_chars_seen"] == 0
    assert out[5]["char_entropy"] == 1.0  # two equiprobable chars: one bit


def test_ngram_lm_scores_separate_prose_from_mash(spark):
    from atiesh_spark.operators.textstats import ngram_lm_scores

    prose = "the cat sat on the mat and the cat sat again " * 4
    mash = "qzxjvkwpqmzxbvnqjwkxpzmvbqnxjzwkvpmqzbxnvjqw"
    df = spark.createDataFrame(
        [(1, prose), (2, mash), (3, "ab")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in ngram_lm_scores(df, "doc_id", "text").collect()}
    # trigrams repeated across the corpus compress well; one-off mash doesn't
    assert got[1]["bits_per_char"] < got[2]["bits_per_char"]
    # too short to score: zero ngrams, NULL score (not 0.0)
    assert got[3]["n_ngrams"] == 0 and got[3]["bits_per_char"] is None


def test_ngram_lm_scores_validates_args(spark):
    import pytest

    from atiesh_spark.operators.textstats import ngram_lm_scores

    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        ngram_lm_scores(df, "doc_id", "text", k=1)
    with pytest.raises(ValueError):
        ngram_lm_scores(df, "doc_id", "text", smooth=0)


def test_dsir_weights_prefer_target_like_docs(spark):
    from pyspark.sql import functions as F

    from atiesh_spark.operators.textstats import dsir_log_weights

    target_words = "alpha beta gamma delta epsilon"
    source_words = "uno dos tres cuatro cinco"
    rows = (
        [(i, target_words, "en") for i in range(10)]
        + [(100 + i, source_words, "xx") for i in range(10)]
        + [(200, target_words, "xx"), (201, source_words, "xx"), (202, "", "xx")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {
        r["doc_id"]: r
        for r in dsir_log_weights(
            df, "doc_id", "text", target_filter=F.col("lang") == "en", buckets=512
        ).collect()
    }
    # a doc made of target-distribution words outweighs a source-generic one
    assert got[200]["log_weight"] > got[201]["log_weight"]
    # empty doc: neutral weight, zero tokens
    assert got[202]["n_tokens"] == 0 and got[202]["log_weight"] == 0.0


def test_dsir_then_weighted_sample_composes(spark):
    from pyspark.sql import functions as F

    from atiesh_spark.operators.sampling import weighted_sample
    from atiesh_spark.operators.textstats import dsir_log_weights

    rows = [(i, ("alpha beta " if i % 2 else "uno dos ") * 5,
             "en" if i < 10 else "xx") for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    weights = dsir_log_weights(
        df, "doc_id", "text", target_filter=F.col("lang") == "en", buckets=512
    )
    # the DSIR recipe: exponentiate shifted log-weights, resample
    mx = weights.agg(F.max("log_weight")).collect()[0][0]
    w = weights.withColumn("w", F.exp(F.col("log_weight") - F.lit(mx)))
    got = weighted_sample(w, "doc_id", "w", k=10).collect()
    assert len(got) == 10
    # deterministic: second draw identical
    again = weighted_sample(w, "doc_id", "w", k=10).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in again]


def test_gopher_rules_signals_and_gate(spark):
    from atiesh_spark.operators.textstats import gopher_rules

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox and that have with to be of # ...\n"
                "- bullet\nnormal line..."),
            (2, "#### #### ...."),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_rules(df, "doc_id", "text", min_words=5).collect()}
    r1 = got[1]
    assert r1["n_words"] == 17
    assert abs(r1["symbol_word_ratio"] - 3 / 17) < 1e-5  # 1 hash + 2 '...'
    assert abs(r1["bullet_line_frac"] - 1 / 3) < 1e-5
    assert abs(r1["ellipsis_line_frac"] - 2 / 3) < 1e-5
    assert r1["n_stop_words"] == 8
    assert not r1["pass"]  # symbol + ellipsis rules fail
    r2 = got[2]
    assert r2["alpha_word_frac"] == 0.0
    assert r2["n_stop_words"] == 0 and not r2["pass"]


def test_gopher_rules_zero_shuffle(spark):
    from atiesh_spark.operators.textstats import gopher_rules

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        gopher_rules(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_classification_report_known_matrix(spark):
    from atiesh_spark.operators.textstats import classification_report

    df = spark.createDataFrame(
        [
            ("en", "en"), ("en", "en"), ("en", "fr"),
            ("fr", "fr"), ("fr", "en"),
            ("de", "unknown"),
            (None, "en"), ("en", None),  # missing ground truth excluded
        ],
        "label string, pred string",
    )
    got = {r["label"]: r for r in classification_report(df, "label", "pred").collect()}
    en = got["en"]
    assert (en["n"], en["tp"], en["fp"], en["fn"]) == (3, 2, 1, 1)
    assert abs(en["precision"] - 2 / 3) < 1e-6
    assert abs(en["recall"] - 2 / 3) < 1e-6
    de = got["de"]
    assert de["tp"] == 0 and de["precision"] is None  # 'de' never predicted
    assert abs(got["fr"]["f1"] - 2 * 1 / (2 + 2)) < 1e-6
