

def test_source_scorecard_signals(spark):
    from atiesh_spark.operators.profile import source_scorecard

    rows = [
        (1, "a", "en", "hello world text"),
        (2, "a", "en", "hello world text"),   # exact dup within source a
        (3, "a", "fr", "bonjour tout le monde"),
        (4, "b", "en", "hello world text"),   # same text, DIFFERENT source: not a within-source dup
        (5, "b", "en", "unique text for b here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")
    got = {r["source"]: r for r in source_scorecard(
        df, "source", "doc_id", "text", "lang").collect()}
    a, b = got["a"], got["b"]
    assert a["n_docs"] == 3 and b["n_docs"] == 2
    assert abs(a["dup_rate"] - 2 / 3) < 1e-4   # docs 1,2 are dups
    assert b["dup_rate"] == 0.0                 # doc 4 unique within b
    assert abs(a["pct_target_lang"] - 2 / 3) < 1e-4
    assert b["pct_target_lang"] == 1.0
    # no lm_scores frame: scored count 0, sum NULL
    assert a["n_scored"] == 0 and a["sum_bits_per_char"] is None
