

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


def test_ks_statistic_known_values(spark):
    import pytest

    from atiesh_spark.operators.profile import ks_statistic

    # identical samples: D = 0
    a = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    r = ks_statistic(a, a, "v").collect()[0]
    assert r["ks_d"] == 0.0 and r["n_a"] == r["n_b"] == 10

    # disjoint supports: D = 1
    b = spark.createDataFrame([(float(i + 100),) for i in range(10)], "v double")
    assert ks_statistic(a, b, "v").collect()[0]["ks_d"] == 1.0

    # hand-computed: a = {1,2,3,4}, b = {3,4,5,6} -> D = 0.5 at x=2..3
    a2 = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], "v double")
    b2 = spark.createDataFrame([(3.0,), (4.0,), (5.0,), (6.0,)], "v double")
    assert ks_statistic(a2, b2, "v").collect()[0]["ks_d"] == 0.5

    # NULLs excluded; empty side raises
    with_null = spark.createDataFrame([(None,), (1.0,)], "v double")
    assert ks_statistic(with_null, a2, "v").collect()[0]["n_a"] == 1
    with pytest.raises(ValueError):
        ks_statistic(a2.filter("v > 99"), b2, "v")
