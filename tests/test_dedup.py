

def test_dedup_savings_report_accounting(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from atiesh_spark.operators.dedup import dedup_savings_report

    # clusters: {1,2,3} -> survivor 1; {10,11} -> survivor 10; {20} alone
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)],
        "doc_id long, cluster_id long",
    )
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "bbbbbb"), (3, "cc"), (10, "ddddd"),
         (11, "e"), (20, "ffffffff")],
        "doc_id long, text string",
    )
    got = {r["cluster_size"]: r for r in dedup_savings_report(
        clusters, docs, "doc_id", "text").collect()}
    assert got[3]["n_clusters"] == 1 and got[3]["n_removable"] == 2
    assert got[3]["removable_bytes"] == 6 + 2  # docs 2 and 3; survivor 1 kept
    assert got[2]["removable_bytes"] == 1      # doc 11; survivor 10 kept
    assert got[1]["n_removable"] == 0 and got[1]["removable_bytes"] == 0
    # totals reconstruct the corpus
    assert sum(r["n_docs"] for r in got.values()) == 6


def test_word_gram_sets_matches_exploded_word_shingles(spark):
    """`word_gram_sets` (the r14 row-local word-set build q53 feeds to
    the Jaccard candidates path AND explodes for MinHash) must equal
    collect_set over word_shingles for every text shape: normal,
    fewer tokens than n (no grams -> empty set, where the exploded
    path yields no row), repeated grams, empty/whitespace-only text,
    and multi-space separators."""
    from pyspark.sql import functions as F

    from atiesh_spark.operators.dedup import word_gram_sets, word_shingles

    rows = [
        (1, "a b c a b"),        # repeats collapse
        (2, "one"),              # fewer than n=2 tokens -> empty set
        (3, ""),                 # empty -> empty set
        (4, "x  y\tz"),          # multi-space / tab separators
        (5, "w w w w"),          # single distinct gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sets = word_gram_sets(df, "doc_id", "text", n=2)
    got = {
        r["doc_id"]: sorted(r["__shs"]) for r in sets.collect()
    }
    want = {
        r["doc_id"]: sorted(r["s"])
        for r in word_shingles(df, "doc_id", "text", n=2, distinct=True)
        .groupBy("doc_id")
        .agg(F.collect_set("sh").alias("s"))
        .collect()
    }
    for doc_id, grams in got.items():
        assert grams == want.get(doc_id, []), doc_id
    assert set(got) == {1, 2, 3, 4, 5}
    # the exploded view reproduces word_shingles rows exactly
    exploded = sorted(
        (r["doc_id"], r["sh"])
        for r in sets.select(
            "doc_id", F.explode("__shs").alias("sh")
        ).collect()
    )
    direct = sorted(
        (r["doc_id"], r["sh"])
        for r in word_shingles(
            df, "doc_id", "text", n=2, distinct=True
        ).collect()
    )
    assert exploded == direct
    # and the set build itself is shuffle-free row-local code
    p = sets._jdf.queryExecution().executedPlan().toString()
    assert "array_distinct" in p
    assert "hashpartitioning" not in p  # only the round-robin fanout
    assert "SortAggregate" not in p and "HashAggregate" not in p


def test_edit_distance_pairs_verifies_candidates(spark):
    import pytest

    from atiesh_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        [
            (1, "hello world this is text"),
            (2, "hell0 w0rld this is text"),   # 2 substitutions
            (3, "completely different body"),
            (4, ""), (5, ""),
        ],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5)], "id_1 long, id_2 long"
    )
    got = {(r["id_1"], r["id_2"]): r for r in edit_distance_pairs(
        df, "doc_id", "text", cand, threshold=0.8).collect()}
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r["lev"] == 2 and abs(r["sim"] - (1 - 2 / 24)) < 1e-4
    assert (1, 3) not in got                # below threshold
    assert (4, 5) not in got                # empty pair: no signal, dropped
    # truncation bounds the comparison
    trunc = edit_distance_pairs(
        df, "doc_id", "text", cand, threshold=0.5, max_chars=5
    ).collect()
    assert {(r["id_1"], r["id_2"]) for r in trunc} >= {(1, 2)}
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "doc_id", "text", cand, threshold=0)
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "doc_id", "text", cand, max_chars=0)


def test_char_gram_set_matches_exploded_shingle_sets(spark):
    """`char_gram_set` (the r14 row-local set build used by the Jaccard
    candidates path) must equal collect_set over char_shingles for every
    text shape: normal, shorter than k (truncated tail gram), repeated
    grams, and empty (empty SET, where the exploded path yields no row)."""
    from pyspark.sql import functions as F

    from atiesh_spark.operators.dedup import char_gram_set, char_shingles

    rows = [
        (1, "abcabcab"),       # repeats collapse
        (2, "ab"),             # shorter than k=3 -> one truncated gram
        (3, ""),               # empty -> empty set
        (4, "aaaa"),           # single distinct gram
        (5, "xy zw"),          # whitespace is a char like any other
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: sorted(r["s"])
        for r in df.select(
            "doc_id", char_gram_set("text", 3).alias("s")
        ).collect()
    }
    want = {
        r["doc_id"]: sorted(r["s"])
        for r in char_shingles(df, "doc_id", "text", k=3, distinct=True)
        .groupBy("doc_id")
        .agg(F.collect_set("sh").alias("s"))
        .collect()
    }
    for doc_id, grams in got.items():
        assert grams == want.get(doc_id, []), doc_id
    assert set(got) == {1, 2, 3, 4, 5}
