"""Unit tests for corpus-level operators (line dedup, n-gram stats,
chunking, temperature weights) — edge cases the sf-data parity tests
don't construct: fully-boilerplate docs, empty lines, short last
chunks, empty docs, degenerate alpha values.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from atiesh_spark.operators.corpus import chunk_documents, line_dedup, top_ngrams
from atiesh_spark.operators.sampling import temperature_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_removes_all_occurrences(spark):
    # 'FOOTER' appears in 3 docs -> removed everywhere, including doc 1's
    # first occurrence (the C4 rule); unique lines survive in order.
    df = _docs(
        spark,
        [
            (1, "alpha\nFOOTER\nbeta"),
            (2, "FOOTER\ngamma"),
            (3, "delta\nFOOTER"),
            (4, "unique only"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in line_dedup(df, "doc_id", "text", max_doc_freq=2).collect()
    }
    assert out[1]["clean_text"] == "alpha\nbeta"
    assert out[1]["n_lines_kept"] == 2 and out[1]["n_lines_removed"] == 1
    assert out[2]["clean_text"] == "gamma"
    assert out[3]["clean_text"] == "delta"
    assert out[4]["clean_text"] == "unique only"
    assert out[4]["n_lines_removed"] == 0


def test_line_dedup_fully_boilerplate_doc_yields_empty(spark):
    df = _docs(spark, [(1, "same"), (2, "same"), (3, "same")])
    out = {r["doc_id"]: r for r in line_dedup(df, "doc_id", "text").collect()}
    for i in (1, 2, 3):
        assert out[i]["clean_text"] == ""
        assert out[i]["n_lines_kept"] == 0
        assert out[i]["n_lines_removed"] == 1


def test_line_dedup_empty_and_whitespace_lines_never_removed(spark):
    # blank lines occur in both docs but are structure, not boilerplate
    df = _docs(spark, [(1, "a\n\nb"), (2, "c\n\nd"), (3, "  \ne")])
    out = {r["doc_id"]: r for r in line_dedup(df, "doc_id", "text").collect()}
    assert out[1]["clean_text"] == "a\n\nb"
    assert out[2]["clean_text"] == "c\n\nd"
    assert out[3]["clean_text"] == "  \ne"


def test_line_dedup_trim_normalization_matches_padded_lines(spark):
    # '  FOOTER' and 'FOOTER ' trim-match -> both removed
    df = _docs(spark, [(1, "  FOOTER\nkeep1"), (2, "FOOTER \nkeep2")])
    out = {r["doc_id"]: r for r in line_dedup(df, "doc_id", "text").collect()}
    assert out[1]["clean_text"] == "keep1"
    assert out[2]["clean_text"] == "keep2"


def test_line_dedup_shuffle_join_mode_matches_broadcast(spark):
    df = _docs(
        spark,
        [(1, "x\ncommon"), (2, "common\ny"), (3, "z")],
    )
    a = sorted(map(tuple, line_dedup(df, "doc_id", "text").collect()))
    b = sorted(
        map(tuple, line_dedup(df, "doc_id", "text", broadcast_common=False).collect())
    )
    assert a == b


def test_chunk_documents_overlap_and_short_tail(spark):
    df = _docs(spark, [(1, "abcdefghij")])  # 10 chars
    rows = sorted(
        (r["chunk_id"], r["chunk_text"], r["n_chunk_chars"])
        for r in chunk_documents(df, "doc_id", "text", size=4, stride=3).collect()
    )
    # starts 0,3,6,9 -> abcd, defg, ghij, j
    assert rows == [(0, "abcd", 4), (1, "defg", 4), (2, "ghij", 4), (3, "j", 1)]


def test_chunk_documents_no_overlap_default_stride(spark):
    df = _docs(spark, [(1, "abcdef")])
    rows = sorted(
        (r["chunk_id"], r["chunk_text"])
        for r in chunk_documents(df, "doc_id", "text", size=3).collect()
    )
    assert rows == [(0, "abc"), (1, "def")]


def test_chunk_documents_empty_doc_yields_one_empty_chunk(spark):
    df = _docs(spark, [(1, "")])
    rows = chunk_documents(df, "doc_id", "text", size=5).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "" and rows[0]["n_chunk_chars"] == 0


def test_top_ngrams_counts_and_tiebreak(spark):
    df = _docs(
        spark,
        [
            (1, "a b a b"),   # 'a b' x2, 'b a' x1
            (2, "a b c"),     # 'a b' x1, 'b c' x1
        ],
    )
    rows = top_ngrams(df, "doc_id", "text", n=2, k=3).collect()
    by_rank = {r["rank"]: (r["sh"], r["n_docs"], r["n_total"]) for r in rows}
    assert by_rank[1] == ("a b", 2, 3)
    # 'b a' and 'b c' tie at 1 total -> lexicographic tie-break
    assert by_rank[2] == ("b a", 1, 1)
    assert by_rank[3] == ("b c", 1, 1)


def test_temperature_weights_alpha_one_is_proportional(spark):
    df = spark.createDataFrame(
        [("en", 900), ("fr", 100)], "lang string, cost long"
    )
    out = {r["lang"]: r for r in temperature_weights(df, "lang", "cost", alpha=1.0).collect()}
    assert math.isclose(out["en"]["weight"], 0.9)
    assert math.isclose(out["fr"]["weight"], 0.1)
    # proportional sampling = every stratum seen exactly once at parity
    assert math.isclose(out["en"]["epochs_at_parity"], 1.0)
    assert math.isclose(out["fr"]["epochs_at_parity"], 1.0)


def test_temperature_weights_alpha_zero_is_uniform(spark):
    df = spark.createDataFrame(
        [("en", 900), ("fr", 100)], "lang string, cost long"
    )
    out = {r["lang"]: r for r in temperature_weights(df, "lang", "cost", alpha=0.0).collect()}
    assert math.isclose(out["en"]["weight"], 0.5)
    assert math.isclose(out["fr"]["weight"], 0.5)
    # the scarce stratum repeats 5x under a uniform draw of the full budget
    assert math.isclose(out["fr"]["epochs_at_parity"], 5.0)
    assert math.isclose(out["en"]["epochs_at_parity"], 0.5556, abs_tol=1e-4)


def test_temperature_weights_sum_to_one(spark):
    df = spark.createDataFrame(
        [("a", 10), ("b", 200), ("c", 3000)], "lang string, cost long"
    )
    rows = temperature_weights(df, "lang", "cost", alpha=0.3, round_to=6).collect()
    assert math.isclose(sum(r["weight"] for r in rows), 1.0, abs_tol=1e-4)


def test_inverted_index_caps_postings_exact_df(spark):
    import pytest as _pytest

    from atiesh_spark.operators.corpus import inverted_index

    docs = spark.createDataFrame(
        [
            (3, "apple banana apple"),
            (1, "apple cherry"),
            (2, "apple banana"),
            (4, "date"),
        ],
        "doc_id long, text string",
    )
    out = {r["token"]: r for r in inverted_index(docs, max_postings=2).collect()}
    # df and n_total stay exact even though the posting list is capped
    apple = out["apple"]
    assert apple["df"] == 3 and apple["n_total"] == 4
    assert apple["postings"] == "1,2"  # smallest ids, capped at 2
    assert out["banana"]["postings"] == "2,3"
    assert out["date"]["df"] == 1

    assert "date" not in {
        r["token"] for r in inverted_index(docs, min_df=2).collect()
    }
    with _pytest.raises(ValueError):
        inverted_index(docs, max_postings=0)


def test_curate_corpus_reports_every_stage(spark):
    from atiesh_spark.operators.curation import curate_corpus

    rows = [
        # en: one too-short doc, one dup pair, rest ok
        (1, "x", "en", 1),                                  # fails min_chars
        (2, "good words here live", "en", 20),
        (3, "good words here live", "en", 20),              # exact dup of 2
        (4, "more fine text lives", "en", 20),
        # fr: all docs fail the word-length screen -> language must
        # still appear in the report with zeros
        (5, "supercalifragilistic expialidocious", "fr", 35),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    out = {
        r["lang"]: r
        for r in curate_corpus(
            df, min_chars=5, max_chars=100, max_mean_word_len=6.0, budget=25
        ).collect()
    }
    en = out["en"]
    assert en["n_candidates"] == 4
    assert en["n_after_quality"] == 3      # doc 1 too short
    assert en["n_after_dedup"] == 2        # 3 is a dup of 2
    # budget 25: doc 2 (20, running 20) kept; doc 4 crosses the line and
    # is the first-over kept row -> both selected
    assert en["n_selected"] == 2 and en["cost_selected"] == 40
    fr = out["fr"]
    assert fr["n_candidates"] == 1
    assert (fr["n_after_quality"], fr["n_after_dedup"], fr["n_selected"]) == (0, 0, 0)
    assert fr["cost_selected"] == 0


def test_remove_duplicate_spans_excises_copied_text(spark):
    from atiesh_spark.operators.corpus import remove_duplicate_spans

    copied = "this exact paragraph was copied verbatim between documents!"
    rows = [
        (1, "AAAA " + copied + " BBBB unique tail one"),
        (2, "unique head two " + copied + " CCCC"),
        (3, "entirely original text with no duplication at all in here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in remove_duplicate_spans(
        df, "doc_id", "text", width=16, stride=4).collect()}
    # keeper (lowest id among dup holders) keeps its text whole
    assert out[1]["clean_text"] == rows[0][1]
    assert out[1]["chars_removed"] == 0
    # victim loses the copied span (sampling-stride accurate), keeps
    # its unique head/tail
    assert copied not in out[2]["clean_text"]
    assert out[2]["clean_text"].startswith("unique head two ")
    assert out[2]["clean_text"].endswith("CCCC")
    assert out[2]["chars_removed"] > len(copied) - 16 - 4
    # untouched doc passes through whole
    assert out[3]["clean_text"] == rows[2][1]
    assert out[3]["n_dup_windows"] == 0


def test_remove_duplicate_spans_matches_python_reference(spark):
    import hashlib
    import random

    from atiesh_spark.operators.corpus import remove_duplicate_spans

    rng = random.Random(7)
    frag = "shared fragment of repeated corpus text! "
    docs = []
    for i in range(30):
        parts = []
        for _ in range(rng.randrange(1, 5)):
            if rng.random() < 0.4:
                parts.append(frag)
            else:
                parts.append("".join(rng.choice("abcdefg hij") for _ in range(rng.randrange(10, 60))))
        docs.append((i, "".join(parts)))
    W, S = 24, 6
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in remove_duplicate_spans(
        df, "doc_id", "text", width=W, stride=S).collect()}

    # independent reference
    wins = {}
    for i, t in docs:
        for s in range(0, max(len(t) - W, 0) + 1):
            h = hashlib.md5(t[s:s + W].encode()).hexdigest()
            # content gate: window survives iff its own md5 % rate == 0
            if int(h[:15], 16) % S == 0:
                wins.setdefault(h, []).append((i, s))
    victims: dict = {}
    for h, occ in wins.items():
        ids = {i for i, _ in occ}
        if len(ids) >= 2:
            keeper = min(ids)
            for i, s in occ:
                if i != keeper:
                    victims.setdefault(i, []).append(s)
    for i, t in docs:
        starts = sorted(victims.get(i, []))
        # union length + excision
        removed, pos = 0, -1
        out, rpos = [], 0
        for s in starts:
            e = min(s + W, len(t))
            removed += max(0, e - max(pos, s))
            pos = max(pos, e)
            if s > rpos:
                out.append(t[rpos:s])
            rpos = max(rpos, e)
        out.append(t[rpos:])
        clean = "".join(out)
        assert got[i]["n_dup_windows"] == len(starts), i
        assert got[i]["chars_removed"] == removed, i
        assert got[i]["clean_text"] == clean, i


def test_content_sampling_detects_planted_copies_at_random_alignments(spark):
    """The claim the positional scheme could not make: a copied span is
    detected at ANY alignment. 15 doc pairs share a 200-char span at
    seeded-random unrelated offsets; with width=32, rate=8 each pair's
    miss probability is (7/8)^169 ~ 1.6e-10, so every pair must match
    (and the result is deterministic given md5)."""
    import random
    import string

    from atiesh_spark.operators.corpus import window_overlap_pairs

    rng = random.Random(13)

    def junk(n):
        return "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))

    rows = []
    for i in range(15):
        span = junk(200)
        rows.append((2 * i, junk(rng.randrange(0, 50)) + span + junk(30)))
        rows.append((2 * i + 1, junk(rng.randrange(0, 50)) + span + junk(30)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_1"], r["id_2"])
        for r in window_overlap_pairs(
            df, "doc_id", "text", width=32, stride=8, max_doc_freq=4
        ).collect()
    }
    for i in range(15):
        assert (2 * i, 2 * i + 1) in pairs, f"pair {i} undetected"
    # and no cross-pair false positives: spans are independent random
    assert all(b - a == 1 for a, b in pairs)


def test_streaming_line_frequency_equals_batch_dedup(spark, tmp_path):
    from atiesh_spark.operators.corpus import StreamingLineFrequency, line_dedup
    from atiesh_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    b1 = docs.filter("doc_id % 3 = 0")
    b2 = docs.filter("doc_id % 3 = 1")
    b3 = docs.filter("doc_id % 3 = 2")

    freq = StreamingLineFrequency("doc_id", "text", str(tmp_path / "freq"))
    freq(b1, 0)
    freq(b2, 1)
    freq(b3, 2)

    # cleaning the corpus against the streamed store == the batch operator
    def canon(df):
        return sorted(
            (r["doc_id"], r["clean_text"], r["n_lines_kept"], r["n_lines_removed"])
            for r in df.collect()
        )

    streamed = line_dedup(
        docs, "doc_id", "text",
        common_hashes=freq.common(spark, max_doc_freq=2),
    )
    batch = line_dedup(docs, "doc_id", "text", max_doc_freq=2)
    assert canon(streamed) == canon(batch)

    # replay converges; threshold is a read-time decision
    freq(b3, 2)
    assert canon(
        line_dedup(docs, "doc_id", "text",
                   common_hashes=freq.common(spark, max_doc_freq=2))
    ) == canon(batch)
    strict = line_dedup(docs, "doc_id", "text", max_doc_freq=5)
    assert canon(
        line_dedup(docs, "doc_id", "text",
                   common_hashes=freq.common(spark, max_doc_freq=5))
    ) == canon(strict)


# ---------------------------------------------- round-4 advice guards

def test_empty_texts_never_pair_as_window_overlap(spark):
    """md5('') passes the mod-8 content gate, so without the explicit
    zero-length filter every empty doc would emit the identical empty
    window and all empty docs would pair up as spurious candidates."""
    from atiesh_spark.operators.corpus import window_overlap_pairs

    rows = [(1, ""), (2, ""), (3, ""), (4, "real text here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = window_overlap_pairs(
        df, "doc_id", "text", width=8, stride=8, min_shared=1
    ).collect()
    assert got == []


def test_remove_duplicate_spans_ignores_empty_docs(spark):
    from atiesh_spark.operators.corpus import remove_duplicate_spans

    rows = [(1, ""), (2, ""), (3, "plain unique text")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in remove_duplicate_spans(
        df, "doc_id", "text", width=8, stride=8).collect()}
    assert all(out[i]["n_dup_windows"] == 0 for i in (1, 2, 3))
    assert out[1]["clean_text"] == "" and out[3]["clean_text"] == rows[2][1]


def test_remove_duplicate_spans_shuffle_join_mode_matches_broadcast(spark):
    from atiesh_spark.operators.corpus import remove_duplicate_spans

    copied = "this exact paragraph was copied verbatim between documents!"
    rows = [
        (1, "AAAA " + copied + " BBBB unique tail one"),
        (2, "unique head two " + copied + " CCCC"),
        (3, "entirely original text with no duplication at all in here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def canon(res):
        return sorted(
            (r["doc_id"], r["clean_text"], r["n_dup_windows"], r["chars_removed"])
            for r in res.collect()
        )

    bcast = remove_duplicate_spans(df, "doc_id", "text", width=16, stride=4)
    shuffle = remove_duplicate_spans(
        df, "doc_id", "text", width=16, stride=4, broadcast_keepers=False
    )
    assert canon(bcast) == canon(shuffle)
    # the opt-out really removes the broadcast hint from the keeper join
    assert "broadcast" not in shuffle._jdf.queryExecution().optimizedPlan().toString().lower()


def test_streaming_clean_corpus_matches_batch_line_dedup(spark, tmp_path):
    # Boilerplate emerges ACROSS batches: line "nav" reaches df=2 only
    # in batch 2, so doc 1 (stored clean in batch 1) must be re-cleaned
    # retroactively; line "foot" crosses in batch 3, touching docs 1-4.
    from atiesh_spark.operators.corpus import StreamingCleanCorpus, line_dedup

    rows = [
        (1, "nav\nalpha\nfoot"),
        (2, "beta\ngamma"),
        (3, "nav\ndelta\nfoot"),
        (4, "epsilon\n\nfoot"),
        (5, "zeta"),
        (6, "foot"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    batches = [[1, 2], [3, 4], [5, 6]]

    cc = StreamingCleanCorpus("doc_id", "text", str(tmp_path / "cc"), max_doc_freq=2)
    for i, ids in enumerate(batches):
        cc(df.filter(F.col("doc_id").isin(ids)), i + 1)
    # replay the final batch under the same id: must converge
    cc(df.filter(F.col("doc_id").isin(batches[-1])), len(batches))

    got = sorted(tuple(r) for r in cc.read(spark).collect())
    want = sorted(tuple(r) for r in line_dedup(df, "doc_id", "text", max_doc_freq=2).collect())
    assert got == want
    # sanity on the semantics themselves: nav+foot are boilerplate
    by_id = {t[0]: t for t in got}
    assert by_id[1] == (1, "alpha", 1, 2)
    assert by_id[6] == (6, "", 0, 1)


def test_streaming_clean_corpus_prefix_consistency(spark, tmp_path):
    # After ANY prefix of batches the store equals the batch rebuild
    # over the documents seen so far.
    from atiesh_spark.operators.corpus import StreamingCleanCorpus, line_dedup

    rows = [(i, f"common\nuniq{i}") for i in range(1, 7)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cc = StreamingCleanCorpus("doc_id", "text", str(tmp_path / "cc2"), max_doc_freq=3)
    seen = []
    for b, ids in enumerate([[1, 2], [3], [4, 5, 6]]):
        seen += ids
        cc(df.filter(F.col("doc_id").isin(ids)), b + 1)
        got = sorted(tuple(r) for r in cc.read(spark).collect())
        want = sorted(
            tuple(r)
            for r in line_dedup(
                df.filter(F.col("doc_id").isin(seen)), "doc_id", "text", max_doc_freq=3
            ).collect()
        )
        assert got == want, f"after batch {b + 1}"


def test_intra_doc_line_dedup_rules(spark):
    from atiesh_spark.operators.corpus import intra_doc_line_dedup

    df = spark.createDataFrame(
        [
            # trimmed match removes ' nav ' too; first occurrence's RAW
            # form survives; empty lines are never counted or removed
            (1, "nav\na\n\nnav\nb\n nav \n\na"),
            (2, ""),
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in intra_doc_line_dedup(df, "doc_id", "text").collect()}
    assert got[1]["clean_text"] == "nav\na\n\nb\n"
    assert (got[1]["n_lines_kept"], got[1]["n_lines_removed"]) == (5, 3)
    assert got[2]["clean_text"] == "" and got[2]["n_lines_removed"] == 0
    assert got[3]["clean_text"] == "solo"


def test_intra_doc_line_dedup_is_zero_shuffle(spark):
    from atiesh_spark.operators.corpus import intra_doc_line_dedup

    df = spark.createDataFrame([(1, "a\nb\na")], "doc_id long, text string")
    plan = (
        intra_doc_line_dedup(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, "intra-doc dedup must ride the scan"


def test_sentence_chunks_packing_rules(spark):
    from atiesh_spark.operators.corpus import sentence_chunks

    df = spark.createDataFrame(
        [
            (1, "One two three. Four five! Six seven eight nine? Ten."),
            (2, "A single enormous sentence without any boundary at all"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = sentence_chunks(df, "doc_id", "text", max_chars=25).collect()
    got = {(r["doc_id"], r["chunk_id"]): r for r in rows}
    assert got[(1, 0)]["chunk_text"] == "One two three. Four five!"
    assert got[(1, 0)]["n_sentences"] == 2 and got[(1, 0)]["n_chars"] == 25
    assert got[(1, 1)]["chunk_text"] == "Six seven eight nine?"
    assert got[(1, 2)]["chunk_text"] == "Ten."
    # oversize sentence gets its own chunk, never a mid-sentence cut
    assert got[(2, 0)]["n_chars"] > 25 and got[(2, 0)]["n_sentences"] == 1
    # empty doc yields no chunks
    assert not any(d == 3 for d, _ in got)
    import pytest as _pt

    with _pt.raises(ValueError):
        sentence_chunks(df, "doc_id", "text", max_chars=0)


class TestSpanCorruption:
    def test_t5_shape_hand_checked(self, spark):
        from atiesh_spark.operators.corpus import span_corruption

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta")], "doc_id bigint, text string"
        )
        r = span_corruption(docs, "doc_id", "text", rate_pct=15).collect()[0]
        # structure invariants that hold for ANY mask draw:
        toks = set("alpha beta gamma delta".split())
        inp, tgt = r["input"].split(), r["target"].split()
        k = r["n_spans"]
        # every token appears exactly once across input+target (minus
        # sentinels), input sentinels are 0..k-1, target ends with
        # <extra_id_k>
        sent = {f"<extra_id_{i}>" for i in range(k)}
        assert [t for t in inp if t.startswith("<extra")] == sorted(
            sent, key=lambda s: int(s[10:-1])
        )
        assert tgt[-1] == f"<extra_id_{k}>"
        body = [t for t in inp + tgt if not t.startswith("<extra")]
        assert sorted(body) == sorted(toks)

    def test_nothing_masked(self, spark):
        from atiesh_spark.operators.corpus import span_corruption

        # rate 1%: overwhelmingly likely nothing masks in 3 tokens with
        # this fixed id — pin a known-clean fixture by checking output
        # consistency instead of luck: n_spans == 0 implies original
        # text and the bare closing sentinel.
        docs = spark.createDataFrame(
            [(424242, "x y z")], "doc_id bigint, text string"
        )
        r = span_corruption(docs, "doc_id", "text", rate_pct=1).collect()[0]
        if r["n_spans"] == 0:
            assert r["input"] == "x y z"
            assert r["target"] == "<extra_id_0>"
        else:
            assert r["target"].endswith(f"<extra_id_{r['n_spans']}>")

    def test_empty_doc_dropped(self, spark):
        from atiesh_spark.operators.corpus import span_corruption

        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "   ")], "doc_id bigint, text string"
        )
        out = span_corruption(docs, "doc_id", "text").collect()
        assert {r["doc_id"] for r in out} == {1}

    def test_deterministic_across_runs(self, spark):
        from atiesh_spark.operators.corpus import span_corruption

        docs = spark.createDataFrame(
            [(i, f"tok{j} " * 20) for i, j in enumerate([1, 2, 3])],
            "doc_id bigint, text string",
        )
        a = sorted(map(tuple, span_corruption(
            docs, "doc_id", "text").collect()))
        b = sorted(map(tuple, span_corruption(
            docs.repartition(7), "doc_id", "text").collect()))
        assert a == b

    def test_rate_validation(self, spark):
        import pytest as _pt

        from atiesh_spark.operators.corpus import span_corruption

        docs = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
        with _pt.raises(ValueError, match="rate_pct"):
            span_corruption(docs, "doc_id", "text", rate_pct=0)

    def test_plan_shape_linear_one_keyed_exchange(self, spark):
        from atiesh_spark.operators.corpus import span_corruption

        docs = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id bigint, text string"
        )
        plan = (
            span_corruption(docs, "doc_id", "text")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        # LINEAR build: the fan-out round-robin plus ONE doc-keyed
        # exchange shared by the window and the re-assembly groupBy —
        # a third exchange would mean the groupBy stopped reusing the
        # window's partitioning (and an accumulator-fold rewrite with
        # zero exchanges would reintroduce the O(n^2) string-copy
        # transient on megabyte docs).
        assert plan.count("Exchange") <= 2


class TestVocabGrowth:
    def test_hand_computed_curve(self, spark):
        from atiesh_spark.operators.corpus import vocab_growth

        # Ids chosen so every doc lands in a known tranche is fragile
        # (md5); instead verify the INVARIANTS that define the curve:
        # monotone non-decreasing, final row = exact corpus totals.
        docs = spark.createDataFrame(
            [(i, "alpha beta " + f"uniq{i}") for i in range(20)],
            "doc_id bigint, text string",
        )
        rows = vocab_growth(docs, "doc_id", "text", tranches=10).collect()
        rows.sort(key=lambda r: r["tranche"])
        assert [r["tranche"] for r in rows] == list(range(10))
        for a, b in zip(rows, rows[1:]):
            assert b["n_docs"] >= a["n_docs"]
            assert b["n_tokens"] >= a["n_tokens"]
            assert b["vocab"] >= a["vocab"]
        last = rows[-1]
        assert last["n_docs"] == 20
        assert last["n_tokens"] == 60
        assert last["vocab"] == 22  # alpha, beta, uniq0..uniq19

    def test_vocab_counts_types_not_tokens(self, spark):
        from atiesh_spark.operators.corpus import vocab_growth

        docs = spark.createDataFrame(
            [(1, "x x x x"), (2, "x y y x")], "doc_id bigint, text string"
        )
        last = sorted(
            vocab_growth(docs, "doc_id", "text", tranches=2).collect(),
            key=lambda r: r["tranche"],
        )[-1]
        assert last["vocab"] == 2 and last["n_tokens"] == 8

    def test_tranche_validation(self, spark):
        import pytest as _pt

        from atiesh_spark.operators.corpus import vocab_growth

        docs = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
        with _pt.raises(ValueError, match="tranches"):
            vocab_growth(docs, "doc_id", "text", tranches=1)


class TestSourceOverlapMatrix:
    def test_hand_computed(self, spark):
        from atiesh_spark.operators.corpus import source_overlap_matrix

        # s1 grams: {a b, b c}; s2 grams: {a b, b d}; s3 grams: {x y}
        docs = spark.createDataFrame(
            [("s1", "a b c"), ("s2", "a b d"), ("s3", "x y")],
            "source string, text string",
        )
        rows = source_overlap_matrix(docs, "text", "source").collect()
        out = {(r["source_1"], r["source_2"]): r for r in rows}
        assert set(out) == {("s1", "s2")}  # s3 shares nothing
        r = out[("s1", "s2")]
        assert (r["n_grams_1"], r["n_grams_2"], r["shared"]) == (2, 2, 1)
        assert r["jaccard"] == round(1 / 3, 4)

    def test_distinct_grams_not_occurrences(self, spark):
        from atiesh_spark.operators.corpus import source_overlap_matrix

        # repeated bigrams inside a source count once
        docs = spark.createDataFrame(
            [("s1", "a b a b a b"), ("s2", "a b")],
            "source string, text string",
        )
        r = source_overlap_matrix(docs, "text", "source").collect()[0]
        # s1 distinct grams: {a b, b a}; s2: {a b}
        assert (r["n_grams_1"], r["n_grams_2"], r["shared"]) == (2, 1, 1)
        assert r["jaccard"] == 0.5

    def test_mirror_sources_jaccard_one(self, spark):
        from atiesh_spark.operators.corpus import source_overlap_matrix

        docs = spark.createDataFrame(
            [("a", "the same mirrored text"), ("b", "the same mirrored text")],
            "source string, text string",
        )
        r = source_overlap_matrix(docs, "text", "source").collect()[0]
        assert r["jaccard"] == 1.0


def test_chunk_documents_null_text_yields_one_empty_chunk(spark):
    """NULL text must behave like empty text — one empty chunk — so no
    document silently disappears from (or NULL-poisons) the chunked
    corpus; the docstring contract is 'every document yields at least
    one chunk'."""
    from atiesh_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "abcd")], "doc_id bigint, text string"
    )
    got = {
        (r["doc_id"], r["chunk_id"]): r
        for r in chunk_documents(df, "doc_id", "text", size=2).collect()
    }
    assert set(got) == {(1, 0), (2, 0), (3, 0), (3, 1)}
    assert got[(1, 0)]["chunk_text"] == ""
    assert got[(1, 0)]["n_chunk_chars"] == 0
    assert got[(3, 1)]["chunk_text"] == "cd"
