"""BPE tokenizer-induction tests: differential against a pure-Python
reference (same conventions: overlapping pair counts, greedy
left-to-right merges, (count desc, pair asc) argmax tiebreak), plus
plan-shape guards (iteration on the vocab table, never the corpus)."""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest

from atiesh_spark.operators.tokenize import (
    apply_bpe,
    bpe_learn,
    bpe_pair_counts,
    word_freq_table,
)


# ------------------------------------------------------ python reference

def _py_word_freqs(texts):
    freqs = Counter()
    for t in texts:
        for w in re.split(r"\s+", t):
            if w:
                freqs[w] += 1
    return freqs


def _py_pair_counts(word_syms):
    pairs = Counter()
    for syms, n in word_syms:
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += n
    return pairs


def _py_merge(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_bpe_learn(texts, num_merges, min_pair_count=2):
    freqs = _py_word_freqs(texts)
    words = [(list(w), n) for w, n in freqs.items()]
    tokens = sum(len(s) * n for s, n in words)
    merges = []
    for rank in range(num_merges):
        pairs = _py_pair_counts(words)
        if not pairs:
            break
        # argmax with (count desc, a asc, b asc) tiebreak — the engine's
        (a, b), n = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if n < min_pair_count:
            break
        words = [(_py_merge(s, a, b), cnt) for s, cnt in words]
        new_tokens = sum(len(s) * cnt for s, cnt in words)
        merges.append((rank, a, b, n, tokens - new_tokens))
        tokens = new_tokens
    return merges, words


# ---------------------------------------------------------------- tests

def test_word_freq_drops_empty_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "  a b  a \n b\tb "), (2, "")], ["doc_id", "text"]
    )
    got = {r["word"]: r["n_word"] for r in word_freq_table(df, "text").collect()}
    assert got == {"a": 2, "b": 3}


def test_pair_counts_overlapping_convention(spark):
    # "aaa" holds TWO (a,a) pairs — the Sennrich counting convention
    df = spark.createDataFrame([(1, "aaa aaa baa")], ["doc_id", "text"])
    got = {(r["a"], r["b"]): r["n_pairs"] for r in bpe_pair_counts(df, "text").collect()}
    assert got[("a", "a")] == 5
    assert got[("b", "a")] == 1


def test_bpe_learn_gain_vs_pair_count_on_overlap(spark):
    df = spark.createDataFrame([(1, "aaa aaa baa")], ["doc_id", "text"])
    merges, final_words = bpe_learn(df, "text", num_merges=1)
    assert len(merges) == 1
    rank, a, b, n_pairs, gain = merges[0]
    assert (a, b) == ("a", "a") and n_pairs == 5
    # greedy application merges only 3 disjoint occurrences
    assert gain == 3
    final = {r["word"]: r["symbols"] for r in final_words.collect()}
    assert final["aaa"] == ["aa", "a"] and final["baa"] == ["b", "aa"]


def test_bpe_matches_python_reference_random_corpus(spark):
    rng = random.Random(11)
    texts = []
    for _ in range(40):
        words = [
            "".join(rng.choice("abcde") for _ in range(rng.randrange(1, 8)))
            for _ in range(rng.randrange(1, 12))
        ]
        texts.append(" ".join(words))
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])

    ref_merges, ref_words = _py_bpe_learn(texts, num_merges=6)
    got_merges, got_words = bpe_learn(df, "text", num_merges=6)
    assert got_merges == ref_merges

    ref_final = {"".join(_rejoin(s)): s for s, _ in ref_words}
    got_final = {r["word"]: r["symbols"] for r in got_words.collect()}
    for w, syms in got_final.items():
        assert syms == ref_final[w], w


def _rejoin(syms):
    # reference keeps merged symbols as concatenated strings already
    return syms


def test_apply_bpe_round_trips_learned_merges(spark):
    rows = [(1, "low lower lowest low low"), (2, "new newer newest new")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges, final_words = bpe_learn(df, "text", num_merges=4)
    toks = apply_bpe(df, "text", merges)
    got = {r["doc_id"]: r["tokens"] for r in toks.collect()}
    # tokenizing the corpus with the learned merges must reproduce the
    # word table's final symbolization word-by-word
    final = {r["word"]: r["symbols"] for r in final_words.collect()}
    for doc_id, text in rows:
        expect = []
        for w in text.split():
            expect.extend(final[w])
        assert got[doc_id] == expect
    # conservation: sum of gains == total token reduction
    n_chars = sum(len(w) for _, t in rows for w in t.split())
    n_toks = sum(len(v) for v in got.values())
    assert sum(g for *_, g in merges) == n_chars - n_toks


def test_bpe_learn_stops_below_min_pair_count(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], ["doc_id", "text"])
    merges, _ = bpe_learn(df, "text", num_merges=5, min_pair_count=2)
    assert merges == []  # every pair occurs once


def test_bpe_iteration_runs_on_vocab_not_corpus(spark):
    """The corpus shuffle happens ONCE (word_freq_table); each learn
    round plans against the checkpointed vocab frame. Guard: the
    argmax plan over the vocab table contains no scan of the corpus
    (checkpointed RDD scan only)."""
    df = spark.createDataFrame(
        [(i, "xy xz yz xy") for i in range(20)], ["doc_id", "text"]
    )
    words = word_freq_table(df, "text").localCheckpoint()
    plan = words._jdf.queryExecution().executedPlan().toString()
    # after the checkpoint, downstream rounds read "ExistingRDD"/scan of
    # the checkpoint, not the original exchange
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan


def test_bpe_batched_rounds_equal_sequential_on_disjoint_pairs(spark):
    """When the top pairs are symbol-disjoint (no shared symbols, no
    merge creating a new cross-ranking pair), batched learning MUST
    reproduce the sequential merge list exactly — same pairs, same
    order, same counts, same gains — in ~1/m the rounds."""
    rows = [(1, "ab ab ab ab cd cd cd ef ef gh")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    seq, seq_words = bpe_learn(df, "text", num_merges=4, min_pair_count=1)
    log: list = []
    bat, bat_words = bpe_learn(
        df, "text", num_merges=4, min_pair_count=1,
        merges_per_round=4, round_log=log,
    )
    assert bat == seq
    assert len(log) == 1 and log[0][0] == 4  # one round did all four
    assert sorted(map(tuple, bat_words.collect())) == sorted(
        map(tuple, seq_words.collect())
    )


def test_bpe_batched_falls_back_to_sequential_on_conflicts(spark):
    """Chained pairs (a,b)/(b,c) share symbol b: the batch selector must
    refuse to co-apply them, so batched == sequential here too (the
    round just re-counts after applying the winner)."""
    df = spark.createDataFrame([(1, "abc abc abc")], ["doc_id", "text"])
    seq, _ = bpe_learn(df, "text", num_merges=2, min_pair_count=1)
    log: list = []
    bat, _ = bpe_learn(
        df, "text", num_merges=2, min_pair_count=1,
        merges_per_round=2, round_log=log,
    )
    assert bat == seq
    # (a,b) and (b,c) conflict -> round 1 applies one merge only
    assert log[0][0] == 1


def test_bpe_batched_invariants_random_corpus(spark):
    """On an arbitrary corpus batched merge ORDER may diverge from
    sequential (a merge can create a pair that outranks a later batch
    member), but the hard invariants hold at any m: distinct merges,
    positive exact gains, token conservation, and the learned list
    tokenizes the corpus to exactly the final word table."""
    rng = random.Random(7)
    texts = [
        " ".join(
            "".join(rng.choice("abcd") for _ in range(rng.randrange(1, 7)))
            for _ in range(rng.randrange(1, 10))
        )
        for _ in range(30)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    log: list = []
    merges, final_words = bpe_learn(
        df, "text", num_merges=8, merges_per_round=4, round_log=log,
    )
    assert len(merges) == 8
    assert [m[0] for m in merges] == list(range(8))
    assert len({(a, b) for _, a, b, _, _ in merges}) == 8
    assert all(n > 0 and g > 0 for _, _, _, n, g in merges)
    assert len(log) < 8 and sum(n for n, _ in log) == 8

    # conservation: gains exactly account for the corpus token reduction
    freqs = _py_word_freqs(texts)
    t0 = sum(len(w) * n for w, n in freqs.items())
    final = {r["word"]: r["symbols"] for r in final_words.collect()}
    t1 = sum(len(final[w]) * n for w, n in freqs.items())
    assert sum(g for *_, g in merges) == t0 - t1

    # the merge list IS the tokenizer that produced final_words
    for w, n in freqs.items():
        syms = list(w)
        for _, a, b, _, _ in merges:
            syms = _py_merge(syms, a, b)
        assert syms == final[w], w


def test_select_disjoint_flags_recreated_symbols():
    from atiesh_spark.operators.tokenize import _select_disjoint

    cands = [
        {"a": "ab", "b": "c", "n_pairs": 9},   # recreates existing "abc"
        {"a": "x", "b": "y", "n_pairs": 8},
        {"a": "y", "b": "z", "n_pairs": 7},    # conflicts with (x, y)
        {"a": "p", "b": "q", "n_pairs": 6},
    ]
    sel, pre = _select_disjoint(cands, want=3, created={"abc"})
    assert sel == [("ab", "c", 9), ("x", "y", 8), ("p", "q", 6)]
    assert pre == ["abc"]


def test_apply_bpe_batched_matches_inplan(spark):
    """The Arrow-batched tokenizer must agree with the codegen fold on
    every document — including empty text, pure whitespace, and
    self-overlapping merge targets ("aaa" with (a,a) -> ["aa","a"])."""
    from atiesh_spark.operators.tokenize import apply_bpe_batched

    rows = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new"),
        (3, "aaa aaaa baaab"),
        (4, ""),
        (5, "   "),
        (6, "solo"),
        (7, None),               # NULL text -> NULL tokens on BOTH paths
        (8, "ab\u00a0ab cd"),    # U+00A0 is NOT ASCII \s: stays inside the word
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges, _ = bpe_learn(
        df.filter("doc_id <= 3"), "text", num_merges=5, min_pair_count=1
    )
    assert merges  # the corpus above must actually learn something
    both = apply_bpe_batched(
        apply_bpe(df, "text", merges, out_col="inplan"),
        "text",
        merges,
        out_col="batched",
    )
    for r in both.collect():
        assert r["batched"] == r["inplan"], r["doc_id"]


# ------------------------------------------------------------ unigram LM

def test_viterbi_prefers_high_prob_long_pieces():
    from atiesh_spark.operators.tokenize import _viterbi

    table = {"ab": -1.0, "a": -2.0, "b": -2.0, "c": -2.0}
    assert _viterbi("abc", table, 4) == ["ab", "c"]
    # unseen char falls back to a single-char UNK piece
    assert _viterbi("axb", table, 4) == ["a", "x", "b"]
    # ties are deterministic
    t2 = {"aa": -2.0, "a": -1.0}
    assert _viterbi("aaaa", t2, 4) == _viterbi("aaaa", t2, 4)


def test_viterbi_matches_exhaustive_enumeration():
    """Brute-force differential: for random piece tables and words up
    to 9 chars, enumerate every segmentation (2^(n-1)) and verify the
    dp returns one attaining the maximum (total logp, fewer pieces)
    objective — and exactly the unique argmax when no tie exists.
    Covers UNK fallbacks, max_len cutoffs, and piece overlaps the
    hand-built cases can't reach."""
    import random

    from atiesh_spark.operators.tokenize import _UNK_LOGP, _viterbi

    rng = random.Random(2018)
    alphabet = "abc"
    for _ in range(300):
        pieces = {"".join(rng.choice(alphabet)
                          for _ in range(rng.randint(1, 3)))
                  for _ in range(rng.randint(2, 8))}
        table = {p: round(rng.uniform(-5, -0.1), 6) for p in pieces}
        max_len = rng.randint(1, 4)
        w = "".join(rng.choice(alphabet + "x")
                    for _ in range(rng.randint(1, 9)))

        def seg_score(seg):
            total = 0.0
            for p in seg:
                lp = table.get(p)
                if lp is None:
                    if len(p) != 1:
                        return None
                    lp = _UNK_LOGP
                if len(p) > max_len:
                    return None
                total += lp
            return (total, -len(seg))

        n = len(w)
        best, best_segs = None, []
        for mask in range(1 << max(n - 1, 0)):
            cuts = [0] + [i for i in range(1, n)
                          if mask >> (i - 1) & 1] + [n]
            seg = [w[cuts[i]:cuts[i + 1]] for i in range(len(cuts) - 1)]
            sc = seg_score(seg)
            if sc is None:
                continue
            if best is None or sc > best:
                best, best_segs = sc, [seg]
            elif sc == best:
                best_segs.append(seg)

        got = _viterbi(w, table, max_len)
        assert seg_score(got) == best, (w, table, max_len, got)
        if len(best_segs) == 1:
            assert got == best_segs[0], (w, table, max_len)


def test_unigram_learn_invariants(spark):
    import math

    from atiesh_spark.operators.tokenize import unigram_learn

    docs = spark.createDataFrame(
        [("hello world",), ("hello there world",), ("hello hello",)] * 5,
        "text string",
    )
    pieces = unigram_learn(
        docs, "text", target_vocab=16, em_rounds=2, max_piece_len=6,
        seed_size=64,
    )
    table = dict(pieces)
    # every corpus character is representable
    corpus_chars = set("helloworldthere")
    assert corpus_chars <= {p for p in table if len(p) == 1}
    assert len(table) <= 16
    assert abs(sum(math.exp(lp) for lp in table.values()) - 1.0) < 1e-9
    # the dominant word becomes a single piece
    assert "hello" in table
    # deterministic refit
    again = unigram_learn(
        docs, "text", target_vocab=16, em_rounds=2, max_piece_len=6,
        seed_size=64,
    )
    assert pieces == again


def test_unigram_tokenize_reconstructs_and_compresses(spark):
    from atiesh_spark.operators.tokenize import (
        unigram_learn,
        unigram_tokenize,
    )

    from pyspark.sql import functions as F

    rows = [("hello world",), ("the quick brown fox hello",), (None,)]
    docs = spark.createDataFrame(rows * 3, "text string")
    pieces = unigram_learn(
        docs.filter(F.col("text").isNotNull()),
        "text",
        target_vocab=24,
        em_rounds=2,
        max_piece_len=6,
        seed_size=96,
    )
    out = unigram_tokenize(docs, "text", pieces, max_piece_len=6).collect()
    import re

    for r in out:
        if r["text"] is None:
            assert r["tokens"] is None
            continue
        assert "".join(r["tokens"]) == re.sub(r"\s+", "", r["text"], flags=re.ASCII)
    # the learned tokenizer genuinely compresses vs characters
    n_tok = sum(len(r["tokens"]) for r in out if r["tokens"] is not None)
    n_chr = sum(
        len(re.sub(r"\s+", "", r["text"]))
        for r in out
        if r["text"] is not None
    )
    assert n_tok < n_chr


def test_unigram_tokenize_matches_learn_segmentation(spark):
    """Apply-side Viterbi == learn-side Viterbi (shared _viterbi, same
    tie-breaks): segmenting the training words through the public
    tokenizer gives the exact pieces the last E-step counted."""
    from atiesh_spark.operators.tokenize import (
        _viterbi,
        unigram_learn,
        unigram_tokenize,
    )

    docs = spark.createDataFrame(
        [("abc abd abe",), ("abc abc xyz",)] * 4, "text string"
    )
    pieces = unigram_learn(
        docs, "text", target_vocab=12, em_rounds=2, max_piece_len=4,
        seed_size=48,
    )
    table = dict(pieces)
    out = unigram_tokenize(docs, "text", pieces, max_piece_len=4).collect()
    for r in out:
        want = [
            p
            for w in r["text"].split()
            for p in _viterbi(w, table, 4)
        ]
        assert list(r["tokens"]) == want


def test_unigram_learn_validates_args(spark):
    import pytest as _pt

    from atiesh_spark.operators.tokenize import unigram_learn

    docs = spark.createDataFrame([("x",)], "text string")
    with _pt.raises(ValueError, match=">= 1"):
        unigram_learn(docs, "text", target_vocab=0)
    with _pt.raises(ValueError, match="seed_size"):
        unigram_learn(docs, "text", target_vocab=64, seed_size=32)


def test_wordpiece_learn_likelihood_scoring(spark):
    # frequency would merge the commonest pair; likelihood must prefer
    # the pair that co-occurs more than its parts predict.
    from atiesh_spark.operators.tokenize import wordpiece_learn

    # 'xy' always co-occur (score 1/(4*4)=1/16); 'aa' pairs are common
    # but 'a' is everywhere (score 8/(20*20)=1/50)
    text = " ".join(["xy"] * 4 + ["aa"] * 8 + ["ab"] * 4)
    df = spark.createDataFrame([(text,)], "t string")
    merges, vocab = wordpiece_learn(df, "t", num_merges=1, min_pair_count=2)
    assert (merges[0][1], merges[0][2]) == ("x", "##y")
    # seed chars all present even when fully merged away
    assert "x" in vocab and "##y" in vocab and "xy" in vocab


def test_wordpiece_tokenize_longest_match_and_unk(spark):
    from atiesh_spark.operators.tokenize import wordpiece_tokenize

    vocab = ["l", "##o", "##w", "lo", "##west", "n"]
    df = spark.createDataFrame(
        [(1, "low lowest lowq now"), (2, None)], "id long, t string"
    )
    got = {r["id"]: r["tokens"] for r in wordpiece_tokenize(df, "t", vocab).collect()}
    # longest-match-first: 'lo'+'##w', 'lo'+'##west'; 'q' unmatched ->
    # whole word UNK (BERT rule); 'now' -> n + ##o + ##w
    assert got[1] == ["lo", "##w", "lo", "##west", "[UNK]", "n", "##o", "##w"]
    assert got[2] is None


def test_wordpiece_roundtrip_on_training_corpus(spark):
    from atiesh_spark.operators.tokenize import (
        wordpiece_learn,
        wordpiece_tokenize,
    )

    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("the cat ran",)], "t string"
    )
    merges, vocab = wordpiece_learn(df, "t", num_merges=6, min_pair_count=2)
    toks = wordpiece_tokenize(df, "t", vocab).collect()
    for r in toks:
        rebuilt = "".join(p[2:] if p.startswith("##") else p for p in r["tokens"])
        assert rebuilt == r["t"].replace(" ", "")
        assert "[UNK]" not in r["tokens"]
