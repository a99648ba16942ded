"""corpus_bleu / corpus_chrf (operators/evaluate.py) against
hand-computed Papineni-2002 / Popović-2015 values."""

import math

import pytest
from pyspark.sql import functions as F

from atiesh_spark.operators.evaluate import corpus_bleu, corpus_chrf


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "pair_id bigint, grp string, cand string, ref string"
    )


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_corpus_bleu_matches_python_reference_random_corpus(spark):
    """Randomized differential against a sequential implementation of
    the documented corpus BLEU (Papineni aggregation, add-one
    smoothing for n >= 2, sacrebleu one-sided convention, bp edge
    cases) on 40 random pairs across 3 groups with empty sides and
    tiny-vocab overlap — the gram explode/clip/grid pipeline must
    reproduce every reported column."""
    import random
    from collections import Counter

    rng = random.Random(2002)
    vocab = ["the", "cat", "sat", "on", "mat", "a"]

    def sent():
        if rng.random() < 0.1:
            return ""
        return " ".join(rng.choice(vocab)
                        for _ in range(rng.randint(1, 10)))

    rows = [(i, f"g{i % 3}", sent(), sent()) for i in range(40)]
    max_n = 4

    def grams(toks, n):
        return [" ".join(toks[i:i + n])
                for i in range(len(toks) - n + 1)]

    want = {}
    for g in {r[1] for r in rows}:
        grp_rows = [r for r in rows if r[1] == g]
        clipped = [0] * (max_n + 1)
        ctot = [0] * (max_n + 1)
        rtot = [0] * (max_n + 1)
        n_pairs = 0
        for _, _, cand, ref in grp_rows:
            ct, rt = cand.split(), ref.split()
            if ct or rt:
                n_pairs += 1
            for n in range(1, max_n + 1):
                cg, rg = Counter(grams(ct, n)), Counter(grams(rt, n))
                clipped[n] += sum(min(c, rg[t]) for t, c in cg.items())
                ctot[n] += sum(cg.values())
                rtot[n] += sum(rg.values())
        p = [None] * (max_n + 1)
        p[1] = clipped[1] / ctot[1] if ctot[1] > 0 else 0.0
        for n in range(2, max_n + 1):
            p[n] = (clipped[n] + 1) / (ctot[n] + 1)
        c_len, r_len = ctot[1], rtot[1]
        if c_len >= r_len:
            bp = 1.0
        elif c_len > 0:
            bp = math.exp(1.0 - r_len / c_len)
        else:
            bp = 0.0
        if clipped[1] == 0:
            bleu = 0.0
        else:
            bleu = bp * math.exp(
                sum(math.log(p[n]) for n in range(1, max_n + 1)) / max_n
            )
        want[g] = {
            "n_pairs": n_pairs, "c_len": c_len, "r_len": r_len,
            "bp": round(bp, 4), "bleu": round(bleu, 4),
            **{f"p{n}": round(p[n], 4) for n in range(1, max_n + 1)},
        }

    got = {r["grp"]: r.asDict()
           for r in corpus_bleu(_pairs(spark, rows),
                                "pair_id", "cand", "ref", "grp").collect()}
    assert set(got) == set(want)
    for g in want:
        for field, val in want[g].items():
            assert got[g][field] == pytest.approx(val, abs=2e-4), (g, field)


def test_corpus_chrf_matches_python_reference_random_corpus(spark):
    """Randomized differential for chrF2: whitespace-stripped char
    1-6-grams, per-pair clipping summed per group, the effective-order
    filter, arithmetic P/R means and the beta=2 F combination — a
    sequential implementation must reproduce every reported column."""
    import random
    import re
    from collections import Counter

    rng = random.Random(2015)
    vocab = ["the", "cat", "sät", "on", "mat", "a"]

    def sent():
        if rng.random() < 0.12:
            return ""
        return " ".join(rng.choice(vocab)
                        for _ in range(rng.randint(1, 6)))

    rows = [(i, f"g{i % 3}", sent(), sent()) for i in range(40)]
    max_n, beta = 6, 2.0

    def grams(s, n):
        return [s[i:i + n] for i in range(len(s) - n + 1)]

    want = {}
    for g in {r[1] for r in rows}:
        grp_rows = [r for r in rows if r[1] == g]
        per_n = {}
        for n in range(1, max_n + 1):
            clipped = ctot = rtot = n_pairs = 0
            for _, _, cand, ref in grp_rows:
                cs = re.sub(r"\s+", "", cand)
                rs = re.sub(r"\s+", "", ref)
                cg, rg = Counter(grams(cs, n)), Counter(grams(rs, n))
                if cg or rg:
                    n_pairs += 1
                clipped += sum(min(c, rg[t]) for t, c in cg.items())
                ctot += sum(cg.values())
                rtot += sum(rg.values())
            if ctot > 0 and rtot > 0:  # effective-order filter
                per_n[n] = (clipped, ctot, rtot, n_pairs)
        p = sum(c / ct for c, ct, _, _ in per_n.values()) / len(per_n)
        r_ = sum(c / rt for c, _, rt, _ in per_n.values()) / len(per_n)
        b2 = beta * beta
        chrf = (0.0 if p == 0 and r_ == 0
                else (1 + b2) * p * r_ / (b2 * p + r_))
        want[g] = {
            "n_pairs": max(np for _, _, _, np in per_n.values()),
            "chr_p": round(p, 4), "chr_r": round(r_, 4),
            "chrf": round(chrf, 4),
        }

    got = {r["grp"]: r.asDict()
           for r in corpus_chrf(_pairs(spark, rows),
                                "pair_id", "cand", "ref", "grp").collect()}
    assert set(got) == set(want)
    for g in want:
        for field, val in want[g].items():
            assert got[g][field] == pytest.approx(val, abs=2e-4), (g, field)


def test_corpus_rouge_n_matches_python_reference_random_corpus(spark):
    """Randomized differential for the per-pair kernel path (ROUGE
    passes keep_one_sided=False and rounds BEFORE summing): a
    sequential Lin-2004 implementation must reproduce n_pairs and the
    summed 4dp precision/recall/F1 per group, including the
    both-sides-must-have-grams exclusion."""
    import random
    from collections import Counter

    from atiesh_spark.operators.evaluate import corpus_rouge_n

    rng = random.Random(2004)
    vocab = ["the", "cat", "sat", "on", "mat"]

    def sent():
        return " ".join(rng.choice(vocab)
                        for _ in range(rng.randint(0, 5)))

    rows = [(i, f"g{i % 2}", sent(), sent()) for i in range(40)]
    n = 2

    def grams(toks):
        return Counter(" ".join(toks[i:i + n])
                       for i in range(len(toks) - n + 1))

    want = {}
    for g in {r[1] for r in rows}:
        n_pairs = 0
        sp = sr = sf = 0.0
        for _, _, cand, ref in (r for r in rows if r[1] == g):
            cg, rg = grams(cand.split()), grams(ref.split())
            ct, rt = sum(cg.values()), sum(rg.values())
            if ct == 0 or rt == 0:
                continue
            n_pairs += 1
            clip = sum(min(c, rg[t]) for t, c in cg.items())
            p, r_ = clip / ct, clip / rt
            f1 = 2 * p * r_ / (p + r_) if clip > 0 else 0.0
            sp += round(p, 4)
            sr += round(r_, 4)
            sf += round(f1, 4)
        want[g] = (n_pairs, round(sp, 4), round(sr, 4), round(sf, 4))

    got = {
        r["grp"]: (r["n_pairs"], r["sum_p"], r["sum_r"], r["sum_f1"])
        for r in corpus_rouge_n(_pairs(spark, rows),
                                "pair_id", "cand", "ref", "grp",
                                n=n).collect()
    }
    for g in want:
        assert got[g][0] == want[g][0], g
        for gi, wi in zip(got[g][1:], want[g][1:]):
            assert gi == pytest.approx(wi, abs=2e-4), g


class TestCorpusBleu:
    def test_hand_computed_single_pair(self, spark):
        # cand unigrams clipped 5/6; bigrams 3/5 -> (3+1)/(5+1);
        # trigram overlap only "on the mat" -> (1+1)/(4+1);
        # no 4-gram overlap -> (0+1)/(3+1). c_len = r_len = 6 -> bp 1.
        df = corpus_bleu(
            _pairs(spark, [(1, "g", "the cat sat on the mat",
                            "the cat is on the mat")]),
            "pair_id", "cand", "ref", "grp",
        )
        r = _one(df)
        assert (r["n_pairs"], r["c_len"], r["r_len"]) == (1, 6, 6)
        assert r["bp"] == 1.0
        assert r["p1"] == round(5 / 6, 4)
        assert r["p2"] == round(4 / 6, 4)
        assert r["p3"] == round(2 / 5, 4)
        assert r["p4"] == round(1 / 4, 4)
        expected = math.exp(
            (math.log(5 / 6) + math.log(4 / 6)
             + math.log(2 / 5) + math.log(1 / 4)) / 4
        )
        assert r["bleu"] == pytest.approx(round(expected, 4), abs=1e-9)

    def test_identical_is_one(self, spark):
        r = _one(corpus_bleu(
            _pairs(spark, [(1, "g", "a b c d e", "a b c d e")]),
            "pair_id", "cand", "ref", "grp",
        ))
        assert (r["p1"], r["p2"], r["p3"], r["p4"]) == (1.0, 1.0, 1.0, 1.0)
        assert r["bleu"] == 1.0

    def test_short_text_grid_completion(self, spark):
        # Two-word texts have no 3-/4-grams anywhere in the group: the
        # (group, n) grid must fill those orders with the smoothed
        # (0+1)/(0+1) = 1, not NULL-poison the log mean.
        r = _one(corpus_bleu(
            _pairs(spark, [(1, "g", "a b", "a b")]),
            "pair_id", "cand", "ref", "grp",
        ))
        assert (r["p3"], r["p4"]) == (1.0, 1.0)
        assert r["bleu"] == 1.0

    def test_no_unigram_overlap_scores_zero(self, spark):
        r = _one(corpus_bleu(
            _pairs(spark, [(1, "g", "x y z", "a b c")]),
            "pair_id", "cand", "ref", "grp",
        ))
        assert r["p1"] == 0.0
        assert r["bleu"] == 0.0

    def test_brevity_penalty(self, spark):
        # cand 2 tokens vs ref 4 -> bp = exp(1 - 4/2) = exp(-1).
        r = _one(corpus_bleu(
            _pairs(spark, [(1, "g", "a b", "a b a b")]),
            "pair_id", "cand", "ref", "grp",
        ))
        assert r["bp"] == round(math.exp(-1), 4)

    def test_corpus_pools_counts_per_group(self, spark):
        # Corpus BLEU sums counts over the group BEFORE the ratio:
        # p1 = (2 + 0) / (2 + 2) = 0.5, NOT mean(1, 0) of per-pair
        # scores.
        df = corpus_bleu(
            _pairs(spark, [(1, "g", "a b", "a b"),
                           (2, "g", "x y", "p q")]),
            "pair_id", "cand", "ref", "grp",
        )
        assert _one(df)["p1"] == 0.5

    def test_groups_are_independent(self, spark):
        df = corpus_bleu(
            _pairs(spark, [(1, "g1", "a b c", "a b c"),
                           (2, "g2", "x y z", "p q r")]),
            "pair_id", "cand", "ref", "grp",
        )
        got = {r["grp"]: r["bleu"] for r in df.collect()}
        assert got == {"g1": 1.0, "g2": 0.0}


class TestCorpusChrf:
    def test_identical_is_one(self, spark):
        r = _one(corpus_chrf(
            _pairs(spark, [(1, "g", "abcdef gh", "abcdef gh")]),
            "pair_id", "cand", "ref", "grp",
        ))
        assert (r["chr_p"], r["chr_r"], r["chrf"]) == (1.0, 1.0, 1.0)

    def test_hand_computed(self, spark):
        # 'abc' vs 'abd': n=1 -> 2/3 both sides; n=2 ('ab','bc' vs
        # 'ab','bd') -> 1/2; n=3 -> 0/1. Effective orders 1..3, so
        # P = R = (2/3 + 1/2 + 0) / 3, and F-beta with P == R is P.
        r = _one(corpus_chrf(
            _pairs(spark, [(1, "g", "abc", "abd")]),
            "pair_id", "cand", "ref", "grp",
        ))
        expected = round((2 / 3 + 1 / 2 + 0) / 3, 4)
        assert r["chr_p"] == expected
        assert r["chr_r"] == expected
        assert r["chrf"] == expected

    def test_whitespace_is_stripped(self, spark):
        # chrF operates on the space-stripped stream: 'a b' == 'ab'.
        r = _one(corpus_chrf(
            _pairs(spark, [(1, "g", "a b", "ab")]),
            "pair_id", "cand", "ref", "grp",
        ))
        assert r["chrf"] == 1.0

    def test_recall_weighting(self, spark):
        # cand 'ab', ref 'abab' (effective orders 1..2 on both sides):
        # P: n1 2/2, n2 1/1 -> 1.0 ; R: n1 2/4, n2 1/3 -> 5/12.
        # chrF2 = 5PR / (4P + R) with beta = 2 leans toward recall.
        r = _one(corpus_chrf(
            _pairs(spark, [(1, "g", "ab", "abab")]),
            "pair_id", "cand", "ref", "grp",
        ))
        p, rr = 1.0, (2 / 4 + 1 / 3) / 2
        assert r["chr_p"] == 1.0
        assert r["chr_r"] == round(rr, 4)
        assert r["chrf"] == round(5 * p * rr / (4 * p + rr), 4)

    def test_zero_overlap(self, spark):
        r = _one(corpus_chrf(
            _pairs(spark, [(1, "g", "aaa", "bbb")]),
            "pair_id", "cand", "ref", "grp",
        ))
        assert (r["chr_p"], r["chr_r"], r["chrf"]) == (0.0, 0.0, 0.0)


def test_plan_one_arrow_kernel_and_bounded_exchanges(spark):
    # The clipped-count kernel is ONE vectorized mapInPandas stage
    # (guide §4.2 — the JVM higher-order-lambda form was measured
    # 8-50x slower on the chrF shape; see operators/evaluate.py).
    # Exactly one Python stage per metric, never a row-at-a-time
    # BatchEvalPython, and a bounded exchange count: kernel output is
    # 6 integer rows per pair, so only the per-(group, n) reduction,
    # the group narrowing and the widening round-robin shuffle. A
    # jump past these bounds means a subtree started recomputing or a
    # join stopped broadcasting.
    pairs = _pairs(spark, [(1, "g", "a b c", "a b d")])
    bleu = corpus_bleu(pairs, "pair_id", "cand", "ref", "grp")
    chrf = corpus_chrf(pairs, "pair_id", "cand", "ref", "grp")
    for df, max_exchanges in ((bleu, 8), (chrf, 5)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInPandas") == 1
        assert "BatchEvalPython" not in plan
        assert plan.count("Exchange") <= max_exchanges
    bleu_plan = bleu._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in bleu_plan  # the (group, n) grid join


class TestCorpusRougeN:
    def test_hand_computed_rouge2(self, spark):
        from atiesh_spark.operators.evaluate import corpus_rouge_n

        # cand "the cat sat on the mat" vs ref "the cat is on the mat":
        # bigram overlap 3 of 5 (cand) / 5 (ref) -> P = R = 0.6,
        # F1 = 0.6.
        df = corpus_rouge_n(
            _pairs(spark, [(1, "g", "the cat sat on the mat",
                            "the cat is on the mat")]),
            "pair_id", "cand", "ref", "grp", n=2,
        )
        r = _one(df)
        assert r["n_pairs"] == 1
        assert (r["sum_p"], r["sum_r"], r["sum_f1"]) == (0.6, 0.6, 0.6)

    def test_sums_are_per_pair_not_pooled(self, spark):
        from atiesh_spark.operators.evaluate import corpus_rouge_n

        # Pair 1 scores F1 = 1.0, pair 2 scores 0.0: ROUGE averages
        # per-pair (sum 1.0 over n_pairs 2), it does NOT pool counts
        # (pooling would give 2/4 = 0.5 precision but a different F1
        # shape on asymmetric pairs).
        df = corpus_rouge_n(
            _pairs(spark, [(1, "g", "a b c", "a b c"),
                           (2, "g", "x y z", "p q r")]),
            "pair_id", "cand", "ref", "grp", n=2,
        )
        r = _one(df)
        assert r["n_pairs"] == 2
        assert r["sum_f1"] == 1.0

    def test_short_pair_excluded(self, spark):
        from atiesh_spark.operators.evaluate import corpus_rouge_n

        # A one-word reference has no bigrams: the pair is excluded
        # (standard empty-reference convention), n_pairs counts only
        # what was scored.
        df = corpus_rouge_n(
            _pairs(spark, [(1, "g", "a b c", "a b c"),
                           (2, "g", "a b", "a")]),
            "pair_id", "cand", "ref", "grp", n=2,
        )
        r = _one(df)
        assert r["n_pairs"] == 1

    def test_zero_overlap_scores_zero(self, spark):
        from atiesh_spark.operators.evaluate import corpus_rouge_n

        r = _one(corpus_rouge_n(
            _pairs(spark, [(1, "g", "a b c", "x y z")]),
            "pair_id", "cand", "ref", "grp", n=2,
        ))
        assert (r["sum_p"], r["sum_r"], r["sum_f1"]) == (0.0, 0.0, 0.0)


class TestEmptySideConvention:
    """keep_one_sided kernel rows: the published corpus aggregation
    (sacrebleu) keeps a candidate facing an empty reference in the
    precision denominators and corpus lengths; ROUGE (per-pair) keeps
    its documented exclusion convention — covered above."""

    def test_bleu_empty_reference_feeds_denominator(self, spark):
        # pair 1 identical (3 tokens), pair 2 candidate "x y" vs empty
        # reference: c_len pools 3+2, r_len pools 3+0, and pair 2's
        # unigrams dilute p1 to 3/5 with clipped 0 (sacrebleu keeps
        # candidate grams in the denominator when the reference lacks
        # that order; the old kernel dropped the pair entirely).
        r = _one(corpus_bleu(
            _pairs(spark, [(1, "g", "a b c", "a b c"),
                           (2, "g", "x y", "")]),
            "pair_id", "cand", "ref", "grp",
        ))
        assert (r["n_pairs"], r["c_len"], r["r_len"]) == (2, 5, 3)
        assert r["bp"] == 1.0  # c_len >= r_len
        assert r["p1"] == round(3 / 5, 4)
        assert r["p2"] == round((2 + 1) / (3 + 1), 4)
        import math
        expected = math.exp(
            (math.log(3 / 5) + math.log(3 / 4)
             + math.log(1.0) + math.log(1.0)) / 4
        )
        assert r["bleu"] == pytest.approx(round(expected, 4), abs=1e-9)

    def test_bleu_all_empty_candidates_is_ansi_safe(self, spark):
        # A group whose every candidate is empty lands c_len = 0: bp
        # is defined 0 (maximal brevity) instead of dividing by zero
        # under ANSI, and bleu scores 0 via clip1 = 0.
        r = _one(corpus_bleu(
            _pairs(spark, [(1, "g", "", "a b")]),
            "pair_id", "cand", "ref", "grp",
        ))
        assert (r["c_len"], r["r_len"]) == (0, 2)
        assert r["bp"] == 0.0
        assert r["bleu"] == 0.0

    def test_chrf_empty_reference_feeds_precision_denominator(self, spark):
        # pair 1: cand/ref both "ab"; pair 2: cand "cd", empty ref.
        # Effective orders are n = 1, 2 (two-char strings). Precision
        # pools pair 2's chars into the denominator: p = avg(2/4, 1/2)
        # = 0.5; recall sees only pair 1's reference grams: r =
        # avg(2/2, 1/1) = 1.0; chrF2 = 5*p*r / (4p + r).
        r = _one(corpus_chrf(
            _pairs(spark, [(1, "g", "ab", "ab"),
                           (2, "g", "cd", "")]),
            "pair_id", "cand", "ref", "grp",
        ))
        assert r["chr_p"] == 0.5
        assert r["chr_r"] == 1.0
        assert r["chrf"] == round(5 * 0.5 * 1.0 / (4 * 0.5 + 1.0), 4)
