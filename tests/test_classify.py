"""Naive Bayes classifier tests: differential against a pure-Python
reference (same smoothing, same open-vocabulary V+1 convention), plus
contract checks (NULL-label exclusion, empty/OOV docs, deterministic
tiebreak) and a plan guard (the model joins broadcast; the corpus-side
stream shuffles only by doc)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pytest

from atiesh_spark.operators.classify import nb_predict, nb_train


def _py_nb(train, test, s=1.0):
    """train/test: list of (id, text, label) / (id, text)."""
    counts: dict[str, Counter] = defaultdict(Counter)
    ndocs = Counter()
    for _, text, label in train:
        ndocs[label] += 1
        for t in re.split(r"\s+", text):
            if t:
                counts[label][t] += 1
    vocab = {t for c in counts.values() for t in c}
    v = len(vocab)
    total = sum(ndocs.values())
    out = {}
    for i, text in test:
        scores = {}
        for label in sorted(ndocs):
            ct = sum(counts[label].values())
            sc = math.log(ndocs[label] / total)
            for t in re.split(r"\s+", text):
                if t:
                    sc += math.log(
                        (counts[label][t] + s) / (ct + s * (v + 1))
                    )
            scores[label] = round(sc, 6)
        # tiebreak: highest score, then FIRST label in sorted order
        best = sorted(ndocs, key=lambda l: (-scores[l], l))[0]
        out[i] = (best, scores[best])
    return out


TRAIN = [
    (1, "spam buy now buy cheap", "s"),
    (2, "buy cheap spam spam offer", "s"),
    (3, "hello dear friend meeting", "h"),
    (4, "dear meeting tomorrow notes hello", "h"),
    (5, "offer now spam", "s"),
]
TEST = [
    (10, "buy spam offer"),
    (11, "dear hello notes"),
    (12, "now meeting"),
    (13, ""),
    (14, "totally unseen tokens"),
]


@pytest.fixture(scope="module")
def model(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string, label string")
    return nb_train(train, "label", "text")


def test_nb_matches_python_reference(spark, model):
    classes, dim = model
    test = spark.createDataFrame(TEST, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["pred_label"], r["log_score"])
        for r in nb_predict(test, classes, dim, "doc_id", "text").collect()
    }
    want = _py_nb([t for t in TRAIN], TEST)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-5)


def test_nb_null_labels_excluded_and_priors(spark):
    rows = TRAIN + [(6, "spam spam spam", None)]
    train = spark.createDataFrame(rows, "doc_id long, text string, label string")
    classes, _ = nb_train(train, "label", "text")
    got = {r["label"]: r for r in classes.collect()}
    assert set(got) == {"s", "h"}  # NULL row taught nothing
    assert got["s"]["n_docs"] == 3 and got["h"]["n_docs"] == 2
    assert got["s"]["log_prior"] == pytest.approx(math.log(3 / 5))
    assert got["s"]["class_idx"] == 1 and got["h"]["class_idx"] == 0


def test_nb_empty_and_oov_docs_get_prior_argmax(spark, model):
    classes, dim = model
    test = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "zz qq")], "doc_id long, text string"
    )
    preds = {
        r["doc_id"]: r["pred_label"]
        for r in nb_predict(test, classes, dim, "doc_id", "text").collect()
    }
    assert len(preds) == 3
    # s has prior 3/5 > h: empty docs classify s; OOV-only docs add
    # identical defaults per token so the prior still decides
    assert preds[1] == "s" and preds[2] == "s"
    assert preds[3] == "s"


def test_nb_smoothing_validation(spark):
    df = spark.createDataFrame([(1, "a", "x")], "doc_id long, text string, label string")
    with pytest.raises(ValueError):
        nb_train(df, "label", "text", smoothing=0.0)


def test_nb_model_broadcast_in_predict_plan(spark, model):
    classes, dim = model
    test = spark.createDataFrame(TEST, "doc_id long, text string")
    plan = (
        nb_predict(test, classes, dim, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # no sort-merge join of the corpus against the model
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------- sweep

def _py_sweep(pairs):
    """pairs: list of (score, label01). Returns {threshold: (n_pred,
    tp, prec, rec, f1)} plus the rank AUC — brute force, one pass per
    threshold."""
    p_all = sum(l for _, l in pairs)
    out = {}
    for t in sorted({s for s, _ in pairs}):
        pred = [(s, l) for s, l in pairs if s >= t]
        tp = sum(l for _, l in pred)
        out[t] = (
            len(pred),
            tp,
            tp / len(pred),
            tp / p_all,
            2.0 * tp / (len(pred) + p_all),
        )
    pos = [s for s, l in pairs if l]
    neg = [s for s, l in pairs if not l]
    auc = None
    if pos and neg:
        wins = sum(
            1.0 if p > n else 0.5 if p == n else 0.0
            for p in pos
            for n in neg
        )
        auc = wins / (len(pos) * len(neg))
    return out, auc


def test_threshold_sweep_matches_bruteforce(spark):
    from atiesh_spark.operators.classify import threshold_sweep

    pairs = [(0.9, 1), (0.8, 1), (0.8, 0), (0.4, 1), (0.3, 0)]
    df = spark.createDataFrame(pairs, "score double, label int")
    rows = {
        r["threshold"]: r for r in threshold_sweep(df, "score", "label").collect()
    }
    want, auc = _py_sweep(pairs)
    assert set(rows) == set(want)
    for t, (n_pred, tp, prec, rec, f1) in want.items():
        r = rows[t]
        assert (r["n_pred"], r["tp"]) == (n_pred, tp)
        assert r["prec"] == pytest.approx(prec)
        assert r["rec"] == pytest.approx(rec)
        assert r["f1"] == pytest.approx(f1)
        assert r["auc"] == pytest.approx(auc)


def test_threshold_sweep_random_differential(spark):
    import random

    from atiesh_spark.operators.classify import threshold_sweep

    rng = random.Random(7)
    # deliberate ties: scores on a coarse grid
    pairs = [
        (rng.randrange(20) / 10.0, rng.randrange(2)) for _ in range(300)
    ]
    df = spark.createDataFrame(pairs, "score double, label int")
    rows = {
        r["threshold"]: r for r in threshold_sweep(df, "score", "label").collect()
    }
    want, auc = _py_sweep(pairs)
    assert set(rows) == set(want)
    for t, (n_pred, tp, prec, rec, f1) in want.items():
        assert (rows[t]["n_pred"], rows[t]["tp"]) == (n_pred, tp)
        assert rows[t]["f1"] == pytest.approx(f1)
        assert rows[t]["auc"] == pytest.approx(auc)


def test_threshold_sweep_single_class_auc_null(spark):
    from atiesh_spark.operators.classify import threshold_sweep

    df = spark.createDataFrame(
        [(0.5, 1), (0.7, 1)], "score double, label int"
    )
    rows = threshold_sweep(df, "score", "label").collect()
    assert all(r["auc"] is None for r in rows)
    assert all(r["rec"] is not None for r in rows)


def test_threshold_sweep_null_rows_excluded(spark):
    from atiesh_spark.operators.classify import threshold_sweep

    df = spark.createDataFrame(
        [(0.9, 1), (None, 1), (0.2, None), (0.2, 0)],
        "score double, label int",
    )
    rows = {r["threshold"]: r for r in threshold_sweep(df, "score", "label").collect()}
    assert set(rows) == {0.9, 0.2}
    assert rows[0.2]["n_pred"] == 2  # NULL rows contribute nothing


def test_threshold_sweep_binned_bounds_frame(spark):
    import random

    from atiesh_spark.operators.classify import threshold_sweep

    rng = random.Random(11)
    pairs = [(rng.random() * 100.0, rng.randrange(2)) for _ in range(500)]
    df = spark.createDataFrame(pairs, "score double, label int")
    rows = threshold_sweep(df, "score", "label", num_bins=16).collect()
    assert 1 <= len(rows) <= 16
    by_t = sorted(rows, key=lambda r: r["threshold"])
    # lowest threshold predicts everything positive: recall 1, n_pred = N
    assert by_t[0]["n_pred"] == 500
    assert by_t[0]["rec"] == pytest.approx(1.0)
    # counts conserved and monotone as the threshold rises
    preds = [r["n_pred"] for r in by_t]
    assert preds == sorted(preds, reverse=True)
    # binned AUC equals the exact AUC computed on the binned scores
    lo = min(s for s, _ in pairs)
    hi = max(s for s, _ in pairs)
    w = (hi - lo) / 16.0
    binned = [
        (lo + min(int((s - lo) // w), 15) * w, l) for s, l in pairs
    ]
    _, auc = _py_sweep(binned)
    assert rows[0]["auc"] == pytest.approx(auc)


def test_logreg_train_matches_numpy_reference(spark):
    import math

    from atiesh_spark.operators.classify import logreg_score, logreg_train

    # deterministic toy data: y depends on x1, x2 is noise-ish
    rows = []
    for i in range(80):
        x1 = (i % 10) / 10.0
        x2 = ((i * 7) % 13) / 13.0
        y = 1 if x1 > 0.45 else 0
        rows.append((i, float(x1), float(x2), y))
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, y int")
    model = logreg_train(df, ["x1", "x2"], "y", iters=20, lr=1.0)

    # plain-python replica of the exact same GD
    w = [0.0, 0.0]; b = 0.0; n = len(rows)
    for _ in range(20):
        gb = g1 = g2 = 0.0
        for _, x1, x2, y in rows:
            p = 1.0 / (1.0 + math.exp(-(b + w[0] * x1 + w[1] * x2)))
            r = p - y
            gb += r; g1 += r * x1; g2 += r * x2
        b -= 1.0 * gb / n
        w = [w[0] - 1.0 * g1 / n, w[1] - 1.0 * g2 / n]
    assert abs(model["b"] - b) < 1e-9
    assert abs(model["x1"] - w[0]) < 1e-9 and abs(model["x2"] - w[1]) < 1e-9
    assert model["x1"] > 0  # separating feature got positive weight
    assert model["loss"] < math.log(2)  # better than the 0-weight start
    scored = logreg_score(df, model, ["x1", "x2"]).collect()
    hi = [r["p"] for r in scored if r["x1"] > 0.45]
    lo = [r["p"] for r in scored if r["x1"] <= 0.45]
    # the noise feature x2 jitters individual scores, so compare the
    # group means, not the extremes
    assert sum(hi) / len(hi) > sum(lo) / len(lo) + 0.1


def test_logreg_train_contracts(spark):
    import pytest

    from atiesh_spark.operators.classify import logreg_train

    df = spark.createDataFrame(
        [(1.0, 1), (None, 0)], "x1 double, y int"
    )
    with pytest.raises(ValueError, match="NULL"):
        logreg_train(df, ["x1"], "y")
    ok = df.filter("x1 IS NOT NULL")
    with pytest.raises(ValueError):
        logreg_train(ok, [], "y")
    with pytest.raises(ValueError):
        logreg_train(ok, ["x1"], "y", iters=0)
    with pytest.raises(ValueError, match="empty"):
        logreg_train(ok.filter("x1 > 99"), ["x1"], "y")
    # l2 shrinks weights toward zero
    big = spark.createDataFrame(
        [(i, float(i % 2), i % 2) for i in range(40)],
        "id long, x1 double, y int",
    )
    w_plain = logreg_train(big, ["x1"], "y", iters=15, lr=1.0)["x1"]
    w_l2 = logreg_train(big, ["x1"], "y", iters=15, lr=1.0, l2=0.5)["x1"]
    assert 0 < w_l2 < w_plain


def test_hashed_features_shape_and_determinism(spark):
    import pytest

    from atiesh_spark.operators.classify import hashed_features

    df = spark.createDataFrame(
        [(1, "a b c a"), (2, ""), (3, None), (4, "xyz")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in hashed_features(
        df, "doc_id", "text", num_buckets=4).collect()}
    r1 = got[1]
    assert r1["n_tokens"] == 4
    s = sum(r1[f"f{j}"] for j in range(4))
    assert abs(s - 1.0) < 1e-9  # fractions of a bag sum to 1
    # 'a' twice -> its bucket has weight >= 0.5
    assert max(r1[f"f{j}"] for j in range(4)) >= 0.5
    # empty and NULL docs: defined neutral zero vector, not NULLs
    for i in (2, 3):
        assert got[i]["n_tokens"] == 0
        assert all(got[i][f"f{j}"] == 0.0 for j in range(4))
    # deterministic across partitionings
    again = {r["doc_id"]: r for r in hashed_features(
        df.repartition(5), "doc_id", "text", num_buckets=4).collect()}
    assert all(
        got[i][f"f{j}"] == again[i][f"f{j}"] for i in got for j in range(4)
    )
    with pytest.raises(ValueError):
        hashed_features(df, "doc_id", "text", num_buckets=1)


def test_calibration_report_bins_and_ece(spark):
    import pytest

    from atiesh_spark.operators.classify import calibration_report

    # perfectly calibrated in bin 0 (scores .05, labels 5% pos won't
    # divide evenly at this size, use exact fractions): 10 rows at
    # p=0.05 with 1 positive -> avg_label 0.1, gap .05; 10 rows at
    # p=0.95 all positive -> gap .05
    rows = [(0.05, 1 if i == 0 else 0) for i in range(10)] + [
        (0.95, 1) for _ in range(10)
    ]
    df = spark.createDataFrame(rows, "p double, y int")
    got = {r["bin"]: r for r in calibration_report(df, "p", "y").collect()}
    assert set(got) == {0, 9}
    b0, b9 = got[0], got[9]
    assert b0["n"] == 10 and abs(b0["avg_label"] - 0.1) < 1e-6
    assert abs(b0["gap"] - 0.05) < 1e-6
    assert abs(b9["gap"] - 0.05) < 1e-6
    assert abs(b0["ece"] - 0.05) < 1e-6 and b0["ece"] == b9["ece"]
    # boundary scores: 0.1 belongs to bin 1 (left-closed), 1.0 to bin 9
    edge = spark.createDataFrame([(0.1, 0), (1.0, 1)], "p double, y int")
    e = {r["bin"]: r for r in calibration_report(edge, "p", "y").collect()}
    assert set(e) == {1, 9}
    with pytest.raises(ValueError, match="probabilities"):
        calibration_report(
            spark.createDataFrame([(1.5, 1)], "p double, y int"), "p", "y"
        )
    with pytest.raises(ValueError):
        calibration_report(df, "p", "y", bins=1)
    # the model-coupled path: q174's logreg scores feed the report
    from atiesh_spark.operators.classify import (
        hashed_features,
        logreg_score,
        logreg_train,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, ("alpha beta " if i % 2 else "uno dos ") * 3, i % 2)
         for i in range(40)],
        "doc_id long, text string, y int",
    )
    feats = hashed_features(docs, "doc_id", "text", 4).join(
        docs.select("doc_id", "y"), "doc_id"
    )
    model = logreg_train(feats, [f"f{j}" for j in range(4)], "y", iters=15, lr=1.0)
    scored = logreg_score(feats, model, [f"f{j}" for j in range(4)])
    rep = calibration_report(scored, "p", "y").collect()
    assert sum(r["n"] for r in rep) == 40
    assert all(0 <= r["ece"] <= 1 for r in rep)


def test_temperature_fit_matches_python_grid_reference(spark):
    """Randomized differential: the whole documented fit — clamp,
    logit, sigmoid at every grid T, mean NLL, argmin with smallest-T
    ties — replayed sequentially on 120 random (score, label) rows
    including exact 0/1 boundary scores; best_t must match exactly
    and the NLLs to their 4dp rounding."""
    import math
    import random

    import pytest

    from atiesh_spark.operators.classify import temperature_fit

    rng = random.Random(2017)
    rows = [(rng.random(), float(rng.random() < 0.5)) for _ in range(116)]
    rows += [(0.0, 1.0), (1.0, 0.0), (0.0, 0.0), (1.0, 1.0)]
    grid = [round((i + 1) / 5, 1) for i in range(25)]
    eps = 1e-6

    def nll(t):
        tot = 0.0
        for s, y in rows:
            z = math.log(min(max(s, eps), 1 - eps)
                         / (1 - min(max(s, eps), 1 - eps)))
            p = 1.0 / (1.0 + math.exp(-z / t))
            tot += -(y * math.log(max(p, 1e-12))
                     + (1 - y) * math.log(max(1 - p, 1e-12)))
        return tot / len(rows)

    curve = [(nll(t), t) for t in grid]
    best_t = min(curve, key=lambda p: (p[0], p[1]))[1]

    df = spark.createDataFrame(rows, "p double, y double")
    r = temperature_fit(df, "p", "y").collect()[0]
    assert r["best_t"] == best_t
    assert r["nll_uncal"] == pytest.approx(round(nll(1.0), 4), abs=1e-4)
    assert r["nll_cal"] == pytest.approx(round(nll(best_t), 4), abs=1e-4)


def test_temperature_fit_recovers_planted_temperature(spark):
    import math

    import pytest

    from atiesh_spark.operators.classify import temperature_fit

    # labels drawn (deterministically) from sigmoid(z), scores reported
    # OVERCONFIDENTLY as sigmoid(2z): the fix should pick T ~ 2 and
    # improve both NLL and ECE
    rows = []
    for i in range(400):
        z = (i % 21 - 10) / 2.5          # true logits in [-4, 4]
        p_true = 1 / (1 + math.exp(-z))
        y = 1 if ((i * 7919) % 1000) / 1000.0 < p_true else 0
        p_over = 1 / (1 + math.exp(-2 * z))
        rows.append((float(p_over), y))
    df = spark.createDataFrame(rows, "p double, y int")
    r = temperature_fit(df, "p", "y").collect()[0]
    assert 1.4 <= r["best_t"] <= 2.8
    assert r["nll_cal"] <= r["nll_uncal"]
    assert r["ece_cal"] <= r["ece_uncal"]
    with pytest.raises(ValueError):
        temperature_fit(df, "p", "y", grid=[0.0, 1.0])
    with pytest.raises(ValueError):
        temperature_fit(df, "p", "y", bins=1)
