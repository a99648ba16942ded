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
