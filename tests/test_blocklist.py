"""Blocklist filtering tests: both engines differential-tested against
each other AND against naive Python containment (overlapping patterns,
shared prefixes/suffixes, case folding, NULL text), plus the auto
engine cutover and a zero-shuffle plan guard for the in-plan engine."""

from __future__ import annotations

import random
import string

import pytest

from atiesh_spark.operators.blocklist import (
    _INPLAN_MAX,
    blocklist_filter,
    blocklist_hits,
)


def _naive(texts, patterns):
    pats = sorted({p.lower() for p in patterns if p})
    return {
        i: sorted(p for p in pats if t is not None and p in t.lower())
        for i, t in texts
    }


ROWS = [
    (1, "the QUICK brown fox"),
    (2, "abababa"),
    (3, None),
    (4, ""),
    (5, "Sphinx of black quartz, judge my vow"),
    (6, "aa aaa aaaa"),
]
PATTERNS = ["quick", "ABA", "bab", "aa", "aaa", "judge my vow", "zzz", "", "QUICK"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


@pytest.mark.parametrize("engine", ["inplan", "automaton"])
def test_hits_match_naive_containment(docs, engine):
    got = {
        r["doc_id"]: r["hits"]
        for r in blocklist_hits(docs, "text", PATTERNS, engine=engine).collect()
    }
    assert got == _naive(ROWS, PATTERNS)


def test_engines_agree_on_random_soup(spark):
    rng = random.Random(7)
    alphabet = "abcd "
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(80))) for i in range(60)
    ]
    pats = list(
        {
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 4)))
            for _ in range(30)
        }
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {
        r["doc_id"]: r["hits"]
        for r in blocklist_hits(df, "text", pats, engine="inplan").collect()
    }
    b = {
        r["doc_id"]: r["hits"]
        for r in blocklist_hits(df, "text", pats, engine="automaton").collect()
    }
    assert a == b == _naive(rows, pats)


def test_filter_drops_exactly_the_flagged(docs):
    kept = {r["doc_id"] for r in blocklist_filter(docs, "text", PATTERNS).collect()}
    naive = _naive(ROWS, PATTERNS)
    assert kept == {i for i, _ in ROWS if not naive[i]}
    # original schema preserved
    assert blocklist_filter(docs, "text", PATTERNS).columns == ["doc_id", "text"]


def test_auto_engine_cutover(docs):
    few = blocklist_hits(docs, "text", ["quick"], engine="auto")
    many_pats = [f"zx{i}" for i in range(_INPLAN_MAX + 1)]
    many = blocklist_hits(docs, "text", many_pats, engine="auto")
    assert "Contains" in few._jdf.queryExecution().executedPlan().toString() or \
        "contains" in few._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in many._jdf.queryExecution().executedPlan().toString()


def test_inplan_zero_shuffles(docs):
    plan = (
        blocklist_hits(docs, "text", PATTERNS, engine="inplan")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_automaton_ships_nodes_as_broadcast(docs, spark, monkeypatch):
    """The automaton node list must ride a Broadcast variable, not the
    task closure — at 100k patterns the pickled automaton is tens of MB
    per task otherwise. Guard: plan build calls sc.broadcast exactly
    once with the node list, and a 2k-pattern list (well past any
    closure-comfortable size) still answers correctly through it."""
    from pyspark import SparkContext

    calls: list[int] = []
    orig = SparkContext.broadcast

    def spy(self, value):
        calls.append(len(value))
        return orig(self, value)

    monkeypatch.setattr(SparkContext, "broadcast", spy)
    pats = [f"qq{i}x" for i in range(2000)] + ["quick", "judge my vow"]
    flagged = blocklist_hits(docs, "text", pats, engine="automaton")
    assert len(calls) == 1 and calls[0] > 2000  # node list, one broadcast
    got = {r["doc_id"]: r["hits"] for r in flagged.collect()}
    assert got == _naive(ROWS, pats)


def test_validation(docs):
    with pytest.raises(ValueError):
        blocklist_hits(docs, "text", ["", None and "x"])
    with pytest.raises(ValueError):
        blocklist_hits(docs, "text", ["ok"], engine="regex")
