"""Unit tests for preference-data operators (Bradley-Terry MM)."""

from __future__ import annotations

import pytest


def test_bradley_terry_matches_reference_mm(spark):
    """The Spark result must equal a plain-Python implementation of
    Hunter's MM update on the same judgments."""
    from atiesh_spark.operators.preference import bradley_terry

    rows = [("A", "B")] * 3 + [("B", "A")] + [("A", "C")] * 2 + [("C", "B")] * 2
    df = spark.createDataFrame(rows, "w string, l string")
    got = {r["item"]: r for r in bradley_terry(df, "w", "l", iters=10).collect()}

    smooth = 0.5
    n = {("A", "B"): 3, ("B", "A"): 1, ("A", "C"): 2, ("C", "B"): 2}
    obs = {tuple(sorted(p)) for p in n}
    items = sorted({x for p in n for x in p})
    g = {}
    for i, j in obs:
        tot = n.get((i, j), 0) + n.get((j, i), 0) + 2 * smooth
        g[(i, j)] = g[(j, i)] = tot
    W = {
        i: sum(
            n.get((i, j), 0) + smooth
            for j in items
            if j != i and tuple(sorted((i, j))) in obs
        )
        for i in items
    }
    p = {i: 1 / 3 for i in items}
    for _ in range(10):
        new = {
            i: W[i] / sum(g[(i, j)] / (p[i] + p[j]) for j in items if (i, j) in g)
            for i in items
        }
        t = sum(v for _, v in sorted(new.items()))
        p = {k: v / t for k, v in sorted(new.items())}
    for i in items:
        assert got[i]["rating"] == round(p[i], 4)
    assert got["A"]["n_wins"] == 5 and got["A"]["n_games"] == 6
    assert got["B"]["n_wins"] == 1 and got["C"]["n_games"] == 4
    # strength order follows the record
    assert got["A"]["rating"] > got["C"]["rating"] > got["B"]["rating"]


def test_bradley_terry_edges(spark):
    from atiesh_spark.operators.preference import bradley_terry

    # undefeated item stays finite thanks to smoothing; winless too
    df = spark.createDataFrame(
        [("A", "B")] * 4 + [("A", "A")], "w string, l string"  # self-pair dropped
    )
    got = {r["item"]: r for r in bradley_terry(df, "w", "l", iters=5).collect()}
    assert set(got) == {"A", "B"}
    assert 0 < got["B"]["rating"] < got["A"]["rating"] < 1
    assert got["B"]["n_wins"] == 0  # coalesced, not NULL
    assert abs(got["A"]["rating"] + got["B"]["rating"] - 1.0) < 1e-3

    with pytest.raises(ValueError):
        bradley_terry(df, "w", "l", iters=0)
    with pytest.raises(ValueError):
        bradley_terry(df, "w", "l", smooth=-1)
    with pytest.raises(ValueError):
        bradley_terry(df, "w", "l", max_items=1)

    empty = spark.createDataFrame([], "w string, l string")
    assert bradley_terry(empty, "w", "l").count() == 0
