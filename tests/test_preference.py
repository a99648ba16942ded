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


def test_preference_length_bias_planted_curve(spark):
    from atiesh_spark.operators.preference import preference_length_bias

    rows = []
    # small gaps: longer side wins half the time (unbiased)
    for i in range(20):
        if i % 2:
            rows.append((100 + 2, 100))     # longer wins, gap 2
        else:
            rows.append((100, 100 + 2))     # shorter wins, gap 2
    # big gaps: longer side always wins (biased tail)
    rows += [(300, 100)] * 10
    # ties
    rows += [(150, 150)] * 4
    df = spark.createDataFrame(rows, "len_w long, len_l long")
    got = {r["bucket"]: r for r in preference_length_bias(
        df, "len_w", "len_l", bins=4).collect()}
    # gap 0 (ties) and gap 2 land in bucket 0: width = (200-0)//4+1 = 51
    b0 = got[0]
    assert b0["tie_n"] == 4 and b0["n"] == 24
    assert abs(b0["rate"] - 10 / 24) < 1e-4  # rate is rounded to 4dp
    # gap 200 -> bucket (200-0)//51 = 3: pure longer-wins
    b3 = got[3]
    assert b3["n"] == 10 and b3["longer_wins"] == 10 and b3["rate"] == 1.0
    assert b3["lo_edge"] == 3 * 51
    import pytest
    with pytest.raises(ValueError):
        preference_length_bias(df, "len_w", "len_l", bins=0)
    with pytest.raises(ValueError, match="no judgments"):
        preference_length_bias(df.filter("len_w < 0"), "len_w", "len_l")
