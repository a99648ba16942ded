"""Sessionization + sequence assembly: differential against a pure
Python gaps-and-islands reference, tie determinism, NULL payloads."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from atiesh_spark.operators.sequences import assemble_sequences, sessionize


def _py_sessions(rows, gap):
    """rows: (key, ts, eid, payload) -> {(key, session): [payload...]}"""
    out = {}
    by_key = {}
    for r in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        by_key.setdefault(r[0], []).append(r)
    for key, evs in by_key.items():
        sid = -1
        prev = None
        for _, ts, eid, p in evs:
            if prev is None or (ts - prev).total_seconds() > gap:
                sid += 1
            prev = ts
            if p is not None:
                out.setdefault((key, sid), []).append(p)
    return {k: "|".join(v) for k, v in out.items()}


def _rows(seed, n=120, keys=5):
    rng = random.Random(seed)
    base = datetime(2024, 1, 1)
    rows = []
    for eid in range(n):
        rows.append(
            (
                rng.randrange(keys),
                base + timedelta(seconds=rng.randrange(0, 5000)),
                eid,
                rng.choice(["a", "b", "c", None]),
            )
        )
    return rows


def test_matches_python_reference(spark):
    rows = _rows(3)
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, payload string"
    )
    got = {
        (r["user_id"], r["session_id"]): r["sequence"]
        for r in assemble_sequences(
            df, "user_id", "ts", "payload", gap_seconds=300,
            tiebreak_col="event_id",
        ).collect()
    }
    assert got == _py_sessions(rows, 300)


def test_session_ids_contiguous_and_starts_ordered(spark):
    rows = _rows(9)
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, payload string"
    )
    s = sessionize(df, "user_id", "ts", 300, tiebreak_col="event_id")
    per_key = {}
    for r in s.collect():
        per_key.setdefault(r["user_id"], set()).add(r["session_id"])
    for key, sids in per_key.items():
        assert sids == set(range(len(sids))), key  # 0..n-1, no holes


def test_null_payloads_drop_but_still_split_sessions(spark):
    base = datetime(2024, 1, 1)
    rows = [
        (1, base, 0, "x"),
        (1, base + timedelta(seconds=10), 1, None),  # inside session 0
        (1, base + timedelta(seconds=1000), 2, "y"),  # new session
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, payload string"
    )
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["sequence"])
        for r in assemble_sequences(
            df, "user_id", "ts", "payload", gap_seconds=300,
            tiebreak_col="event_id",
        ).collect()
    }
    # NULL-payload row doesn't appear in counts/sequence, but the gap
    # structure (computed before the filter) still saw it
    assert got == {(1, 0): (1, "x"), (1, 1): (1, "y")}


def test_validation(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), "x")], "user_id long, ts timestamp, p string"
    )
    with pytest.raises(ValueError):
        sessionize(df, "user_id", "ts", 0)
    with pytest.raises(ValueError, match="collides"):
        sessionize(
            df.withColumnRenamed("p", "session_id"), "user_id", "ts", 10
        )


def test_validate_conversations_flags(spark):
    from atiesh_spark.operators.sequences import validate_conversations

    rows = [
        # conv 1: perfect user/assistant/user/assistant
        (1, 1, "user", "hi"), (1, 2, "assistant", "hello"),
        (1, 3, "user", "thanks"), (1, 4, "assistant", "np"),
        # conv 2: starts with assistant
        (2, 1, "assistant", "hi"), (2, 2, "user", "??"),
        # conv 3: double user turn mid-way
        (3, 1, "user", "a"), (3, 2, "user", "b"), (3, 3, "assistant", "c"),
        # conv 4: empty + whitespace content
        (4, 1, "user", ""), (4, 2, "assistant", "   "),
        # conv 5: ends on user
        (5, 1, "user", "a"), (5, 2, "assistant", "b"), (5, 3, "user", "c"),
        # conv 6: off-script + NULL role
        (6, 1, "system", "x"), (6, 2, None, "y"),
        # conv 7: single valid-looking turn, below min_turns
        (7, 1, "user", "hi"),
    ]
    df = spark.createDataFrame(rows, "conv long, turn long, role string, content string")
    got = {r["conv"]: r for r in validate_conversations(
        df, "conv", "role", "content", ["turn"]).collect()}
    assert got[1]["valid"] and got[1]["n_role_breaks"] == 0 and got[1]["n_empty"] == 0
    assert not got[2]["valid"] and got[2]["n_role_breaks"] == 2  # both off-expectation
    assert not got[3]["valid"] and got[3]["n_role_breaks"] == 2  # turns 2,3 shifted
    assert not got[4]["valid"] and got[4]["n_empty"] == 2
    assert not got[5]["valid"] and got[5]["last_role"] == "user"
    assert not got[6]["valid"] and got[6]["n_role_breaks"] == 2  # off-script + NULL
    assert not got[7]["valid"] and got[7]["n_turns"] == 1
    import pytest
    with pytest.raises(ValueError):
        validate_conversations(df, "conv", "role", "content", ["turn"], roles=("a", "a"))
    with pytest.raises(ValueError):
        validate_conversations(df, "conv", "role", "content", ["turn"], min_turns=0)


class TestFlattenTree:
    def test_binary_tree_paths(self, spark):
        from atiesh_spark.operators.sequences import flatten_tree

        rows = [(i, None if i == 0 else (i - 1) // 2) for i in range(15)]
        df = spark.createDataFrame(rows, "node bigint, parent bigint")
        out = {r["node"]: r for r in
               flatten_tree(df, "node", "parent").collect()}
        assert out[0]["path"] == "0" and out[0]["depth"] == 0
        assert out[7]["path"] == "0/1/3/7" and out[7]["depth"] == 3
        assert all(r["root"] == 0 for r in out.values())

    def test_forest_with_multiple_roots(self, spark):
        from atiesh_spark.operators.sequences import flatten_tree

        df = spark.createDataFrame(
            [(1, None), (2, 1), (10, None), (11, 10), (12, 11)],
            "node bigint, parent bigint",
        )
        out = {r["node"]: r for r in
               flatten_tree(df, "node", "parent").collect()}
        assert out[2]["root"] == 1
        assert out[12]["path"] == "10/11/12"
        assert out[10]["depth"] == 0

    def test_dangling_parent_roots_in_place(self, spark):
        from atiesh_spark.operators.sequences import flatten_tree

        # parent 99 does not exist: node 5 becomes its own root with a
        # one-element path instead of a NULLed chain
        df = spark.createDataFrame(
            [(5, 99)], "node bigint, parent bigint"
        )
        r = flatten_tree(df, "node", "parent").collect()[0]
        assert (r["root"], r["depth"], r["path"]) == (5, 0, "5")

    def test_deep_chain_within_budget(self, spark):
        from atiesh_spark.operators.sequences import flatten_tree

        # a 33-node path needs 6 doubling rounds; max_depth=64 covers it
        df = spark.createDataFrame(
            [(i, None if i == 0 else i - 1) for i in range(33)],
            "node bigint, parent bigint",
        )
        out = {r["node"]: r for r in
               flatten_tree(df, "node", "parent").collect()}
        assert out[32]["depth"] == 32
        assert out[32]["path"] == "/".join(str(i) for i in range(33))

    def test_cycle_raises(self, spark):
        import pytest as _pt

        from atiesh_spark.operators.sequences import flatten_tree

        df = spark.createDataFrame(
            [(1, 2), (2, 1)], "node bigint, parent bigint"
        )
        with _pt.raises(ValueError, match="unresolved"):
            flatten_tree(df, "node", "parent", max_depth=8)
