"""Oracle-differential tests: every registered query runs on Spark AND
DuckDB over the same parquet; results must match order-insensitively —
the same contract the driver's CORRECTNESS gate applies (row count +
column names + canonicalized values).

Runs at sf0.001 for speed; the driver re-checks at sf0.01.
"""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from atiesh_spark.plans import QUERIES
from tests.conftest import SF_SMALL


def canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # guard against representation noise the query-side rounding
        # already bounded; 1e-9 relative is far below round(_, 4) grain
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        tuple(canon_cell(r[i]) for i in order) for r in rows
    )


ORACLE_QUERIES = [n for n, s in QUERIES.items() if s.oracle is not None]
NO_ORACLE = [n for n, s in QUERIES.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_oracle(spark, duck_small, name):
    spec = QUERIES[name]
    sdf = spec.spark(spark, SF_SMALL)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    rel = duck_small.sql(spec.oracle)
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    mismatches = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
    assert cs == cd, f"{name}: value mismatch, first diffs: {mismatches}"


@pytest.mark.parametrize("name", NO_ORACLE)
def test_runs_without_oracle(spark, name):
    spec = QUERIES[name]
    sdf = spec.spark(spark, SF_SMALL)
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, os = e.queries(), e.oracle_sql()
    assert set(os) <= set(qs)
    assert len(qs) >= 30
