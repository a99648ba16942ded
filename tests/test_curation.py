"""Curation composite tests (reason-coded filtering)."""

from __future__ import annotations


def test_filter_report_priority_and_null_semantics(spark):
    from pyspark.sql import functions as F

    from atiesh_spark.operators.curation import filter_report

    df = spark.createDataFrame(
        [
            (1, False, False, False),   # keep
            (2, True, True, True),      # first rule wins
            (3, False, True, True),     # second rule wins
            (4, False, False, True),    # third
            (5, None, False, False),    # NULL predicate = failure
        ],
        "doc_id long, a boolean, b boolean, c boolean",
    )
    got = {r["doc_id"]: r for r in filter_report(
        df, "doc_id",
        [("ra", F.col("a")), ("rb", F.col("b")), ("rc", F.col("c"))],
    ).collect()}
    assert got[1]["verdict"] == "keep"
    assert got[2]["verdict"] == "ra"
    assert got[3]["verdict"] == "rb"
    assert got[4]["verdict"] == "rc"
    assert got[5]["verdict"] == "ra" and got[5]["fail_ra"] is True
    assert not any(r["verdict"] is None for r in got.values())
    import pytest
    with pytest.raises(ValueError):
        filter_report(df, "doc_id", [])
    with pytest.raises(ValueError, match="duplicate"):
        filter_report(df, "doc_id", [("x", F.col("a")), ("x", F.col("b"))])
