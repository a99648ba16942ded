"""Data-quality gate tests: one-pass rule evaluation, gate raise."""

from __future__ import annotations

import pytest

from atiesh_spark.operators.quality import (
    QualityGateError,
    assert_quality,
    check_quality,
)
from atiesh_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_clean_table_passes(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    report = check_quality(
        docs,
        {
            "doc_id_present": {"kind": "not_null", "col": "doc_id"},
            "doc_id_unique": {"kind": "unique", "col": "doc_id"},
            "n_chars_sane": {"kind": "range", "col": "n_chars", "min": 1, "max": 10_000},
            "lang_shape": {"kind": "matches", "col": "lang", "pattern": "^[a-z]{2}$"},
            "enough_rows": {"kind": "min_rows", "rows": 10},
        },
    )
    assert report.ok and report.total_rows > 0


def test_violations_counted(spark):
    df = spark.createDataFrame(
        [(1, None, 5.0), (2, "x", -1.0), (2, "y", 2.0), (3, "zz!", 3.0)],
        "k long, name string, score double",
    )
    report = check_quality(
        df,
        {
            "name_present": {"kind": "not_null", "col": "name"},
            "score_pos": {"kind": "range", "col": "score", "min": 0},
            "k_unique": {"kind": "unique", "col": "k"},
            "name_alpha": {"kind": "matches", "col": "name", "pattern": "^[a-z]+$"},
            "enough": {"kind": "min_rows", "rows": 100},
        },
    )
    assert report.violations == {
        "name_present": 1,
        "score_pos": 1,
        "k_unique": 1,
        "name_alpha": 1,
        "enough": 1,
    }


def test_unique_rule_counts_null_keyed_duplicates(spark):
    """NULL keys are one key value: k nulls = k-1 duplicates (count/
    countDistinct both skip NULLs, so this needs the explicit term)."""
    df = spark.createDataFrame(
        [(None,), (None,), (None,), (1,), (2,)], "k bigint"
    )
    report = check_quality(df, {"k_unique": {"kind": "unique", "col": "k"}})
    assert report.violations == {"k_unique": 2}

    clean = spark.createDataFrame([(None,), (1,), (2,)], "k bigint")
    assert check_quality(clean, {"k_unique": {"kind": "unique", "col": "k"}}).ok


def test_assert_quality_raises_with_report(spark):
    df = spark.createDataFrame([(None,)], "v string")
    with pytest.raises(QualityGateError) as ei:
        assert_quality(df, {"v_present": {"kind": "not_null", "col": "v"}})
    assert ei.value.report.violations == {"v_present": 1}


def test_unknown_rule_kind_rejected(spark):
    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ValueError, match="unknown rule kind"):
        check_quality(df, {"r": {"kind": "sparkles", "col": "v"}})
