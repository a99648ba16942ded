"""Data-quality gates for pipeline stages.

A training-data pipeline needs cheap, single-pass validation between
stages: null rates, value ranges, key uniqueness, row-count floors. All
rules compile into ONE aggregation over the batch (conditional counts),
so a gate costs one pass regardless of rule count — no per-rule jobs,
no driver-side scans.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QualityReport:
    total_rows: int
    violations: dict[str, int]  # rule name -> violating row count (or 1 for scalar rules)

    @property
    def ok(self) -> bool:
        return not self.violations


class QualityGateError(ValueError):
    def __init__(self, report: QualityReport) -> None:
        self.report = report
        super().__init__(f"quality gate failed: {report.violations}")


def _rule_exprs(rules: dict) -> dict[str, Column]:
    """Compile rule specs into violating-row-count aggregate columns."""
    out: dict[str, Column] = {}
    for name, rule in rules.items():
        kind = rule["kind"]
        if kind == "not_null":
            out[name] = F.count(F.when(F.col(rule["col"]).isNull(), 1))
        elif kind == "range":
            c = F.col(rule["col"])
            pred = F.lit(False)
            if "min" in rule:
                pred = pred | (c < rule["min"])
            if "max" in rule:
                pred = pred | (c > rule["max"])
            out[name] = F.count(F.when(c.isNotNull() & pred, 1))
        elif kind == "matches":
            c = F.col(rule["col"])
            out[name] = F.count(
                F.when(c.isNotNull() & ~c.rlike(rule["pattern"]), 1)
            )
        elif kind == "unique":
            # duplicates = rows minus distinct keys, with NULL treated as
            # one key value (count/countDistinct both skip NULLs, so
            # null-keyed duplicates would otherwise pass the gate)
            c = F.col(rule["col"])
            out[name] = (
                F.count(c)
                - F.countDistinct(c)
                + F.greatest(
                    F.count(F.when(c.isNull(), 1)) - F.lit(1), F.lit(0)
                )
            )
        elif kind == "min_rows":
            # scalar rule: resolved after the aggregate
            out[name] = F.count(F.lit(1))
        else:
            raise ValueError(f"unknown rule kind {kind!r} for rule {name!r}")
    return out


def check_quality(df: DataFrame, rules: dict) -> QualityReport:
    """Evaluate all rules in one aggregation pass.

    rules: {name: {"kind": "not_null"|"range"|"matches"|"unique"|"min_rows",
                   "col": ..., "min"/"max"/"pattern"/"rows": ...}}
    """
    exprs = _rule_exprs(rules)
    row = df.agg(
        F.count(F.lit(1)).alias("__total"),
        *[c.alias(n) for n, c in exprs.items()],
    ).first()
    violations: dict[str, int] = {}
    for name, rule in rules.items():
        if rule["kind"] == "min_rows":
            if row["__total"] < rule["rows"]:
                violations[name] = 1
        elif row[name] and row[name] > 0:
            violations[name] = row[name]
    return QualityReport(total_rows=row["__total"], violations=violations)


def assert_quality(df: DataFrame, rules: dict) -> DataFrame:
    """Gate a batch: raise QualityGateError on any violation, else pass
    the DataFrame through unchanged. In foreachBatch, the raise fails the
    batch -> checkpoint replay, so bad data never commits downstream."""
    report = check_quality(df, rules)
    if not report.ok:
        raise QualityGateError(report)
    return df
