"""Query registry: every checkable operator gets a (spark, oracle) pair.

The driver runs each ``spark`` callable at sf0.01 and hash-compares the
result with the ``oracle`` SQL run in DuckDB over the same parquet views
(order-insensitive, columns sorted by name) — so column names and value
canonicalization (explicit rounding of float aggregates) must match
exactly on both sides. ``oracle=None`` would mark a genuinely
non-SQL-expressible op (rows-only check); as of round 2 every
registered query has an oracle — non-deterministic outputs (sketches,
k-means cells) are graded via bounded-error/recall booleans against a
constant truth table instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False  # included in bench.py
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    headline: bool = False,
    doc: str = "",
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, spark=fn, oracle=oracle, headline=headline, doc=doc)
        return fn

    return deco


# Importing these modules populates QUERIES via the decorator.
from atiesh_spark.plans import core_queries  # noqa: E402,F401
from atiesh_spark.plans import relational_queries  # noqa: E402,F401
from atiesh_spark.plans import llm_queries  # noqa: E402,F401
from atiesh_spark.plans import window_queries  # noqa: E402,F401
from atiesh_spark.plans import multimodal_queries  # noqa: E402,F401
