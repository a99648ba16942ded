"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``atiesh_spark/plans/`` (registry pattern); this file
just re-exports them in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from atiesh_spark.plans import QUERIES, ordered_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-style star join
    (orders x customer shuffled, nation/region broadcast) — exercises scan
    pushdown, broadcast + shuffle joins, and hash aggregation in one plan.
    """
    return QUERIES["q16_revenue_by_nation"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Order is deliberate (registry.DRIVER_ORDER): the driver grades only the
    first 50 entries, so not-yet-driver-verified queries lead the dict.
    """
    return {name: spec.spark for name, spec in ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query."""
    return {
        name: spec.oracle
        for name, spec in ordered_queries().items()
        if spec.oracle is not None
    }
