"""Batch parquet table loaders for the driver testdata.

Plain ``spark.read.parquet`` — declarative scans so Catalyst gets predicate
pushdown, column pruning and (on partitioned layouts) partition pruning for
free. At 100 TB these would be the same calls against a partitioned/
bucketed warehouse path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # the caller's session may not come from get_spark() (the driver
        # passes its own); the nanos conf is runtime-settable, so pin it
        # here — without it the TIMESTAMP(NANOS) footer is rejected.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS) — Spark reads it as raw int64
        # nanos (legacy.parquet.nanosAsLong); convert to micros with
        # integer division (ns magnitudes exceed double precision) and
        # present as TIMESTAMP_NTZ, matching the naive wall-clock
        # semantics every other engine gives this column. The NTZ value
        # is BUILT from epoch arithmetic (date_add + make_timestamp_ntz)
        # rather than cast through an instant, because instant->NTZ casts
        # render in spark.sql.session.timeZone — a non-UTC caller session
        # would silently shift every wall-clock value and break the
        # session-independent driver contract (and pinning the session
        # zone here would mutate the caller's session for everything
        # else).
        from pyspark.sql import functions as F

        df = (
            df.withColumn("__us", F.expr("ts div 1000"))
            .withColumn(
                "__d",
                F.expr("date_add(DATE '1970-01-01', CAST(__us div 86400000000 AS INT))"),
            )
            .withColumn("__tm", F.expr("__us % 86400000000"))
            .withColumn(
                "ts",
                F.expr(
                    "make_timestamp_ntz(year(__d), month(__d), day(__d), "
                    "CAST(__tm div 3600000000 AS INT), "
                    "CAST((__tm % 3600000000) div 60000000 AS INT), "
                    "CAST(__tm % 60000000 AS DECIMAL(8,0)) / 1000000)"
                ),
            )
            .drop("__us", "__d", "__tm")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
