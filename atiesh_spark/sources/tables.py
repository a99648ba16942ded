"""Batch parquet table loaders for the driver testdata.

Plain ``spark.read.parquet`` — declarative scans so Catalyst gets predicate
pushdown, column pruning and (on partitioned layouts) partition pruning for
free. At 100 TB these would be the same calls against a partitioned/
bucketed warehouse path.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession

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


def epoch_nanos_to_ntz(nanos_col: str) -> Column:
    """int64 epoch nanoseconds -> TIMESTAMP_NTZ (UTC wall clock),
    session-timezone-INDEPENDENT.

    Built from epoch arithmetic (floor-div to a date + make_timestamp_ntz)
    rather than cast through an instant, because instant->NTZ casts render
    in ``spark.sql.session.timeZone`` — a non-UTC caller session would
    silently shift every wall-clock value (and pinning the session zone
    would mutate the caller's session for everything else). Nanos are
    first floored to micros with integer division (ns magnitudes exceed
    double precision). ``div`` truncates toward zero and ``%`` keeps the
    dividend's sign, so pre-epoch instants use explicit FLOOR division —
    else the day is off by one and the time-of-day goes negative (an ANSI
    error in make_timestamp_ntz).
    """
    from pyspark.sql import functions as F

    us = f"(({nanos_col} - (({nanos_col} % 1000 + 1000) % 1000)) div 1000)"
    days = (
        f"(CASE WHEN {us} >= 0 THEN {us} div 86400000000 "
        f"ELSE (({us} + 1) div 86400000000) - 1 END)"
    )
    d = f"date_add(DATE '1970-01-01', CAST({days} AS INT))"
    tm = f"({us} - {days} * 86400000000)"
    return F.expr(
        f"make_timestamp_ntz(year({d}), month({d}), day({d}), "
        f"CAST({tm} div 3600000000 AS INT), "
        f"CAST(({tm} % 3600000000) div 60000000 AS INT), "
        f"CAST({tm} % 60000000 AS DECIMAL(8,0)) / 1000000)"
    )


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
        # The driver's events table has shipped with two physical layouts
        # for ts: parquet TIMESTAMP(NANOS) (Spark reads raw int64 nanos
        # under legacy.parquet.nanosAsLong) and plain timestamp[us] with
        # no zone (Spark reads TIMESTAMP_NTZ directly, same naive
        # wall-clock DuckDB sees). Branch on the type actually read so
        # both layouts present the identical TIMESTAMP_NTZ column; only
        # the int64 layout needs the session-timezone-independent
        # conversion (see epoch_nanos_to_ntz).
        from pyspark.sql.types import LongType, TimestampNTZType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", epoch_nanos_to_ntz("ts"))
        elif not isinstance(ts_type, TimestampNTZType):
            raise TypeError(
                f"events.ts read as {ts_type}; expected int64 nanos or "
                "TIMESTAMP_NTZ — an instant (zoned) layout would need a "
                "session-timezone decision the engine refuses to guess"
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
