"""Bucketed table layout for co-located joins.

At 100 TB the dominant join cost is shuffling fact tables. Writing both
sides bucketed by the join key (same bucket count) lets Spark plan a
sort-merge join with NO exchange on either side — the shuffle is paid
once at write time and amortized over every subsequent join/aggregation
on that key.

Uses the session catalog's managed tables (``bucketBy`` requires
``saveAsTable``; plain path writes cannot record bucket metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally removes the sort from future
    sort-merge joins, leaving pure merge.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
