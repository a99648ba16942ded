"""Broadcast enrichment: the CachedProxy pattern, Spark-native.

The reference's CachedProxy extension periodically fetches an HTTP
resource, parses it with a user formatter, and serves cached lookups to
components (CachedProxy.scala:65-270) — a remote-config / enrichment-
dictionary syncer.

Spark-native shape: the fetched dictionary becomes a small DataFrame
broadcast-joined to the stream inside foreachBatch; the refresher
re-fetches at most every ``ttl`` seconds (CachedProxy's update cycle),
driver-side, between micro-batches. The fact side never shuffles.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class RefreshingLookup:
    """TTL-cached dimension: fetch_fn() -> list[tuple] at most once per ttl.

    validate ≅ CachedProxy.validateCache (blocking refresh when stale);
    current ≅ getCache (serve what's there). ``clock`` injectable for
    tests.
    """

    def __init__(
        self,
        spark: SparkSession,
        fetch_fn: Callable[[], list[tuple]],
        schema: str,
        ttl_seconds: float = 60.0,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self.spark = spark
        self.fetch_fn = fetch_fn
        self.schema = schema
        self.ttl = ttl_seconds
        self.clock = clock
        self._df: DataFrame | None = None
        self._fetched_at: float | None = None
        self.fetch_count = 0

    def validate(self) -> DataFrame:
        now = self.clock()
        if self._df is None or self._fetched_at is None or now - self._fetched_at >= self.ttl:
            rows = self.fetch_fn()
            self._df = self.spark.createDataFrame(rows, self.schema)
            self._fetched_at = now
            self.fetch_count += 1
        return self._df

    def current(self) -> DataFrame | None:
        return self._df


def enrich_with_lookup(
    df: DataFrame,
    lookup: RefreshingLookup,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Broadcast-join the (refreshed-if-stale) dimension onto a batch."""
    dim = lookup.validate()
    return df.join(F.broadcast(dim), on, how)


def enriching_batch_writer(
    lookup: RefreshingLookup,
    on: str | list[str],
    inner_writer: Callable[[DataFrame, int], None],
    how: str = "left",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch wrapper: refresh-check the dictionary each micro-batch
    (the CachedProxy update cycle), enrich, then hand to the real sink."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        inner_writer(enrich_with_lookup(batch_df, lookup, on, how), batch_id)

    return write
