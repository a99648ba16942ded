"""Header-map operations.

Reference behaviors covered:
- header upsert merge — ``setHeaders(pairs*)`` folds new pairs into the map,
  last write wins (reference: core/.../event/SimpleEvent.scala:23-26).
  Requires ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` (set by
  ``atiesh_spark.session.get_spark``).
- capture headers by lowercased key prefix (HttpSource.scala:119-126).
- lookup with static default — per-event Kafka topic routing
  (KafkaLimitAckSink.scala:48-50).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def merge_headers(headers: Column | str, updates: Column) -> Column:
    """Upsert ``updates`` into ``headers`` (duplicate keys: update wins).

    Keys present in ``updates`` are removed from ``headers`` BEFORE the
    concat, so the result never contains duplicates — correct under any
    ``spark.sql.mapKeyDedupPolicy`` (the default EXCEPTION policy would
    throw on a naive map_concat; the caller's session config must not
    change this function's semantics).
    """
    base = F.map_filter(
        _c(headers), lambda k, v: ~F.array_contains(F.map_keys(updates), k)
    )
    return F.map_concat(base, updates)


def header_prefix_filter(headers: Column | str, prefix: str) -> Column:
    """Keep entries whose lowercased key starts with ``prefix``."""
    p = prefix.lower()
    return F.map_filter(_c(headers), lambda k, v: F.startswith(F.lower(k), F.lit(p)))


def header_lookup(headers: Column | str, key: str, default: str) -> Column:
    """headers[key], falling back to a static default."""
    return F.coalesce(F.element_at(_c(headers), F.lit(key)), F.lit(default))
