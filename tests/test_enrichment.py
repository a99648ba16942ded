"""CachedProxy-equivalent enrichment: TTL refresh + broadcast join."""

from __future__ import annotations

from atiesh_spark.operators.enrichment import (
    RefreshingLookup,
    enrich_with_lookup,
    enriching_batch_writer,
)


def test_ttl_refresh_cycle(spark):
    clock = {"t": 0.0}
    versions = iter([[(1, "v1")], [(1, "v2")]])
    lookup = RefreshingLookup(
        spark, lambda: next(versions), "k int, val string",
        ttl_seconds=10, clock=lambda: clock["t"],
    )
    # first validate fetches; within ttl it serves the cache
    assert lookup.validate().collect()[0]["val"] == "v1"
    clock["t"] = 5.0
    assert lookup.validate().collect()[0]["val"] == "v1"
    assert lookup.fetch_count == 1
    # past ttl it re-fetches (CachedProxy update cycle)
    clock["t"] = 11.0
    assert lookup.validate().collect()[0]["val"] == "v2"
    assert lookup.fetch_count == 2


def test_enrich_broadcast_join(spark):
    lookup = RefreshingLookup(
        spark, lambda: [(1, "gold"), (2, "silver")], "k int, tier string",
        ttl_seconds=60,
    )
    facts = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    out = enrich_with_lookup(facts, lookup, on="k")
    rows = {r["v"]: r["tier"] for r in out.collect()}
    assert rows == {"a": "gold", "b": "silver", "c": None}
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_enriching_batch_writer_refreshes_per_batch(spark):
    clock = {"t": 0.0}
    fetches = []

    def fetch():
        fetches.append(clock["t"])
        return [(1, f"v@{clock['t']}")]

    lookup = RefreshingLookup(
        spark, fetch, "k int, val string", ttl_seconds=10, clock=lambda: clock["t"]
    )
    seen = []
    writer = enriching_batch_writer(
        lookup, "k", lambda df, bid: seen.extend(df.collect())
    )
    batch = spark.createDataFrame([(1, "x")], "k int, payload string")
    writer(batch, 0)          # fetch 1
    clock["t"] = 3.0
    writer(batch, 1)          # cached
    clock["t"] = 12.0
    writer(batch, 2)          # fetch 2
    assert fetches == [0.0, 12.0]
    assert [r["val"] for r in seen] == ["v@0.0", "v@0.0", "v@12.0"]
