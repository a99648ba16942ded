"""URL canonicalization (operators/web.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from atiesh_spark.operators.web import canonicalize_urls, domain_stats


def _canon(spark, url: str) -> dict:
    df = spark.createDataFrame([(1, url)], "id long, url string")
    return canonicalize_urls(df, "url").collect()[0].asDict()


def test_canonicalize_full_mess(spark):
    r = _canon(
        spark,
        "HTTPS://WWW.Example.COM:443//a//b/c/?utm_source=tw&z=9&a=1&fbclid=x#frag",
    )
    assert r["canonical_url"] == "https://example.com/a/b/c?a=1&z=9"
    assert r["host"] == "example.com"
    assert r["registered_domain"] == "example.com"
    assert r["path_canonical"] == "/a/b/c"


def test_canonicalize_ports_and_paths(spark):
    assert (
        _canon(spark, "http://x.org:80/p")["canonical_url"] == "http://x.org/p"
    )
    # non-default port kept
    assert (
        _canon(spark, "http://x.org:8080/p")["canonical_url"]
        == "http://x.org:8080/p"
    )
    # empty path -> '/', root slash kept
    assert _canon(spark, "https://x.org")["canonical_url"] == "https://x.org/"
    assert _canon(spark, "https://x.org/")["canonical_url"] == "https://x.org/"
    # all params tracking -> no query at all
    assert (
        _canon(spark, "https://x.org/p?utm_a=1&gclid=2")["canonical_url"]
        == "https://x.org/p"
    )


def test_canonicalize_subdomain_and_unparseable(spark):
    r = _canon(spark, "https://a.b.example.com/x")
    assert r["host"] == "a.b.example.com"
    assert r["registered_domain"] == "example.com"
    bad = _canon(spark, "not a url")
    assert bad["canonical_url"] is None and bad["host"] is None


def test_domain_stats_dup_share(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.a.com/x?utm_s=1"),
            (2, "https://a.com/x"),  # canonical dup of 1
            (3, "https://a.com/y"),
            (4, "http://b.net/z"),
        ],
        "id long, url string",
    )
    rows = {r["registered_domain"]: r for r in domain_stats(df, "url").collect()}
    assert rows["a.com"]["n_urls"] == 3
    assert rows["a.com"]["n_canonical"] == 2
    assert abs(rows["a.com"]["dup_share"] - (1 - 2 / 3)) < 1e-6
    assert rows["b.net"]["dup_share"] == 0.0


def test_canonicalize_is_idempotent(spark):
    urls = [
        "HTTPS://WWW.Example.COM:443//a//b/?utm_source=tw&z=9&a=1#f",
        "http://x.org:8080/p?b=2&a=1",
        "https://a.b.example.com/x",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "id long, url string")
    once = canonicalize_urls(df, "url").select(
        "id", F.col("canonical_url").alias("url")
    )
    twice = canonicalize_urls(once, "url")
    assert all(
        r["url"] == r["canonical_url"] for r in twice.collect()
    ), "canonicalization must be a fixpoint"
