"""Web/crawl hygiene operators: URL canonicalization and domain stats.

The first step of every crawl-derived training pipeline: raw URLs for
the same page differ in scheme case, ``www.`` prefixes, default ports,
tracking parameters, parameter order, duplicate/trailing slashes, and
fragments — so URL-keyed dedup, per-domain caps (``sampling.
per_source_cap``) and domain mixing all need a CANONICAL url first.
CommonCrawl/C4-style pipelines do exactly this before anything else.

All row-local codegen (regexp_extract / split / array_sort — no Python
UDFs, no shuffles): canonicalization of 100 TB of URLs is a free rider
on whatever scan reads the rows. The canonical form:

1. scheme and host lowercased;
2. leading ``www.`` stripped from the host;
3. default ports stripped (``:80`` for http, ``:443`` for https);
   non-default ports kept;
4. fragment dropped;
5. tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``, ``mc_eid`` — the ubiquitous analytics set);
6. remaining query parameters sorted byte-order (order never
   distinguishes resources in practice, but DOES break exact-match
   dedup);
7. duplicate slashes in the path collapsed, trailing slash dropped,
   empty path normalized to ``/``.

``registered_domain`` is the last two host labels — deliberately NOT a
public-suffix list (no external data files in-plan); documented
approximation, exact for .com/.org/... and one level off for ccSLDs
like .co.uk. Swap in a broadcast suffix table if that matters.

No counterpart in the reference (it transports events, it does not
parse URLs); this extends the training-data surface like the rest of
``operators/``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query parameters that never identify a resource.
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref|mc_eid)(=.*)?$"

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def _canon_query(query: Column) -> Column:
    """Sorted, tracking-stripped query string ('' when nothing left).
    ``query`` includes the leading '?' or is ''."""
    params = F.filter(
        F.split(F.regexp_replace(query, r"^\?", ""), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    joined = F.array_join(F.array_sort(params), "&")
    return F.when(joined == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), joined)
    )


def canonicalize_urls(
    df: DataFrame,
    url_col: str,
    out_col: str = "canonical_url",
) -> DataFrame:
    """Append ``out_col`` plus parsed ``host``, ``registered_domain``
    and ``path_canonical`` columns (NULL for rows that do not parse as
    absolute http(s)-style URLs — surface them, never guess)."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    authority = F.regexp_extract(u, _URL_RE, 2)
    raw_path = F.regexp_extract(u, _URL_RE, 3)
    raw_query = F.regexp_extract(u, _URL_RE, 4)

    host_port = F.lower(authority)
    port = F.regexp_extract(host_port, r":(\d+)$", 1)
    host = F.regexp_replace(
        F.regexp_replace(host_port, r":\d+$", ""), r"^www\.", ""
    )
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    netloc = F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(host)

    path = F.regexp_replace(raw_path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"(.)/$", "$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)

    labels = F.split(host, r"\.")
    reg_dom = F.when(
        F.size(labels) >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(host)

    parsed = scheme != ""
    return (
        df.withColumn("host", F.when(parsed, host))
        .withColumn("registered_domain", F.when(parsed, reg_dom))
        .withColumn("path_canonical", F.when(parsed, path))
        .withColumn(
            out_col,
            F.when(
                parsed,
                F.concat(
                    scheme, F.lit("://"), netloc, path, _canon_query(raw_query)
                ),
            ),
        )
    )


def domain_stats(
    df: DataFrame,
    url_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-registered-domain corpus report over canonicalized URLs:
    (registered_domain, n_urls, n_canonical, dup_share) where
    ``n_canonical`` counts distinct canonical urls and ``dup_share`` is
    the fraction of rows that are canonical-duplicates of another row —
    the number a crawl pipeline reads before sizing ``per_source_cap``.
    One map-side-combined groupBy on the domain; the total for the
    share is a broadcast one-row frame."""
    canon = canonicalize_urls(df, url_col)
    return canon.groupBy("registered_domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("canonical_url").alias("n_canonical"),
        F.round(
            1.0
            - F.countDistinct("canonical_url") / F.count(F.lit(1)),
            round_to,
        ).alias("dup_share"),
    )
