"""Interceptor chain: ordered per-event transforms as column expressions.

The reference applies interceptors in descending `priority` order; each
is Event => Event, returning the Empty tombstone to delete the record,
and an interceptor that throws passes the ORIGINAL event through
(Source.scala:306-334, Interceptor.scala:49,75-81).

Spark equivalents:
- transparent: identity (Transparent.scala:17-25)
- devnull: drop everything (DevNull.scala:17-28)
- filter: keep rows where the predicate holds (Empty ≅ filtered out)
- transform: SQL-expression column rewrites; the reference's
  error-passthrough policy maps to wrapping the rewrite in
  coalesce(try_expr, original) when on_error='keep_original'
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_transparent(df: DataFrame, cfg: dict) -> DataFrame:
    return df


def apply_devnull(df: DataFrame, cfg: dict) -> DataFrame:
    return df.filter(F.lit(False))


def apply_filter(df: DataFrame, cfg: dict) -> DataFrame:
    return df.filter(F.expr(cfg["predicate"]))


def apply_transform(df: DataFrame, cfg: dict) -> DataFrame:
    """Rewrite columns with SQL expressions.

    on_error='keep_original' mirrors the reference policy "interceptor
    exception => original event passes through" by coalescing the
    (null-on-error) try-expression with the previous value. Only sound
    for expressions with try_* semantics (casts, arithmetic, parsing);
    for others a raised error fails the task, which is Spark's honest
    default.
    """
    out = df
    keep_original = cfg.get("on_error") == "keep_original"
    for col, expr in cfg["exprs"].items():
        e = F.expr(expr)
        if keep_original and col in out.columns:
            e = F.coalesce(F.expr(expr), F.col(col))
        out = out.withColumn(col, e)
    return out


def apply_blocklist(df: DataFrame, cfg: dict) -> DataFrame:
    """Drop events whose payload contains any banned phrase — the batch
    ``operators/blocklist.py`` gate exposed as a streaming interceptor
    (the reference's registry-by-type extension seam: a new type name
    plus an Event => Event function). cfg: ``patterns`` (required),
    ``column`` (default 'value'), ``engine`` (default 'auto')."""
    from atiesh_spark.operators.blocklist import blocklist_filter

    return blocklist_filter(
        df,
        cfg.get("column", "value"),
        cfg["patterns"],
        engine=cfg.get("engine", "auto"),
    )


def apply_normalize(df: DataFrame, cfg: dict) -> DataFrame:
    """Unicode-normalize the payload in-stream (functions/text.py
    normalize_text — the q114 contract): canonical composition, case
    folding, whitespace collapse before any downstream hash/dedup/
    tokenize step. cfg: ``column`` (default 'value'), ``form``
    (default 'NFC'), ``lowercase``/``strip_accents``/
    ``collapse_whitespace`` booleans."""
    from atiesh_spark.functions.text import normalize_text

    col = cfg.get("column", "value")
    return df.withColumn(
        col,
        normalize_text(
            col,
            form=cfg.get("form", "NFC"),
            lowercase=cfg.get("lowercase", True),
            strip_accents=cfg.get("strip_accents", False),
            collapse_whitespace=cfg.get("collapse_whitespace", True),
        ),
    )


_INTERCEPTORS = {
    "transparent": apply_transparent,
    "devnull": apply_devnull,
    "filter": apply_filter,
    "transform": apply_transform,
    "blocklist": apply_blocklist,
    "normalize": apply_normalize,
}


def build_interceptor_chain(df: DataFrame, chain: list[dict]) -> DataFrame:
    """Apply interceptors in descending priority (ties keep spec order),
    like the reference's priority sort at assembly (Source.scala:88)."""
    ordered = sorted(
        enumerate(chain), key=lambda t: (-t[1].get("priority", 0), t[0])
    )
    out = df
    for _, cfg in ordered:
        itype = cfg.get("type")
        if itype not in _INTERCEPTORS:
            raise ValueError(
                f"unknown interceptor type {itype!r}; known: {sorted(_INTERCEPTORS)}"
            )
        out = _INTERCEPTORS[itype](out, cfg)
    return out
