"""Sink routing: first-accepted predicate dispatch.

The reference routes each event to the FIRST sink whose ``accept(event)``
returns true, discarding (with a warn counter) events no sink accepts
(reference: core/.../source/Source.scala:46-56,339-365).

Set-oriented equivalent: an ordered CASE WHEN producing a ``route``
column; unmatched rows get NULL and are filtered (the discard). Each
sink's writer then consumes ``df.filter(route == name)`` — in streaming,
one filter per sink inside a single ``foreachBatch`` so the batch is
scanned once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def route_first_accepted(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    route_col: str = "route",
    keep_unmatched: bool = False,
) -> DataFrame:
    """Tag each row with the first matching sink name.

    ``rules`` is an ordered list of (sink_name, accept_predicate) — order
    is routing priority, like the configured sink list order.
    """
    if not rules:
        raise ValueError("route_first_accepted requires at least one rule")
    expr = F.when(rules[0][1], F.lit(rules[0][0]))
    for name, pred in rules[1:]:
        expr = expr.when(pred, F.lit(name))
    out = df.withColumn(route_col, expr)
    if keep_unmatched:
        return out
    return out.filter(F.col(route_col).isNotNull())
