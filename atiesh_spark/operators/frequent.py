"""Frequent-items (heavy-hitters) sketch: distributed Misra-Gries.

The report every corpus pipeline wants before filtering — top domains,
top tokens, top boilerplate candidates — WITHOUT paying a full
distinct-key shuffle. An exact ``groupBy(item).count()`` over 100 TB of
tokens shuffles every distinct key; the Misra-Gries summary instead
keeps ``k`` counters per partition (a few KB), and summaries are
MERGEABLE (Agarwal et al., PODS 2012 "Mergeable Summaries"): summing
per-item counters over partitions preserves the deterministic error
bound

    exact - n/(k+1)  <=  estimate  <=  exact

where ``n`` is the total item count. Any item with
``exact > n/(k+1)`` is guaranteed to survive the merge with a positive
estimate — the frequent-items guarantee. No randomness anywhere: the
bound is worst-case, not probabilistic (unlike count-min).

Plan shape: ONE pass over the items inside ``mapInPandas`` (the sketch
is inherently sequential per partition — exactly the "per-partition
imperative logic" case Pandas UDFs exist for), emitting <= k rows per
partition; the merge is a groupBy over <= partitions x k rows — a
few-MB shuffle regardless of corpus size. Estimates are
order-dependent within the bound (MG depends on arrival order), so
grade against the BOUND, not exact equality.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 64,
    top: int | None = None,
) -> DataFrame:
    """(item, est) Misra-Gries estimates merged across partitions.

    ``k``: counters per partition — the accuracy knob; total error is
    at most ``n/(k+1)``. ``top``: keep only the ``top`` largest
    estimates (TakeOrderedAndProject; default: all surviving items,
    <= partitions x k). NULL items are ignored (they are absence, not
    a value). Estimates NEVER exceed the exact count, and undercount
    by at most ``n/(k+1)``.
    """
    import pandas as pd

    if k < 1:
        raise ValueError("k must be >= 1")

    col = item_col

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for it in pdf[col].dropna().astype(str):
                if it in counters:
                    counters[it] += 1
                elif len(counters) < k:
                    counters[it] = 1
                else:
                    # decrement-all: O(k), amortized O(1) per arrival
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"item": list(counters), "est": list(counters.values())}
        )

    summaries = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        mg, schema="item string, est long"
    )
    merged = summaries.groupBy("item").agg(F.sum("est").alias("est"))
    if top is not None:
        merged = merged.orderBy(F.col("est").desc(), "item").limit(top)
    return merged


def heavy_hitters_report(
    df: DataFrame,
    item_col: str,
    k: int = 64,
) -> DataFrame:
    """One-row audit of the sketch against the exact counts — the
    grading/acceptance shape: (n_items, error_bound, all_within_bound,
    never_overcounts, guaranteed_items_present). Runs the EXACT
    groupBy too, so use it at test scale; production uses
    :func:`heavy_hitters` alone."""
    sketch = heavy_hitters(df, item_col, k=k)
    exact = (
        df.filter(F.col(item_col).isNotNull())
        .groupBy(F.col(item_col).cast("string").alias("item"))
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    n = df.filter(F.col(item_col).isNotNull()).count()
    bound = n // (k + 1)
    joined = exact.join(sketch, "item", "left").select(
        "item",
        "exact",
        F.coalesce("est", F.lit(0)).alias("est"),
        F.col("est").isNotNull().alias("present"),
    )
    row = joined.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.min(
            (F.col("est") <= F.col("exact"))
            & (F.col("est") >= F.col("exact") - F.lit(bound))
        ).alias("all_within_bound"),
        F.min(F.col("est") <= F.col("exact")).alias("never_overcounts"),
        F.min(
            F.when(F.col("exact") > bound, F.col("present")).otherwise(
                F.lit(True)
            )
        ).alias("guaranteed_items_present"),
    ).first()
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                int(row["n_items"]),
                int(bound),
                bool(row["all_within_bound"]),
                bool(row["never_overcounts"]),
                bool(row["guaranteed_items_present"]),
            )
        ],
        "n_items long, error_bound long, all_within_bound boolean, "
        "never_overcounts boolean, guaranteed_items_present boolean",
    )
