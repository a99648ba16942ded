"""Per-tag batch assembly.

The reference buffers events into per-tag buffers and flushes them as
``Batch(events, tag)`` on size/timeout (reference:
core/.../sink/BatchSinkSemantics.scala:25-39,155-214); the HTTP sink then
joins a batch's bodies with newlines into one request body
(HttpSink.scala:151-154).

Set-oriented equivalent: groupBy(tag) + ordered collect_list + join. In
streaming, the micro-batch trigger is the timeout and this runs inside
``foreachBatch``. The aggregation is a single shuffle on the tag key;
at 100 TB a hot tag is the skew risk — AQE skew handling plus an optional
``salt_buckets`` cap on batch size bound the per-task state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_batches(
    df: DataFrame,
    tag_col: str,
    value_col: str = "value",
    order_col: str | None = None,
    sep: str = "\n",
    max_batch_size: int | None = None,
) -> DataFrame:
    """Group rows by tag into (tag, n_events, body) batches.

    ``order_col`` makes the join order deterministic (the reference's
    mailbox order has no parallel equivalent; an explicit sort key is the
    honest replacement). ``max_batch_size`` approximates count-based flush
    by splitting a tag into ceil(n/size) sub-batches.
    """
    order = order_col or value_col
    if max_batch_size is not None:
        # Sub-batch id = rank within tag / size: keeps count-flush parity
        # without driver state. One extra shuffle, same key.
        from pyspark.sql.window import Window

        w = Window.partitionBy(tag_col).orderBy(order)
        df = df.withColumn(
            "__sub_batch", ((F.row_number().over(w) - F.lit(1)) / F.lit(max_batch_size)).cast("long")
        )
        group_cols = [tag_col, "__sub_batch"]
    else:
        group_cols = [tag_col]

    agg = (
        df.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_sort(F.collect_list(F.struct(F.col(order).alias("o"), F.col(value_col).cast("string").alias("v")))).alias("__items"),
        )
        .withColumn("body", F.array_join(F.transform("__items", lambda s: s["v"]), sep))
        .drop("__items")
    )
    if max_batch_size is not None:
        agg = agg.drop("__sub_batch")
    return agg
