"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these explicit utilities cover the two shapes AQE cannot fix:

- salted_aggregate: a groupBy where one key holds a large share of all
  rows — partial aggregation helps but the final shuffle still lands the
  hot key on one task. Two-phase: aggregate on (key, salt), then merge.
  Correct for any algebraic aggregate expressed as (partial, merge).
- salted_broadcast_join: joining a huge skewed fact side against a
  medium dim that must shuffle: replicate the dim per salt instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic salt in [0, buckets) from a hash of the full row.

    NOT F.rand(): a random salt is assigned pre-shuffle, and if a map
    task is re-executed after some reducers already fetched its output
    (routine at scale), recomputed rows could draw different salts and
    be double-counted or lost. A content hash re-salts identically on
    retry. Caveat: fully identical duplicate rows share a salt bucket —
    for hot keys whose rows differ in any column (the normal case) the
    spread is uniform.
    """
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(F.struct(*df.columns)), F.lit(buckets)).cast("int")
    )


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    partial_aggs compute per (key, salt); merge_aggs combine the bucket
    partials per key (e.g. partial count -> sum of counts, partial sum
    -> sum of sums, partial min -> min of mins). The hot key's work
    spreads over ``buckets`` tasks; the merge shuffle moves only
    buckets-per-key rows.
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[c.alias(n) for n, c in merge_aggs.items()]
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe fact-dim join without shuffling the fact side.

    The dim is exploded ``buckets``x with a salt column and the join key
    becomes (on, salt): every fact partition finds its dim rows locally
    (broadcast), and no single reducer owns a hot key. Use when the dim
    is too big for a plain broadcast to be free but replication x
    buckets still fits executor memory.

    Only fact-preserving join types are allowed: right/full outer would
    emit one row PER SALT for every unmatched dim key (the dim side is
    replicated by construction).
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_broadcast_join supports fact-preserving joins only, got {how!r}"
        )
    salted_fact = with_salt(fact, buckets)
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = salted_fact.join(F.broadcast(salted_dim), [on, "__salt"], how)
    return out.drop("__salt")


def key_skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 20,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Pre-shuffle skew diagnostics: the top-``top_k`` hottest join/agg
    keys with their row counts, share of the table, ratio to the mean
    key load, and the salt bucket count that would spread each onto
    ~``target_rows_per_task``-row tasks.

    Output: (keys..., n_rows, frac_of_total, skew_ratio, suggested_salt,
    rank) — the report to run BEFORE committing to a join/groupBy
    strategy on a new dataset: a skew_ratio in the hundreds says "salt
    this key or let AQE split it"; suggested_salt feeds straight into
    ``with_salt``/``salted_aggregate``.

    Plan: one partial-aggregated count shuffle on the keys, a
    TakeOrderedAndProject for the top-k (never a global sort), and the
    single-row totals frame joined back by broadcast.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__total"), F.avg("n_rows").alias("__mean")
    )
    top = counts.orderBy(F.desc("n_rows"), *key_cols).limit(top_k)
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("frac_of_total"),
            F.round(F.col("n_rows") / F.col("__mean"), 2).alias("skew_ratio"),
            F.greatest(
                F.lit(1),
                F.ceil(F.col("n_rows") / F.lit(target_rows_per_task)).cast("int"),
            ).alias("suggested_salt"),
        )
        .withColumn(
            "rank",
            # window over <= top_k rows: the single-task sort is fine
            F.row_number().over(Window.orderBy(F.desc("n_rows"), *key_cols)),
        )
    )
