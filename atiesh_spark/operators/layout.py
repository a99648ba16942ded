"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

A 100 TB table filtered on TWO dimensions (time AND tenant, part AND
supplier) prunes poorly when files are sorted on either one alone: the
second dimension's values smear across every file. Interleaving the
bits of both dimensions into one Morton key and range-writing on it
bounds EVERY dimension's min/max per file, so scans filtered on any
subset of the dimensions skip most files — the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Everything here is codegen integer bit-math (shiftleft/or) — no UDF, no
shuffle for key computation; the only exchange is the range/bucket write
the caller chooses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each column into a Morton key.

    Bit ``i`` of column ``j`` lands at position ``i * len(cols) + j`` —
    for two 8-bit dims that is the classic z-curve over a 256x256 grid.
    Columns must already be non-negative ints in ``[0, 2**bits)``; mod or
    width-bucket them first (the caller owns the value->cell mapping).
    ``bits * len(cols)`` must fit a signed long (<= 62).

    The expansion is ``bits * len(cols)`` shift/or terms — all
    whole-stage-codegen, evaluated once per row with zero exchanges.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if not 1 <= bits * len(cols) <= 62:
        raise ValueError("bits * len(cols) must be in [1, 62] to fit a long")
    ndims = len(cols)
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        col = col.cast("long")
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(col, i).bitwiseAND(F.lit(1)), i * ndims + j)
            )
    return key


def zorder_layout_report(
    df: DataFrame,
    dim_cols: list[str],
    bits: int = 8,
    bucket_bits: int = 4,
) -> DataFrame:
    """Bucket rows by Morton-key prefix and report per-bucket dim bounds.

    Buckets are the top ``bucket_bits`` bits of the z-key (2**bucket_bits
    fixed-width buckets) — a pure projection plus one groupBy, no global
    sort, unlike ntile/range layouts that funnel through a single-task
    ordering. Output per bucket: ``n_rows`` plus ``min_<dim>``/
    ``max_<dim>`` for every dimension — the footer stats a format like
    parquet would persist, and exactly what a reader consults to skip
    buckets. The z-curve guarantee under test: every bucket's per-dim
    span is ~2**(bits - bucket_bits/ndims) cells, not the full domain.

    At 100 TB this groupBy is the report path only; the write path is
    ``df.repartitionByRange(col("zkey")).sortWithinPartitions("zkey")``
    feeding the sized-file compaction writer (operators/compaction.py).
    """
    for c in dim_cols:
        if c not in df.columns:
            raise KeyError(f"dim column {c!r} missing")
    if not 0 <= bucket_bits <= bits * len(dim_cols):
        raise ValueError("bucket_bits must be in [0, bits * ndims]")
    keyed = df.withColumn("zkey", zorder_key(dim_cols, bits=bits))
    bucket = F.shiftright("zkey", bits * len(dim_cols) - bucket_bits)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in dim_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return keyed.groupBy(bucket.alias("bucket")).agg(*aggs)
