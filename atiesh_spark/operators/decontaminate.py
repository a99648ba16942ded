"""Benchmark decontamination: drop training docs that overlap an eval set.

The training-data hygiene step every serious pretraining pipeline runs
(GPT-3 App. C / PaLM / Llama all document a variant): a corpus document
is CONTAMINATED when too many of its word n-grams also appear in a
benchmark document — training on it would leak the eval. The metric is
n-gram containment in the doc:

    overlap_frac(doc, bench) = |shingles(doc) ∩ shingles(bench)|
                               / |shingles(doc)|

Spark-first plan: both sides shingle through the same fanout-guarded
``word_shingles`` explode; the benchmark side is tiny relative to the
corpus (eval suites are thousands of docs, the corpus is the 100 TB
side), so its (bench_id, shingle) frame is BROADCAST and the corpus
shingle stream never shuffles for the match — the only wide exchanges
are the two per-doc groupBy counts. Set ``broadcast_bench=False`` for
an unusually large benchmark and the match becomes an ordinary shuffle
hash join on the shingle.

Deterministic by construction (no hashing even needed — set algebra on
the shingles themselves), so results are engine-independent and
DuckDB-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from atiesh_spark.operators.dedup import word_shingles


def contamination_pairs(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 2,
    broadcast_bench: bool = True,
    round_to: int = 4,
) -> DataFrame:
    """Per (corpus doc, benchmark doc) overlap: (id_col, bench_id,
    n_shared, overlap_frac), only pairs sharing >= 1 shingle.

    ``n`` is the word-gram width: production decontamination uses 8-13
    (a 13-gram collision is near-certain leakage); small n values are
    for short-document corpora and tests. Docs with fewer than ``n``
    tokens have no shingles, hence no pairs (and can never be flagged).
    """
    d_sh = word_shingles(docs, id_col, text_col, n=n, distinct=True)
    b_sh = word_shingles(bench, bench_id_col, bench_text_col, n=n, distinct=True)
    d_counts = d_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n_doc"))
    b = b_sh.select(F.col(bench_id_col).alias("bench_id"), "sh")
    if broadcast_bench:
        b = F.broadcast(b)
    shared = (
        d_sh.join(b, "sh")
        .groupBy(id_col, "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return shared.join(d_counts, id_col).select(
        id_col,
        "bench_id",
        "n_shared",
        F.round(F.col("n_shared") / F.col("__n_doc"), round_to).alias("overlap_frac"),
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 2,
    broadcast_bench: bool = True,
) -> DataFrame:
    """The corpus minus contaminated docs: every doc whose overlap_frac
    with ANY benchmark doc reaches ``threshold`` is removed (left-anti
    join on the flagged id set — all original columns survive).
    """
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")
    bad = (
        contamination_pairs(
            docs, bench, id_col, text_col, bench_id_col, bench_text_col,
            n=n, broadcast_bench=broadcast_bench,
        )
        .filter(F.col("overlap_frac") >= threshold)
        .select(id_col)
        .distinct()
    )
    return docs.join(bad, id_col, "left_anti")
