"""Word-level interpolated Kneser-Ney bigram language model.

The reference engine (whisperaven/atiesh) is an event mover with no
modeling surface; this extends the engine for its LLM-data-pipeline
role: a KenLM-style word n-gram model trained ON the corpus and used
to score documents (bits per bigram / perplexity) is the classic
data-quality signal (CCNet, Gopher, RedPajama all gate on LM scores).
The char-trigram scorer (textstats.ngram_lm_scores, q94) covers the
charset-bounded broadcast regime; this operator covers the real
word-vocabulary regime where the model itself is a distributed
relation.

Math (Kneser & Ney 1995; Chen & Goodman 1998, interpolated form with
a single fixed discount d):

    P_KN(w2|w1) = max(c(w1 w2) - d, 0) / c(w1)
                  + (d * N1+(w1 *) / c(w1)) * N1+(* w2) / N1+(* *)

where c(w1) is the bigram-context total (sum over w2), N1+(w1 *) the
distinct continuations of w1, N1+(* w2) the distinct left contexts of
w2 (the continuation probability that makes KN beat add-k), and
N1+(* *) the number of distinct bigrams.

Scale shape: the corpus shuffles ONCE into the bigram count table
(map-side combined); c(w1)/N1+(w1 *) and N1+(* w2) are two grouped
passes over that counts relation (vocabulary-sized, not corpus-
sized); the distinct-bigram total joins as a broadcast one-row frame.
Scoring is one (w1, w2) equi-join of the document bigrams against the
model — the join key equals the model's groupBy key, so the model
side needs no extra exchange. Nothing collects to the driver.

Determinism: every probability is arithmetic over exact integer
counts in a fixed expression shape, so Spark and a SQL oracle compute
bit-identical doubles; per-doc means round to 4dp before any
cross-doc sum (sums of 0.0001-multiples stay 0.0001-multiples — the
registry canon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "kn_bigram_model",
    "kn_score_docs",
    "model_from_counts",
    "StreamingNgramLM",
]


def _doc_bigrams(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id_col, w1, w2) — one row per bigram occurrence (multiset).

    Reuses word_shingles (fan-out guard + materialized token array);
    tokens never contain whitespace, so splitting the 2-shingle on
    its single space is exact.
    """
    from atiesh_spark.operators.dedup import word_shingles

    sh = word_shingles(docs, id_col, text_col, n=2, distinct=False)
    return sh.select(
        F.col(id_col),
        F.substring_index("sh", " ", 1).alias("w1"),
        F.substring_index("sh", " ", -1).alias("w2"),
    )


def kn_bigram_model(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Train the model: (w1, w2, c12, c1, r1, l2, p_kn).

    c12 = bigram count, c1 = context total, r1 = N1+(w1 *),
    l2 = N1+(* w2), p_kn = interpolated Kneser-Ney probability.
    The result is a DISTRIBUTED relation keyed (w1, w2) — at corpus
    scale the vocabulary does not broadcast, and it does not need to:
    scoring joins on the same key.
    """
    bg = _doc_bigrams(docs, id_col, text_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    return model_from_counts(c12, discount)


def model_from_counts(c12: DataFrame, discount: float = 0.75) -> DataFrame:
    """Derive the full KN model from a (w1, w2, c12) counts relation —
    the counts are the model's sufficient statistic (mergeable by
    summing c12), which is what makes the incremental
    :class:`StreamingNgramLM` exact: context totals, continuation
    counts, and the distinct-bigram total are all functions of the
    counts table alone, never of the raw corpus."""
    w1s = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("r1")
    )
    w2s = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("l2"))
    total = c12.agg(F.count(F.lit(1)).alias("d_total"))
    d = F.lit(float(discount))
    return (
        c12.join(w1s, "w1")
        .join(w2s, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1", "w2", "c12", "c1", "r1", "l2",
            (
                F.greatest(F.col("c12") - d, F.lit(0.0)) / F.col("c1")
                + (d * F.col("r1") / F.col("c1"))
                * (F.col("l2") / F.col("d_total"))
            ).alias("p_kn"),
        )
    )


def kn_score_docs(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Score each document against a trained model: (id_col,
    n_bigrams, oov_bigrams, mean_log2p).

    mean_log2p is the per-doc mean of log2 P_KN over the doc's IN-
    VOCABULARY bigrams, rounded to ``round_to`` (negative; closer to
    0 = better modeled). Bigrams absent from the model are counted in
    ``oov_bigrams`` and excluded from the mean (when scoring the
    training corpus itself, oov_bigrams is 0 everywhere). Documents
    with fewer than 2 tokens produce no bigrams and no row.
    """
    bg = _doc_bigrams(docs, id_col, text_col)
    scored = bg.join(
        model.select("w1", "w2", "p_kn"), ["w1", "w2"], "left"
    )
    return scored.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("p_kn").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint").alias("n_bigrams"),
        F.sum(
            F.when(F.col("p_kn").isNull(), F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint").alias("oov_bigrams"),
        F.round(
            F.sum(F.log2("p_kn")) / F.sum(
                F.when(F.col("p_kn").isNotNull(), F.lit(1))
            ),
            round_to,
        ).alias("mean_log2p"),
    )


class StreamingNgramLM:
    """foreachBatch maintenance loop for the KN bigram model.

    Each micro-batch's bigram counts fold into a
    :class:`~atiesh_spark.sources.versioned.VersionedStore` of
    (w1, w2, c12) — the model's mergeable sufficient statistic. Batch
    B reads the newest state < B and overwrites v{B}, so a replayed
    batch (Structured Streaming re-runs a batch id after failure)
    converges to the identical counts — effectively-once without
    touching raw history. The store holds VOCABULARY^2-bounded count
    rows, never corpus text; per batch the work is the batch's own
    bigram explode plus a union-groupBy against the count relation.

    ``model(spark)`` derives the full interpolated-KN relation from
    the current counts via :func:`model_from_counts`; by construction
    it equals the batch :func:`kn_bigram_model` over everything
    ingested so far (graded end-to-end by the q220 replay query
    against the q218 batch oracle).
    """

    def __init__(
        self,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        discount: float = 0.75,
        keep_versions: int = 2,
    ) -> None:
        from atiesh_spark.sources.versioned import VersionedStore

        self.store = VersionedStore(path, keep_versions)
        self.id_col = id_col
        self.text_col = text_col
        self.discount = discount

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        new = _doc_bigrams(batch_df, self.id_col, self.text_col).groupBy(
            "w1", "w2"
        ).agg(F.count(F.lit(1)).alias("c12"))
        prev = self.store.read_before(batch_df.sparkSession, batch_id)
        merged = (
            new
            if prev is None
            else prev.unionByName(new)
            .groupBy("w1", "w2")
            .agg(F.sum("c12").cast("bigint").alias("c12"))
        )
        self.store.write(merged, batch_id)

    def counts(self, spark: SparkSession) -> DataFrame:
        return self.store.read(spark)

    def model(self, spark: SparkSession) -> DataFrame:
        return model_from_counts(self.counts(spark), self.discount)
