"""Full-text retrieval over the corpus: BM25 scoring and top-k search.

Reference behavioral spec: the survey's text-analysis family (SURVEY.md
§2 — token counting / inverted index); the ranking function is the
classic Okapi BM25 (Robertson & Zaragoza 2009, "The Probabilistic
Relevance Framework: BM25 and Beyond"). In a training-data pipeline this
is the workhorse for targeted curation ("pull the 10k docs most about
X"), retrieval-based decontamination, and building retrieval training
pairs — the lexical complement of the embedding ANN operators in
``similarity.py``.

Scale design — work is proportional to the QUERY's postings, not the
corpus:

1. Document length (``dl``) is row-local (``F.size(split(...))``) —
   zero shuffles, computed in the same scan that tokenizes.
2. The (doc, term) tf table is filtered to the query's terms AT THE
   EXPLODE (an ``isin`` over a literal list, pushed inside the
   codegen stage), so the only shuffle — the tf groupBy — carries
   |query terms| rows per matching doc, never the corpus vocabulary.
3. ``df`` (per-term document frequency) and ``avgdl``/``N`` are
   term-count-sized / 1-row aggregates broadcast back; the final
   ranking is a TakeOrderedAndProject, never a global sort.

At 100 TB with a *persisted* index one would pre-materialize the tf
table partitioned by term (that is ``corpus.inverted_index``); this
operator is the query-time path and deliberately shares its tokenizer
(whitespace split, empty-token drop) so scores agree with the index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atiesh_spark.functions.text import ws_tokens


def _bm25_term_score(k1: float, b: float):
    """The Okapi BM25 per-(doc, term) score expression over the shared
    internal columns (__tf, __df, __dl, __n, __avgdl) — ONE definition
    so the single-query and batch paths cannot diverge."""
    return (
        F.log(1.0 + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5))
        * F.col("__tf")
        * (k1 + 1.0)
        / (F.col("__tf") + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl")))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Top-``k`` documents for a bag of query terms by Okapi BM25:
    (id_col, n_terms_hit, score), score descending with id tiebreak.

    score(d) = sum over query terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))  — the standard
    "+1" form that stays positive even for terms in most documents.

    Duplicate query terms are deduplicated (a bag-of-words query counts
    each term once — repeat weighting belongs in the caller's term
    weights, not silent double-scoring). Scores are rounded BEFORE
    ranking so tie-breaks (then id asc) are engine-independent.
    """
    from atiesh_spark.operators.dedup import _fanout

    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    if k <= 0:
        raise ValueError("k must be positive")

    base = _fanout(docs.select(id_col, text_col)).select(
        F.col(id_col),
        ws_tokens(text_col).alias("__toks"),
    )
    # dl is row-local; N and avgdl are one broadcast row for the scorer.
    lengths = base.select(F.col(id_col), F.size("__toks").alias("__dl"))
    corpus = lengths.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    # Only the query's postings survive into the tf shuffle. Explode
    # the tokenize EXPRESSION, not the __toks attribute: explode over
    # an attribute makes InferFiltersFromGenerate add size(..) > 0 and
    # pushdown substitutes the tokenizer into that filter — the split
    # ran 3x per row (2x in the pushed filter, 1x in the Project).
    tf = (
        _fanout(docs.select(id_col, text_col))
        .select(F.col(id_col), F.explode(ws_tokens(text_col)).alias("__t"))
        .filter(F.col("__t").isin(terms))
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(corpus))
        .select(
            F.col(id_col),
            _bm25_term_score(k1, b).alias("__s"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.round(F.sum("__s"), round_to).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def bm25_join(
    docs: DataFrame,
    queries: DataFrame,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Batch retrieval: top-``k`` documents PER QUERY for a whole table
    of queries — (query_id_col, id_col, n_terms_hit, score, rank).
    The shape that builds retrieval training sets (q/d pairs for a
    reranker), runs decontamination sweeps, and serves evaluation
    suites — one plan instead of |queries| separate jobs.

    Plan: queries tokenize into a (query_id, term) table that is
    DISTINCT per query and BROADCAST against the corpus tf stream, so
    the per-doc work is |matching terms across all queries| and the
    corpus still shuffles once for tf + once per (query, doc) group.
    Per-term df and the corpus stats stay exact and query-independent
    (computed over the full corpus once, broadcast). Ranking is a
    per-query window over candidate docs only — a doc scores for a
    query only if it shares at least one term. Scores rounded before
    ranking, doc-id tiebreak (same contract as :func:`bm25_topk`,
    which this degenerates to for a single query).

    The query table must be broadcast-sized (thousands to low
    millions of terms) — the standard asymmetry of batch retrieval;
    for corpus-vs-corpus matching use the similarity operators.
    """
    from pyspark.sql import Window

    from atiesh_spark.operators.dedup import _fanout

    if k <= 0:
        raise ValueError("k must be positive")
    qterms = (
        queries.select(
            F.col(query_id_col).alias("__qid"),
            F.explode(ws_tokens(query_text_col)).alias("__t"),
        )
        .distinct()
    )
    base = _fanout(docs.select(id_col, text_col)).select(
        F.col(id_col),
        ws_tokens(text_col).alias("__toks"),
    )
    lengths = base.select(F.col(id_col), F.size("__toks").alias("__dl"))
    corpus = lengths.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    # tf over the union of all query terms (semi-filtered at the explode),
    # then re-joined to per-query term lists — df stays per-TERM exact.
    # Explode the tokenize EXPRESSION (see bm25_topk: an attribute
    # explode triggers an inferred size() filter that re-runs the split).
    all_terms = qterms.select("__t").distinct()
    tf = (
        _fanout(docs.select(id_col, text_col))
        .select(F.col(id_col), F.explode(ws_tokens(text_col)).alias("__t"))
        .join(F.broadcast(all_terms), "__t", "left_semi")
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    scored = (
        tf.join(F.broadcast(qterms), "__t")
        .join(F.broadcast(dfreq), "__t")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(corpus))
        .select(
            F.col("__qid"),
            F.col(id_col),
            _bm25_term_score(k1, b).alias("__s"),
        )
    )
    per_pair = scored.groupBy("__qid", id_col).agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.round(F.sum("__s"), round_to).alias("score"),
    )
    # TWO-PHASE top-k (the curation.cap_per_group discipline): a plain
    # row_number() OVER (PARTITION BY query) funnels every candidate of
    # a query through ONE task — and a stopword-bearing query's
    # candidate set is nearly the corpus. Phase 1 ranks within
    # (query, md5-shard of doc id) and keeps k per shard, bounding the
    # hottest task; phase 2 re-ranks the <= k * shards survivors per
    # query — provably identical output (each global top-k row is in
    # its own shard's top-k).
    from atiesh_spark.operators.sampling import hash_bucket

    shards = 16
    w1 = Window.partitionBy("__qid", hash_bucket(id_col, shards)).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    w2 = Window.partitionBy("__qid").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        per_pair.withColumn("rank", F.row_number().over(w1))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .withColumnRenamed("__qid", query_id_col)
    )


def bm25_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Build the persisted-index artifact BM25 scoring runs from:
    ``(postings, doclens)`` where ``postings`` is the exact
    (token, id_col, tf) table and ``doclens`` is (id_col, dl).

    This is the at-scale complement of :func:`bm25_topk`'s query-time
    path (and the score-exact sibling of ``corpus.inverted_index``,
    whose capped posting lists serve boolean search / leak audits, not
    ranking): materialize both frames once — in production partitioned/
    bucketed BY TOKEN so a query prunes to its terms' partitions
    instead of scanning the index — and every subsequent query costs
    |query postings|, not a corpus scan. The SAME tokenizer
    (``ws_tokens``: whitespace split, empty drop) and the same exact
    statistics feed both paths, and :func:`bm25_topk_indexed` shares
    the single ``_bm25_term_score`` definition, so query-time and
    indexed retrieval provably produce identical rankings
    (differential-tested, and q128 grades the indexed path against the
    same oracle family as q107).
    """
    from atiesh_spark.operators.dedup import _fanout

    base = (
        _fanout(docs.select(id_col, text_col))
        .select(
            F.col(id_col),
            ws_tokens(text_col).alias("__toks"),
        )
        # both output frames derive from this: pin it so the corpus is
        # tokenized ONCE, not once per materialized frame (the
        # bpe_learn word-table discipline)
        .localCheckpoint()
    )
    doclens = base.select(F.col(id_col), F.size("__toks").alias("dl"))
    postings = (
        base.select(F.col(id_col), F.explode("__toks").alias("token"))
        .groupBy("token", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return postings, doclens


def bm25_topk_indexed(
    postings: DataFrame,
    doclens: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """:func:`bm25_topk` over a prebuilt :func:`bm25_index` — identical
    contract and output (id_col, n_terms_hit, score), score desc with
    id tiebreak, scores rounded before ranking.

    Work is |query postings| only: the term filter lands on the
    postings scan (partition-pruned when the store is partitioned by
    token), per-term df is exact from the filtered postings (every
    posting of a matching term is present), and N/avgdl are one
    broadcast row off the doclens frame. No corpus text is touched —
    the reason the index exists at 100 TB.
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    if k <= 0:
        raise ValueError("k must be positive")
    corpus = doclens.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("dl").alias("__avgdl")
    )
    tf = postings.filter(F.col("token").isin(terms)).select(
        F.col(id_col), F.col("token").alias("__t"), F.col("tf").alias("__tf")
    )
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    scored = (
        tf.join(F.broadcast(dfreq), "__t")
        .join(doclens.select(F.col(id_col), F.col("dl").alias("__dl")), id_col)
        .crossJoin(F.broadcast(corpus))
        .select(F.col(id_col), _bm25_term_score(k1, b).alias("__s"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms_hit"),
            F.round(F.sum("__s"), round_to).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


class StreamingBm25Index:
    """Maintain the :func:`bm25_index` artifact incrementally from a
    document stream — the lexical twin of the streaming ANN index — as
    a ``foreachBatch`` function.

    Both frames are per-document pure functions (a doc's postings and
    length depend on its text alone), so maintenance is append-shaped
    and exact: batch docs are tokenized once, doc ids already present
    are REPLACED (re-ingested documents take their new postings), a key
    duplicated WITHIN one batch collapses to its deterministic max text
    before indexing (in-batch replays are a no-op; deliver one version
    per batch — the store is keyed state, not a change log),
    untouched rows pass through, and after N batches the store equals
    ``bm25_index`` over the current corpus — which means
    :func:`bm25_topk_indexed` over the maintained store scores
    IDENTICALLY to a from-scratch build (corpus stats N/avgdl/df are
    recomputed exactly from the store at query time, so they are never
    stale). Replayed batches recompute identical rows; the two
    ``VersionedStore`` backends converge like every maintenance loop
    here.

    At 100 TB: partition the postings store by token (or token hash
    bucket) so queries prune to their terms, and compact versions as
    usual. The anti-join rewrite of untouched rows is the same
    contract as ``StreamingScd2`` — bucket by key and use dynamic
    partition overwrite to avoid rewriting untouched buckets.
    """

    def __init__(
        self,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        keep_versions: int = 2,
    ) -> None:
        from atiesh_spark.sources.versioned import VersionedStore

        self.id_col, self.text_col = id_col, text_col
        # postings/doclens layout is versioned so a future tokenizer or
        # schema change refuses to join against old state instead of
        # silently scoring against a half-migrated index
        # (sources/versioned.py format stamping).
        self.postings = VersionedStore(
            f"{path}/postings",
            keep_versions=keep_versions,
            format_tag="bm25/postings-v1",
        )
        self.doclens = VersionedStore(
            f"{path}/doclens",
            keep_versions=keep_versions,
            format_tag="bm25/doclens-v1",
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # ONE row per key even when the batch carries duplicates (exact
        # in-batch replays, or several versions of a re-ingested doc):
        # collapse to the deterministic max text BEFORE indexing —
        # otherwise tf sums across versions and doclens double-counts N.
        # The store is keyed state, not a change log; deliver one
        # version per batch for meaningful CDC semantics.
        one = (
            batch_df.select(self.id_col, self.text_col)
            .groupBy(self.id_col)
            .agg(F.max(self.text_col).alias(self.text_col))
        )
        post, lens = bm25_index(one, self.id_col, self.text_col)
        prev_post = self.postings.read_before(spark, batch_id)
        prev_lens = self.doclens.read_before(spark, batch_id)
        if prev_post is not None:
            keys = batch_df.select(self.id_col).distinct()
            post = prev_post.join(
                F.broadcast(keys), self.id_col, "left_anti"
            ).unionByName(post)
            lens = prev_lens.join(
                F.broadcast(keys), self.id_col, "left_anti"
            ).unionByName(lens)
        self.postings.write(post, batch_id)
        self.doclens.write(lens, batch_id)

    def read(self, spark) -> tuple[DataFrame, DataFrame]:
        return self.postings.read(spark), self.doclens.read(spark)

    def topk(self, spark, query_terms: list[str], k: int = 10,
             k1: float = 1.2, b: float = 0.75, round_to: int = 6) -> DataFrame:
        """BM25 top-k against the CURRENT index — exact corpus stats
        recomputed from the store, same contract as bm25_topk."""
        post, lens = self.read(spark)
        return bm25_topk_indexed(
            post, lens, query_terms, id_col=self.id_col, k=k, k1=k1, b=b,
            round_to=round_to,
        )


def retrieval_eval(
    runs: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Per-query ranking-quality metrics at cutoff ``k`` — the
    evaluation loop every retrieval/RAG pipeline closes with
    (Järvelin & Kekäläinen TOIS 2002 for NDCG; binary relevance):

    - ``mrr``       reciprocal rank of the first relevant hit in the
                    top ``k`` (0.0 if none),
    - ``ndcg_at_k`` DCG over the top ``k`` with gain 1/log2(rank+1),
                    normalized by the ideal DCG of min(k, n_rel),
    - ``recall_at_k`` relevant-in-top-k / n_rel,
    - ``n_rel``     total relevant documents for the query.

    ``runs``: (query_id, doc_id, rank) with 1-based ranks;
    ``qrels``: (query_id, doc_id) — the binary relevance set.

    Queries present in ``runs`` but with no qrels row emit zero
    metrics with ``n_rel`` 0 (NULL-free output, driver canon). Plan
    shape: ONE equi-join of the rank-filtered top-k against qrels,
    two grouped aggregations (per-query metrics, per-query n_rel),
    and an ideal-DCG computed JVM-side from a ``sequence`` fold —
    never a per-rank explode of the corpus. At 100 TB the cost is
    ∝ |runs ∩ top-k| + |qrels|, independent of corpus size.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    topk = runs.filter(F.col("rank") <= k)
    marked = topk.join(
        qrels.select("query_id", "doc_id", F.lit(1).alias("__rel")),
        ["query_id", "doc_id"],
        "left",
    )
    per_q = marked.groupBy("query_id").agg(
        F.max(
            F.when(F.col("__rel").isNotNull(), 1.0 / F.col("rank"))
        ).alias("__mrr"),
        F.sum(
            F.when(F.col("__rel").isNotNull(),
                   1.0 / F.log2(F.col("rank") + 1))
        ).alias("__dcg"),
        F.count(F.col("__rel")).alias("__hits"),
    )
    n_rel = qrels.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    joined = per_q.join(n_rel, "query_id", "left").na.fill(
        {"n_rel": 0}
    )
    ideal_n = F.least(F.lit(k), F.col("n_rel"))
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.greatest(ideal_n, F.lit(1))),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1.0),
    )
    return joined.select(
        "query_id",
        F.round(F.coalesce(F.col("__mrr"), F.lit(0.0)), round_to)
            .alias("mrr"),
        F.round(
            F.when(
                F.col("n_rel") > 0,
                F.coalesce(F.col("__dcg"), F.lit(0.0)) / idcg,
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias(f"ndcg_at_{k}"),
        F.round(
            F.when(
                F.col("n_rel") > 0,
                F.col("__hits").cast("double") / F.col("n_rel"),
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias(f"recall_at_{k}"),
        F.col("n_rel").cast("long").alias("n_rel"),
    )


def positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional postings relation: (token, id_col, positions) with
    1-based token positions sorted ascending — the phrase-capable
    extension of the tf-only index (bm25_index / inverted_index). One
    explode + one map-side-combined groupBy; per (token, doc) the
    positions array is bounded by the doc's own length. Persist
    partitioned by token at scale so a phrase query prunes to its
    terms' partitions.
    """
    from atiesh_spark.functions.text import ws_tokens
    from atiesh_spark.operators.dedup import _fanout

    # posexplode the tokenize EXPRESSION (see bm25_topk: an attribute
    # explode triggers an inferred size() filter that re-runs the split)
    return (
        _fanout(docs.select(id_col, text_col))
        .select(
            id_col,
            F.posexplode(ws_tokens(F.col(text_col))).alias("__p0", "token"),
        )
        .groupBy("token", id_col)
        .agg(
            F.array_sort(F.collect_list(F.col("__p0") + 1))
            .alias("positions")
        )
    )


def phrase_search(
    postings: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase matching over positional postings: (id_col,
    n_occurrences) for every document containing the consecutive
    token sequence ``phrase``.

    Work is proportional to the PHRASE TERMS' postings, never the
    corpus: each term's postings filter by a literal token (pushed to
    the scan / partition pruning on a token-partitioned store), the
    k relations equi-join on the doc id, and alignment is one
    row-local HOF — occurrences are the positions p of the first term
    with p+j present in term j's positions for every j. Duplicate
    phrase terms are handled naturally (the same postings row joins
    under each alias).
    """
    if len(phrase) < 2:
        raise ValueError("phrase must have at least 2 tokens")
    joined = None
    for j, term in enumerate(phrase):
        side = (
            postings.filter(F.col("token") == term)
            .select(F.col(id_col), F.col("positions").alias(f"__pos{j}"))
        )
        joined = side if joined is None else joined.join(side, id_col)
    def aligned(p):
        out = None
        for j in range(1, len(phrase)):
            c = F.array_contains(F.col(f"__pos{j}"), p + j)
            out = c if out is None else out & c
        return out

    return joined.select(
        F.col(id_col),
        F.size(F.filter(F.col("__pos0"), aligned))
        .cast("bigint").alias("n_occurrences"),
    ).filter(F.col("n_occurrences") > 0)


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    c: int = 60,
    top_k: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher SIGIR 2009):
    fuse ranked lists by fused(d) = sum over lists of 1/(c + rank_d) —
    the standard hybrid-retrieval combiner for a lexical (BM25) and a
    dense (embedding) ranking, robust to incomparable score scales
    because only RANKS enter. Returns the fused top_k:
    (id_col, n_lists, rrf), ordered by rounded fused score with id
    tie-break so the cut is engine-deterministic.

    Scale shape: each input ranking is already top-k-bounded, so the
    union + groupBy runs on lists-x-k rows — a driver-bounded digest,
    never the corpus. With two lists the per-id sum is a single
    commutative addition (bit-exact under any execution order); for
    many lists the final rounding absorbs summation order.
    """
    if len(rankings) < 2:
        raise ValueError("rrf_fuse needs at least 2 rankings")
    if c < 1 or top_k < 1:
        raise ValueError("c and top_k must be >= 1")
    contrib = None
    for r in rankings:
        side = r.select(
            F.col(id_col),
            (1.0 / (F.lit(c) + F.col(rank_col))).alias("__s"),
        )
        contrib = side if contrib is None else contrib.unionByName(side)
    fused = contrib.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        F.round(F.sum("__s"), round_to).alias("rrf"),
    )
    return fused.orderBy(
        F.desc("rrf"), F.asc(id_col)
    ).limit(top_k)


class StreamingPositionalIndex:
    """foreachBatch maintenance loop for the positional postings index
    — continuous crawler indexing: each micro-batch's documents are
    (re-)indexed and UPSERTED by document id into a
    :class:`~atiesh_spark.sources.versioned.VersionedStore` (a
    re-ingested doc's old postings drop via an anti-join on the
    batch's id set, a broadcast-sized frame; history rows are touched
    only by that anti-join, never re-tokenized). Batch B reads the
    newest state < B and overwrites v{B}, so Structured Streaming's
    batch replays converge — the StreamingWinnowIndex discipline.
    ``postings(spark)`` serves :func:`phrase_search` directly; by
    construction it equals the batch :func:`positional_postings` over
    the latest version of every ingested doc (graded end-to-end by
    the q233 replay query against q231's literal oracle).
    """

    def __init__(
        self,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        keep_versions: int = 2,
    ) -> None:
        from atiesh_spark.sources.versioned import VersionedStore

        # positional postings layout stamp — same rationale as
        # StreamingBm25Index (sources/versioned.py format stamping)
        self.store = VersionedStore(
            path, keep_versions, format_tag="positional/postings-v1"
        )
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # Within-batch dedup FIRST: two fetches of the same doc in one
        # micro-batch would otherwise have their tokenizations MERGED
        # by positional_postings' groupBy(token, doc), yielding
        # positions belonging to neither version (phantom phrase
        # hits that persist, since later upserts only anti-join on
        # id). One deterministic version per id survives — max by
        # md5(text); a source with fetch timestamps should pre-dedup
        # on those instead.
        batch_df = batch_df.groupBy(self.id_col).agg(
            F.expr(
                f"max_by({self.text_col}, md5(cast({self.text_col} "
                "as binary)))"
            ).alias(self.text_col)
        )
        new = positional_postings(batch_df, self.id_col, self.text_col)
        prev = self.store.read_before(batch_df.sparkSession, batch_id)
        if prev is None:
            merged = new
        else:
            ids = batch_df.select(self.id_col).distinct()
            merged = prev.join(
                F.broadcast(ids), self.id_col, "left_anti"
            ).unionByName(new)
        self.store.write(merged, batch_id)

    def postings(self, spark: SparkSession) -> DataFrame:
        # the upsert's anti-join reorders columns (join key first);
        # pin the positional_postings contract order on the way out
        return self.store.read(spark).select(
            "token", self.id_col, "positions"
        )
