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


def bloom_positions(
    items: DataFrame,
    item_col: str,
    m_bits: int,
    k_hashes: int,
) -> DataFrame:
    """One-column frame ``pos`` of DISTINCT set bit positions — the
    Bloom filter as a relation. Hashing is the Kirsch-Mitzenmacher
    double scheme over md5 halves (pos_i = (h1 + i*h2) mod m, h1/h2 =
    48-bit md5 prefixes), fully deterministic and engine-portable — no
    RNG, no JVM-private sketch classes, so a filter built here can be
    rebuilt bit-identically by any engine that has md5.

    Mergeable by union-distinct (bitwise OR); size is <= min(n*k, m)
    rows of one long. Built over the SMALL side of a decontamination
    (the benchmark), it broadcasts; the corpus side never shuffles."""
    if m_bits <= 0 or k_hashes <= 0:
        raise ValueError("m_bits and k_hashes must be positive")
    # explode the positions EXPRESSION, not a "ps" alias: explode over
    # an attribute makes InferFiltersFromGenerate add size(..) > 0 and
    # pushdown substitutes the md5 hashing into that filter, doubling
    # the per-item hash work (see retrieval.bm25_topk)
    return (
        items.select(
            F.explode(
                _bloom_pos(F.col(item_col), m_bits, k_hashes)
            ).alias("pos")
        )
        .distinct()
    )


def _bloom_pos(item: Column, m_bits: int, k_hashes: int) -> Column:
    """Array of ``k_hashes`` bit positions for one item (see
    :func:`bloom_positions` for the hash scheme)."""
    h = F.md5(item.cast("binary"))
    h1 = F.conv(h.substr(1, 12), 16, 10).cast("long")
    h2 = F.conv(h.substr(13, 12), 16, 10).cast("long")
    m = F.lit(m_bits)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k_hashes - 1)),
        lambda i: (h1 + i.cast("long") * h2) % m,
    )


def decontaminate_bloom(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 3,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    broadcast_filter: bool = True,
) -> DataFrame:
    """Bloom-filter decontamination pre-screen: (id_col, n_shingles,
    n_maybe_hits, clean) where a doc is ``clean`` when NO shingle of
    its word ``n``-grams might be in the benchmark filter.

    The scale story vs :func:`decontaminate`'s exact containment: the
    exact path broadcasts the raw (bench_id, shingle) frame — fine for
    one eval suite, but a clean-room pipeline screens against the
    union of EVERY held-out set it has ever promised to exclude, and
    the bloom relation is capped at ``m_bits`` rows (125 KB of longs
    per 2^20 bits at any benchmark size) and mergeable across suites
    by union-distinct. One-sided error in the SAFE direction: no false
    negatives (a contaminated doc is never reported clean); false
    positives at the classic (1 - e^(-kn/m))^k rate just send docs to
    the exact verifier. Membership is an ALL-k-positions semi-match:
    shingle positions explode, broadcast-join the positions relation,
    and a shingle "maybe hits" when all ``k_hashes`` of its positions
    matched — one map-side-combined groupBy(doc) after it.
    """
    from atiesh_spark.functions.text import ws_tokens

    flt = bloom_positions(
        bench.select(ws_tokens(F.col(bench_text_col)).alias("__ws"))
        .select(F.explode(_wordgrams(F.col("__ws"), n)).alias("__sh")),
        "__sh",
        m_bits,
        k_hashes,
    )
    if broadcast_filter:
        flt = F.broadcast(flt)
    sh = (
        docs.select(F.col(id_col), ws_tokens(F.col(text_col)).alias("__ws"))
        .select(
            F.col(id_col),
            F.explode(_wordgrams(F.col("__ws"), n)).alias("__sh"),
        )
        .distinct()
    )
    pos = sh.select(
        id_col, "__sh",
        F.posexplode(_bloom_pos(F.col("__sh"), m_bits, k_hashes)).alias(
            "__i", "pos"
        ),
    )
    per_sh = (
        pos.join(flt, "pos", "left_semi")
        .groupBy(id_col, "__sh")
        .agg(F.count(F.lit(1)).alias("__matched"))
        .filter(F.col("__matched") == k_hashes)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_maybe_hits"))
    )
    totals = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    # anchor on the full doc set: a doc with < n words has no shingles
    # and is trivially clean — it must not vanish from the report
    return (
        docs.select(id_col)
        .join(totals, id_col, "left")
        .join(per_sh, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_maybe_hits", F.lit(0)).cast("long").alias("n_maybe_hits"),
            (F.coalesce("n_maybe_hits", F.lit(0)) == 0).alias("clean"),
        )
    )


def _wordgrams(ws: Column, n: int) -> Column:
    """Space-joined word n-grams over an ALREADY-MATERIALIZED token
    array column (array<string>). Callers must project ``ws_tokens``
    into its own column first — passing the tokenizer expression
    inline re-splits the text once per gram position (the O(words^2)
    lambda trap, see operators/evaluate.py)."""
    return F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.array_join(F.slice(ws, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate_two_stage(
    docs: DataFrame,
    bench: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 3,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Production decontamination shape: the Bloom pre-screen routes
    the (tiny) maybe-hit set to the exact containment verifier, and
    everything else passes untouched — EXACTLY equal to running
    :func:`decontaminate` on the whole corpus, because the screen has
    no false negatives (any doc with even one shared n-gram is a
    suspect, and exact flagging needs ``threshold`` of them).

    Cost shape at 100 TB: the full corpus pays only the screen (one
    broadcast semi-match against the <= m-row positions relation); the
    exact verifier's per-doc shingle groupBys run on the suspect
    subset alone, whose size is contamination rate + the filter's
    false-positive rate — both tiny by construction. Graded as q154 by
    equality with the one-stage exact path.
    """
    screen = decontaminate_bloom(
        docs, bench, id_col=id_col, text_col=text_col,
        bench_text_col=bench_text_col, n=n, m_bits=m_bits,
        k_hashes=k_hashes,
    )
    suspects = screen.filter(~F.col("clean")).select(id_col)
    verified = decontaminate(
        docs.join(suspects, id_col, "left_semi"),
        bench,
        threshold=threshold,
        id_col=id_col,
        text_col=text_col,
        bench_text_col=bench_text_col,
        n=n,
    )
    return docs.join(suspects, id_col, "left_anti").unionByName(verified)


def ngram_novelty(
    eval_df: DataFrame,
    train_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Memorization diagnostic: how much of each evaluation document is
    NOT covered by the training corpus at the word n-gram level — the
    inverse of the contamination overlap q63 removes. Reported per eval
    doc: (id, n_ngrams, n_novel, novelty) where ``n_ngrams`` counts the
    doc's DISTINCT word n-grams, ``n_novel`` those absent from the
    train corpus, ``novelty = n_novel / n_ngrams`` (4dp). Low novelty
    on model OUTPUTS flags regurgitation; low novelty on an eval SET
    flags leakage the decontamination pass should have caught —
    the two standard uses (Carlini et al.'s extraction metrics reduce
    to exactly this count at the n-gram level).

    Scale shape: both sides reduce to md5 digests of their shingles
    before anything shuffles (text never leaves the scan stage); the
    train side is a DISTINCT digest set; the eval side left-anti-joins
    it — one digest-keyed shuffle each, counts aggregate map-side.
    Docs with fewer than ``n`` words have no n-grams: counts 0,
    novelty NULL (not 1.0 — nothing was measurable).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    ev = (
        word_shingles(eval_df, id_col, text_col, n=n, distinct=True)
        .select(F.col(id_col), F.md5(F.col("sh")).alias("__h"))
    )
    tr = (
        word_shingles(train_df, id_col, text_col, n=n, distinct=True)
        .select(F.md5(F.col("sh")).alias("__h"))
        .distinct()
    )
    totals = ev.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_ngrams"))
    novel = (
        ev.join(tr, "__h", "left_anti")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        eval_df.select(id_col)
        .join(totals, id_col, "left")
        .join(novel, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.when(
                F.coalesce("n_ngrams", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_novel", F.lit(0))
                    / F.coalesce("n_ngrams", F.lit(0)),
                    4,
                ),
            ).alias("novelty"),
        )
    )
