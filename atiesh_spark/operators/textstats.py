"""Text analysis operators for training-data pipelines.

Language ID (stopword heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting — all built-in
expressions (regex/array functions in codegen), no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

EN_STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "that", "it"]
FR_STOPWORDS = ["le", "la", "les", "et", "de", "un", "une", "est", "que", "dans"]

PUNCT_CLASS = "[.,;:!?]"


def _ws_tokens(text: Column) -> Column:
    from atiesh_spark.functions.text import ws_tokens

    return ws_tokens(text)


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals per document:
    (id, n_lines, dup_line_frac, top_bigram, top_bigram_char_frac).

    - dup_line_frac: fraction of non-empty lines that repeat an earlier
      line (1 - distinct/total) — boilerplate/navigation detector;
    - top_bigram_char_frac: characters covered by the most frequent word
      2-gram over total characters — the classic repeated-phrase rule.
    Deterministic tie-break (count desc, bigram asc); docs with fewer
    than two words report frac 0 and an empty bigram, and docs with no
    non-empty lines report n_lines 0 (degenerate docs are exactly what a
    quality filter must SEE, so none are dropped).

    ROW-LOCAL (round 14, the q216 kernel discipline): every signal here
    is a per-document reduction, and the document is one row — so the
    former plan's two shuffles and window sort bought nothing. The
    (id, line)-keyed distinct is now ``array_distinct`` over the
    split-line array; the (id, bigram)-keyed count + row_number window
    is now ``array_sort`` over the row's bigram array and ONE
    ``aggregate`` run-walk carrying (best gram, best count, current
    gram, current count) — ascending gram order makes "count desc,
    bigram asc" exactly "replace only on strictly greater count". Zero
    exchanges, zero joins, no window sort of the bigram stream (the
    same SortAggregate-adjacent spill class the r13 postmortem gates).
    """
    # coalesce: NULL text must behave like the former explode path
    # (zero lines/bigrams), not poison size() with -1
    toks = (
        f"coalesce(filter(split({text_col}, '\\\\s+'), "
        "x -> length(x) > 0), array())"
    )
    bigram_arr = (
        "array_sort(filter(transform("
        "sequence(1, greatest(size(__toks) - 1, 1)), "
        "i -> concat(try_element_at(__toks, i), ' ', "
        "try_element_at(__toks, i + 1))), g -> g IS NOT NULL))"
    )
    # run-walk over the sorted bigrams: close a run on gram change,
    # keeping it only on STRICTLY greater count (earlier = smaller gram
    # wins ties); the finish lambda closes the last run the same way
    top_expr = (
        "aggregate(__bgs, "
        "struct(cast(null as string) AS bg, 0L AS bc, "
        "cast(null as string) AS cg, 0L AS cc), "
        "(s, x) -> if(x <=> s.cg, "
        "struct(s.bg AS bg, s.bc AS bc, s.cg AS cg, s.cc + 1L AS cc), "
        "if(s.cc > s.bc, "
        "struct(s.cg AS bg, s.cc AS bc, x AS cg, 1L AS cc), "
        "struct(s.bg AS bg, s.bc AS bc, x AS cg, 1L AS cc))), "
        "s -> if(s.cc > s.bc, struct(s.cg AS top, s.cc AS cnt), "
        "struct(s.bg AS top, s.bc AS cnt)))"
    )
    lines_arr = (
        f"coalesce(filter(split({text_col}, '\\n'), "
        "l -> length(l) > 0), array())"
    )
    return (
        df.select(F.col(id_col), F.col(text_col))
        .withColumn("__lines", F.expr(lines_arr))
        .withColumn("__toks", F.expr(toks))
        .withColumn("__bgs", F.expr(bigram_arr))
        .withColumn("__top", F.expr(top_expr))
        .select(
            F.col(id_col),
            F.size("__lines").cast("bigint").alias("n_lines"),
            F.when(F.size("__lines") > 0, F.round(
                1 - F.size(F.array_distinct("__lines")) / F.size("__lines"), 4
            )).otherwise(F.lit(0.0)).alias("dup_line_frac"),
            F.coalesce(F.col("__top.top"), F.lit("")).alias("top_bigram"),
            F.round(
                F.coalesce(
                    F.col("__top.cnt") * F.length(F.col("__top.top")),
                    F.lit(0),
                )
                / F.greatest(F.length(text_col), F.lit(1)),
                4,
            ).alias("top_bigram_char_frac"),
        )
    )


#: PII patterns: simple shapes valid in both Java regex and RE2, so the
#: same redaction is reproducible in any engine (oracle-checkable).
#: Ordered dict = replacement order (applied first to last).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
}


def redact_pii(text: Column | str, kinds: list[str] | None = None) -> Column:
    """Redact PII spans to typed placeholders — pure chained
    regexp_replace, whole-stage codegen, no Python. The pre-training
    scrub step of a text pipeline."""
    c = F.col(text) if isinstance(text, str) else text
    for kind in kinds or list(PII_PATTERNS):
        pattern, token = PII_PATTERNS[kind]
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_counts(text: Column | str, kinds: list[str] | None = None) -> dict[str, Column]:
    """Per-kind PII hit counts (regexp_count), for audit/reporting gates."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        kind: F.regexp_count(c, F.lit(PII_PATTERNS[kind][0]))
        for kind in (kinds or list(PII_PATTERNS))
    }


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality stats: (id, n_chars_calc, n_tokens, avg_token_len,
    punct_ratio, stopword_ratio).

    Tokenization is staged into one intermediate column: Spark does NOT
    common-subexpression-eliminate a repeated split/filter across
    projection items, so inlining the token array in each stat re-ran
    the regex per stat (measured 5x slower at sf0.1).
    """
    text = F.col(text_col)
    staged = df.select(F.col(id_col), text.alias("__text"), _ws_tokens(text).alias("__toks"))
    stext, toks = F.col("__text"), F.col("__toks")
    n_tokens = F.size(toks)
    punct_count = F.length(stext) - F.length(F.regexp_replace(stext, PUNCT_CLASS, ""))
    stop_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(EN_STOPWORDS))
    )
    return staged.select(
        F.col(id_col),
        F.length(stext).alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t))
            / F.greatest(n_tokens, F.lit(1)),
            4,
        ).alias("avg_token_len"),
        F.round(punct_count / F.greatest(F.length(stext), F.lit(1)), 4).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 4).alias("stopword_ratio"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-vote language ID: (id, en_hits, fr_hits, lang_id).

    The n-gram/stopword heuristic family; extend by adding stopword
    tables (they compile to the same array-filter expressions).
    """
    staged = df.select(F.col(id_col), _ws_tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    en = F.size(F.filter(toks, lambda t: F.lower(t).isin(EN_STOPWORDS)))
    fr = F.size(F.filter(toks, lambda t: F.lower(t).isin(FR_STOPWORDS)))
    return staged.select(
        F.col(id_col),
        en.alias("en_hits"),
        fr.alias("fr_hits"),
        F.when((en > fr) & (en > 0), F.lit("en"))
        .when((fr > en) & (fr > 0), F.lit("fr"))
        .otherwise(F.lit("unknown"))
        .alias("lang_id"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace + BPE-ish token counts: (id, n_ws_tokens, n_bpe_tokens)."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(_ws_tokens(text)).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0)).alias("n_bpe_tokens"),
    )


def tf_idf_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, round_to: int = 4
) -> DataFrame:
    """Top-k TF-IDF tokens per document: (id, tok, tfidf, rank).

    tfidf = tf * ln((N + 1) / (df + 1)) with add-one smoothing; scores
    are rounded BEFORE ranking so tie-breaks (then token asc) are
    engine-independent. Two shuffles: (doc, tok) counts and the per-doc
    window rank; df/N ride along as a broadcast-joined token dim and a
    scalar.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    ).filter(F.length("tok") > 0)
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # N rides along as a broadcast 1-row aggregate: keeps the whole
    # operator one lazy plan (an eager .first() here would run a second
    # full corpus scan per call and break plan-builder laziness)
    n_docs = df.agg(F.countDistinct(id_col).alias("__n"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "tok",
            F.round(
                F.col("tf") * F.log((F.col("__n") + 1) / (F.col("df") + 1)), round_to
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "tok", "tfidf", "rank")
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalized content fingerprint: (id, fp).

    lower -> collapse non-alphanumerics to single spaces -> trim -> md5.
    Stable under whitespace/punctuation/case noise — the batch analog of a
    rolling-hash document fingerprint.
    """
    normalized = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")
    )
    return df.select(
        F.col(id_col), F.md5(normalized.cast("binary")).alias("fp")
    )


#: (name, char-class regex) for the major scripts a web corpus mixes;
#: order is the dominance tie-break priority.
_SCRIPT_CLASSES: list[tuple[str, str]] = [
    ("latin", "A-Za-z"),
    ("cyrillic", "Ѐ-ӿ"),
    ("greek", "Ͱ-Ͽ"),
    ("cjk", "一-鿿"),
    ("arabic", "؀-ۿ"),
]


def script_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Unicode script distribution per document: the mixed-script
    spam/spoofing signal web-corpus curation filters on (Cyrillic
    lookalikes inside Latin text, CJK keyword stuffing in English
    pages — the IDN-homograph problem at corpus scale).

    Per doc: ``n_chars``, a ``frac_<script>`` column per major script
    class (latin/cyrillic/greek/cjk/arabic) plus digits, whitespace
    and other — all over total chars, 4dp, NULL when the doc is empty
    (nothing measurable) — and two derived signals:

    - ``dominant``: the letter class with the highest count, ties
      resolved by the fixed priority latin > cyrillic > greek > cjk >
      arabic ('none' when the doc has no letters from these classes).
    - ``mixed``: true when a SECOND script is materially present —
      ``10 * second_count >= letter_total`` (>= 10%, computed in exact
      integer arithmetic so engines can't disagree on a boundary).

    All counts are one ``regexp_replace`` + ``length`` per class —
    row-local codegen, zero shuffles, rides whatever scan the caller
    already pays for.
    """
    n = F.length(F.col(text_col))
    counts = {
        name: F.length(
            F.regexp_replace(F.col(text_col), f"[^{cls}]", "")
        )
        for name, cls in _SCRIPT_CLASSES
    }
    digit = F.length(F.regexp_replace(F.col(text_col), "[^0-9]", ""))
    space = F.length(F.regexp_replace(F.col(text_col), r"[^\s]", ""))
    letters = sum(counts.values(), F.lit(0))
    mx = F.greatest(*counts.values())
    dominant = F.lit("none")
    # build the when-chain in REVERSE priority so earlier classes win
    for name, _ in reversed(_SCRIPT_CLASSES):
        dominant = F.when(
            (letters > 0) & (counts[name] == mx), F.lit(name)
        ).otherwise(dominant)
    frac = lambda c: F.when(n > 0, F.round(c / n, 4))  # noqa: E731
    out = df.select(
        F.col(id_col),
        F.coalesce(n, F.lit(0)).alias("n_chars"),
        *[frac(counts[name]).alias(f"frac_{name}") for name, _ in _SCRIPT_CLASSES],
        frac(digit).alias("frac_digit"),
        frac(space).alias("frac_space"),
        frac(
            n - letters - digit - space
        ).alias("frac_other"),
        dominant.alias("dominant"),
        letters.alias("__letters"),
        *[counts[name].alias(f"__c_{name}") for name, _ in _SCRIPT_CLASSES],
    )
    # second-largest letter count = max over the non-dominant classes
    # (with the priority tie-break, excluding exactly the dominant one
    # is well-defined even when two classes tie at the max)
    second = F.lit(0)
    for name, _ in _SCRIPT_CLASSES:
        second = F.greatest(
            second,
            F.when(
                F.col("dominant") != name, F.col(f"__c_{name}")
            ).otherwise(F.lit(0)),
        )
    return out.select(
        id_col,
        "n_chars",
        *[f"frac_{name}" for name, _ in _SCRIPT_CLASSES],
        "frac_digit",
        "frac_space",
        "frac_other",
        "dominant",
        F.coalesce(
            (F.col("__letters") > 0)
            & (10 * second >= F.col("__letters"))
            & (second > 0),
            F.lit(False),  # NULL text: not mixed, not NULL
        ).alias("mixed"),
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str,
    lang_col: str,
    score_col: str,
    buckets: int = 3,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al., "CCNet:
    Extracting high quality monolingual datasets from web crawl data",
    LREC 2020): per language, rank documents by an LM quality score
    (bits/char from ``ngram_lm_scores`` — LOWER is better) and cut the
    ranking into ``buckets`` equal-count tiers. CCNet keeps 'head' (and
    often 'middle') for pretraining; the bucket label is the curation
    signal this operator materializes.

    Returns (id, lang, score, bucket_idx, bucket) — ``bucket_idx`` is
    the 1-based ntile, ``bucket`` the matching label. Rows with a NULL
    score (unscoreable docs — too short for a single n-gram) get
    bucket_idx NULL and label 'unscored' rather than polluting the
    tiers. Ties order by (score, id): ntile over a TOTAL order, so the
    split is deterministic under retries and across engines.
    ``id_col`` must be unique within each language (it is the tiebreak
    that makes the order total).

    Engine shape — NEVER ``ntile() OVER (PARTITION BY lang)``: that is
    one task per language, so the dominant language of a real crawl
    serializes onto a single core at any cluster size (the same
    fall-over class as the pre-round-12 ``budgeted_take``). Equal-count
    tiers are fully determined by the ``buckets - 1`` BOUNDARY ROWS per
    language (the last (score, id) of each tier), so instead:

      1. range-partition the narrow (lang, score, id) projection (lazy
         ``localCheckpoint`` pins the sampled boundaries in the same
         job as the digest);
      2. collect per-(partition, lang) row counts — O(partitions +
         langs) driver rows — and locate, per language, which partition
         holds each boundary rank (Spark/standard-SQL ntile sizing:
         the first n % k tiers get one extra row);
      3. scan ONLY those partitions (sorted locally) through an Arrow
         ``mapInPandas`` that emits the boundary (lang, score, id)
         tuples — at most buckets - 1 rows per language;
      4. bucket_idx = 1 + |boundaries strictly before the row| — a
         row-local codegen ``aggregate`` over the language's broadcast
         boundary array (null-safe joined on lang). The corpus itself
         never shuffles and Catalyst pruning stays intact.

    Pinned row-for-row against the one-window ntile restatement by a
    randomized differential (skewed languages, ties, NULL lang/score,
    n < buckets languages).
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    if len(labels) != buckets:
        raise ValueError(f"need exactly {buckets} labels, got {len(labels)}")
    for reserved in ("__pid", "__bnds", "__bnd_g", "__has_bnd"):
        if reserved in df.columns:
            raise ValueError(
                f"input must not contain the reserved column {reserved!r}"
            )
    from atiesh_spark.operators.sampling import (
        _na_key,
        _reject_nan_stratum,
        _task_pid,
    )

    spark = df.sparkSession
    # the operator's output is exactly (id, lang, score) + the bucket,
    # and the digest pass / boundary scan / final join / unscored
    # branch all read the input — checkpoint the 3-column projection so
    # an expensive upstream (LM scoring is a corpus-wide trigram
    # explode) runs ONCE, not once per consumer
    narrow = df.select(id_col, lang_col, score_col).localCheckpoint(
        eager=False
    )
    scored_in = narrow.filter(F.col(score_col).isNotNull())
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        scored_in.select(lang_col, score_col, id_col)
        .repartitionByRange(n_parts, lang_col, score_col, id_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    partials = (
        ranged.groupBy("__pid", lang_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    per_lang: dict = {}
    for r in partials:
        _reject_nan_stratum(r[lang_col], lang_col, "perplexity_buckets")
        per_lang.setdefault(_na_key(r[lang_col]), []).append(
            (r["__pid"], r["__n"])
        )
    # boundary rank of tier b (1-based, b < buckets) under ntile sizing:
    # q = n // k extra-row tiers are the first r = n % k
    targets: dict = {}  # (pid, lang) -> [local_rank, ...]
    for gk, lst in per_lang.items():
        lst.sort(key=lambda t: t[0])
        n = sum(c for _, c in lst)
        q, r = divmod(n, buckets)
        bounds = sorted(
            {b * (q + 1) if b <= r else r * (q + 1) + (b - r) * q
             for b in range(1, buckets)} - {0}
        )
        offset = 0
        it = iter(lst)
        pid, cnt = next(it)
        for rank in bounds:
            while rank > offset + cnt:
                offset += cnt
                pid, cnt = next(it)
            targets.setdefault((pid, gk), []).append(rank - offset)
    bc = spark.sparkContext.broadcast(targets)
    scan = ranged.filter(
        F.col("__pid").isin(sorted({pid for pid, _ in targets}))
    ).sortWithinPartitions(lang_col, score_col, id_col)
    bnd_schema = ranged.select(lang_col, score_col, id_col).schema

    def find_bounds(batches):
        import pandas as pd

        pos: dict = {}  # lang -> rows of this lang seen so far (this pid)
        out_rows: list = []
        task_pid = None
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            pid = task_pid = _task_pid(pdf, task_pid)
            g = pdf[lang_col].to_numpy(object)
            i = 0
            while i < m:
                gk = _na_key(g[i])
                j = i + 1
                while j < m and _na_key(g[j]) == gk:
                    j += 1
                ranks = bc.value.get((pid, gk))
                if ranks is not None:
                    seen = pos.get(gk, 0)
                    for rank in ranks:
                        if seen < rank <= seen + (j - i):
                            row = pdf.iloc[i + (rank - seen - 1)]
                            out_rows.append(
                                (gk, row[score_col], row[id_col])
                            )
                    pos[gk] = seen + (j - i)
                i = j
        if out_rows:
            yield pd.DataFrame(
                {
                    lang_col: [t[0] for t in out_rows],
                    score_col: [t[1] for t in out_rows],
                    id_col: [t[2] for t in out_rows],
                },
                dtype=object,
            )

    # one array of boundary (score, id) structs per language — at most
    # (buckets - 1) x |langs| rows total, broadcast to the corpus
    bnds = (
        scan.mapInPandas(find_bounds, schema=bnd_schema)
        .groupBy(lang_col)
        .agg(
            F.collect_list(F.struct(score_col, id_col)).alias("__bnds")
        )
        .withColumnRenamed(lang_col, "__bnd_g")
    )
    joined = scored_in.join(
        F.broadcast(bnds),
        scored_in[lang_col].eqNullSafe(bnds["__bnd_g"]),
        "left",
    )
    s, d = F.col(score_col), F.col(id_col)
    before = F.aggregate(
        F.coalesce(F.col("__bnds"), F.array()),
        F.lit(0),
        lambda acc, x: acc
        + F.when(
            (x[score_col] < s) | ((x[score_col] == s) & (x[id_col] < d)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    bucket_idx = (before + 1).cast("int")
    label_expr = F.element_at(
        F.array(*[F.lit(x) for x in labels]), bucket_idx
    )
    out = joined.select(
        F.col(id_col),
        F.col(lang_col),
        F.col(score_col),
        bucket_idx.alias("bucket_idx"),
        label_expr.alias("bucket"),
    )
    unscored = narrow.filter(F.col(score_col).isNull()).select(
        F.col(id_col),
        F.col(lang_col),
        F.col(score_col),
        F.lit(None).cast("int").alias("bucket_idx"),
        F.lit("unscored").alias("bucket"),
    )
    return out.unionByName(unscored)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): (id, fp_pos, fp_hash) rows, one
    per SELECTED k-gram.

    Every length-``k`` character gram of ``lower(text)`` is hashed; a
    window of ``w`` consecutive gram hashes slides over the document and
    the minimum of each window is selected (leftmost on ties); selected
    (hash, pos) pairs are deduplicated. The guarantee that makes this
    THE local fingerprinting scheme for copy detection: any shared
    substring of length >= ``w + k - 1`` between two documents yields at
    least one IDENTICAL selected fingerprint in both, while only
    ~``2/(w+1)`` of grams are kept — so overlap detection becomes a
    bounded equi-join on fp_hash instead of an all-pairs scan.

    Engine shape (100 TB, rebuilt round 14 row-local — the q216 kernel
    discipline): selection is a pure per-document function, so the
    whole operator is one narrow ``_fanout`` widen and row-local
    expressions — the former plan's per-document window shuffle + sort
    of every gram row and the closing distinct exchange are gone. Gram
    hashes build as an in-row array (no gram explode), each window
    start takes the ``least()`` of its w elements (no per-start slice
    allocation — measured 25% faster than ``array_min(slice(...))``),
    selections dedup row-locally with ``array_distinct`` (packed
    hash*2^24+pos longs, so pair-dedup is long-dedup), and only the
    ~2/(w+1) selected fraction ever explodes. Measured same-session at
    sf0.1: 1.51 s vs the window plan's 2.85 s — faster at bench scale
    AND two exchanges lighter at any scale. No self-join, no Python.

    Hash honesty: the classic presentation uses a Rabin-Karp ROLLING
    hash because a sequential scanner can update it in O(1); in a
    set-oriented plan every gram is an independent row, so rolling
    updates buy nothing — the gram hash here is the first 36 bits of
    md5 (cross-engine reproducible, collision-negligible per window).
    Selection packs (hash, pos) into one BIGINT (``hash * 2**24 + pos``)
    so the window min resolves ties leftmost in a single pass; documents
    are bounded at 2**24 - 1 grams (~16.7M chars — chunk longer docs
    upstream with chunk_documents).

    Documents with fewer grams than ``w`` get the whole text as the one
    window (global min selected once); texts shorter than ``k`` produce
    no fingerprints.

    Tie-break note: on a run of identical gram hashes every window
    selects its own leftmost position, so repetitive text densifies —
    exactly as the paper's CLASSIC winnowing does (with rightmost
    ties). The paper's 'robust winnowing' refinement re-selects the
    previous window's fingerprint when still minimal, which is a
    sequential-state rule a set-oriented plan deliberately does not
    reproduce; the shared-substring guarantee is identical.
    """
    from atiesh_spark.operators.dedup import _fanout

    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    shift = 1 << 24
    s = F.lower(F.col(text_col))
    # Hash every gram INSIDE a positions-array transform (never explode
    # the text alongside positions: that would copy the full document
    # into every gram row — O(len^2) transient bytes per doc). The
    # packed value hash * 2**24 + pos makes the window min resolve
    # ties leftmost AND makes per-doc (hash, pos) dedup a plain
    # array_distinct of longs.
    hs = (
        f"transform(sequence(1, length(__s) - {k} + 1), "
        f"i -> cast(conv(substring(md5(substring(__s, i, {k})), 1, 9), "
        f"16, 10) AS bigint) * {shift} + i)"
    )
    # One window start per position 1..n-w+1 (full windows; a doc with
    # fewer grams than w takes the whole text as its one window —
    # exactly the former plan's pos <= greatest(n-w+1, 1) filter). The
    # least() chain indexes w in-range elements directly instead of
    # allocating a slice per start.
    least_terms = ", ".join(
        f"element_at(__hs, i + {j})" for j in range(w)
    )
    sel = (
        f"array_distinct(if(size(__hs) <= {w}, array(array_min(__hs)), "
        f"transform(sequence(1, size(__hs) - {w} + 1), "
        f"i -> least({least_terms}))))"
    )
    return (
        _fanout(df.select(F.col(id_col), s.alias("__s")))
        .filter(F.length("__s") >= k)
        .select(F.col(id_col), F.expr(hs).alias("__hs"))
        .select(F.col(id_col), F.explode(F.expr(sel)).alias("__sel"))
        .select(
            F.col(id_col),
            (F.col("__sel") % shift).cast("int").alias("fp_pos"),
            # integer div, NOT `/`: the packed value is up to 2**60 and
            # float division would round above 2**53
            F.expr(f"__sel div {shift}").cast("long").alias("fp_hash"),
        )
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    max_df: int = 5,
    min_shared: int = 2,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """Copy-detection pairs over winnowing fingerprints: (id_1, id_2,
    shared_fp, frac_1, frac_2), id_1 < id_2 — MOSS's matching stage.

    ``shared_fp`` counts DISTINCT fingerprint hashes the two documents
    both selected; ``frac_i`` = shared_fp / (doc i's distinct selected
    hashes), rounded to 4dp — the containment-style estimate in each
    direction (a short doc quoted inside a long page scores high
    frac_short, low frac_long; same asymmetry logic as
    ``dedup.containment_pairs``).

    Scale discipline (same caps as ``dedup.rare_shingle_candidates``):
    hashes are reduced to one row per (doc, hash) BEFORE anything
    counts them; document frequency is computed map-side-combined with
    no id lists; only hashes with 2 <= df <= ``max_df`` generate pairs,
    so pair work is bounded by |kept hashes| * max_df^2 and boilerplate
    fingerprints (page chrome, license headers — present everywhere)
    never explode. ``min_shared`` prunes the accidental single-hash
    collisions before the per-doc sizes attach. Pass ``fingerprints=``
    to reuse an existing ``winnow_fingerprints`` frame (e.g. a
    persisted index) instead of re-fingerprinting the corpus.

    Engine shape (round 14): when fingerprinting inline, the per-doc
    DISTINCT hash set is built ROW-LOCALLY (the window min of plain
    gram hashes — ``(min of packed hash*2^24+pos) div 2^24`` IS the
    plain window min, so dropping positions changes nothing — then
    ``array_distinct``), and the doc's fingerprint count rides each
    exploded row. That deletes the global (id, hash) DISTINCT
    exchange, the per-doc sizes aggregation exchange, and both closing
    size joins; the per-doc (id, hash-array) frame is
    ``localCheckpoint``-ed once because three consumers (df counts and
    both pair sides) would otherwise re-run the md5 fingerprinting —
    and because explode over an unmaterialized attribute invites an
    InferFiltersFromGenerate + pushdown re-evaluation bomb (see the
    in-body comment).
    The ``fingerprints=`` path keeps the distinct + sizes-join shape —
    positions arrive pre-selected there, and joining sizes onto the
    few surviving pairs beats attaching n_fp to every (id, hash) row.
    """
    if max_df < 2:
        raise ValueError("max_df must be >= 2 (a pair needs two docs)")
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    inline = fingerprints is None
    if inline:
        if k < 1 or w < 1:
            raise ValueError("k and w must be >= 1")
        # Plain (unpacked) gram hashes: overlap matching never needs
        # positions, and the window min of plain hashes equals the
        # hash part of winnow_fingerprints' packed min (pos < 2^24).
        hs = (
            f"transform(sequence(1, length(__s) - {k} + 1), "
            f"i -> cast(conv(substring(md5(substring(__s, i, {k})), 1, 9), "
            f"16, 10) AS bigint))"
        )
        least_terms = ", ".join(
            f"element_at(__hs, i + {j})" for j in range(w)
        )
        hset = (
            f"array_distinct(if(size(__hs) <= {w}, array(array_min(__hs)), "
            f"transform(sequence(1, size(__hs) - {w} + 1), "
            f"i -> least({least_terms}))))"
        )
        from atiesh_spark.operators.dedup import _fanout

        # Checkpoint the ARRAY form, BEFORE the explode. Two reasons:
        # (1) three consumers (df counts, both pair sides) must not
        # re-run the md5 fingerprinting; (2) explode over a plain
        # attribute makes InferFiltersFromGenerate add size(..) > 0,
        # and predicate pushdown then substitutes the WHOLE fingerprint
        # expression into that filter below every Project — lower(text)
        # re-evaluated per gram and the gram array rebuilt per
        # element_at, measured O(doc_len^2)-catastrophic (a 2 s corpus
        # pass became >15 min). A materialized array is the one explode
        # input that filter can inspect for free.
        doc = (
            _fanout(
                df.select(F.col(id_col), F.lower(F.col(text_col)).alias("__s"))
            )
            .filter(F.length("__s") >= k)
            .select(F.col(id_col), F.expr(hs).alias("__hs"))
            .select(F.col(id_col), F.expr(hset).alias("__hset"))
            .localCheckpoint()
        )
        docfp = doc.select(
            F.col(id_col),
            F.size("__hset").alias("__n_fp"),
            F.explode("__hset").alias("fp_hash"),
        )
    else:
        docfp = fingerprints.select(F.col(id_col), "fp_hash").distinct()
        sizes = docfp.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n_fp"))
    keep = (
        docfp.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter((F.col("__df") >= 2) & (F.col("__df") <= max_df))
        .select("fp_hash")
    )
    rare = docfp.join(keep, "fp_hash", "left_semi")
    carry1 = [F.col("__n_fp").alias("__n1")] if inline else []
    carry2 = [F.col("__n_fp").alias("__n2")] if inline else []
    a = rare.select("fp_hash", F.col(id_col).alias("id_1"), *carry1)
    b = rare.select("fp_hash", F.col(id_col).alias("id_2"), *carry2)
    # inline path: every pair row carries both docs' n_fp (constant per
    # id), so min() re-attaches them inside the one pair aggregate and
    # no sizes join exists at all
    aggs = [F.count(F.lit(1)).alias("shared_fp")]
    if inline:
        aggs += [F.min("__n1").alias("__n1"), F.min("__n2").alias("__n2")]
    shared = (
        a.join(b, "fp_hash")
        .filter(F.col("id_1") < F.col("id_2"))
        .groupBy("id_1", "id_2")
        .agg(*aggs)
        .filter(F.col("shared_fp") >= min_shared)
    )
    if not inline:
        s1 = sizes.select(
            F.col(id_col).alias("id_1"), F.col("__n_fp").alias("__n1")
        )
        s2 = sizes.select(
            F.col(id_col).alias("id_2"), F.col("__n_fp").alias("__n2")
        )
        shared = shared.join(s1, "id_1").join(s2, "id_2")
    return shared.select(
        "id_1",
        "id_2",
        "shared_fp",
        F.round(F.col("shared_fp") / F.col("__n1"), 4).alias("frac_1"),
        F.round(F.col("shared_fp") / F.col("__n2"), 4).alias("frac_2"),
    )


def char_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", round_to: int = 4
) -> DataFrame:
    """Shannon entropy of each document's character distribution:
    (id_col, n_chars_seen, char_entropy). The Gopher/C4-family quality
    signal that separates natural prose (~3.5-4.5 bits/char for English)
    from degenerate text — repeated-character runs, base64 blobs, and
    template spam all sit far from the prose band.

    Computed entirely row-local with nested higher-order functions
    (array_distinct + per-char filter counts): ZERO shuffles — at
    100 TB this matters, because the naive (doc, char)-exploded groupBy
    shuffles ~|text| rows per document. Cost is O(distinct_chars x len)
    per row, bounded by the charset (~100 for text), i.e. linear in
    practice. Empty/null text yields entropy 0.0 over 0 chars rather
    than NULL, so downstream filters need no null guard.
    """
    # coalesce first: split(NULL) is NULL and size(NULL) is NULL — a null
    # text must grade as 0 chars / 0.0 bits, not as NULL stats
    chars = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), ""), lambda c: c != ""
    )
    n = F.size(chars)
    ent = F.aggregate(
        F.array_distinct(chars),
        F.lit(0.0),
        lambda acc, c: acc
        - (F.size(F.filter(chars, lambda x: x == c)) / n)
        * F.log2(F.size(F.filter(chars, lambda x: x == c)) / n),
    )
    return df.select(
        F.col(id_col),
        n.alias("n_chars_seen"),
        F.round(F.when(n > 0, ent).otherwise(F.lit(0.0)), round_to).alias(
            "char_entropy"
        ),
    )


def ngram_lm_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    smooth: float = 1.0,
    round_to: int = 4,
) -> DataFrame:
    """CCNet-style LM quality scores from a corpus-trained character
    n-gram model: (id_col, n_ngrams, bits_per_char).

    The perplexity filter of the CCNet/ccnet-descendant pipelines scores
    each document under a language model and drops the weird tail
    (binary junk, keyboard mash, SEO spam score high; prose scores low).
    A real deployment loads frozen KenLM weights; the self-contained
    engine-checkable analog here TRAINS the model on the corpus itself
    in the same plan: add-``smooth`` smoothed conditional char
    ``k``-gram probabilities p(gram | prefix) = (c_k + s) /
    (c_{k-1} + s*V), with V the distinct final-char vocabulary.
    ``bits_per_char`` is the mean -log2 p over the doc's positional
    ``k``-grams (NULL for docs shorter than ``k`` — nothing to score).

    Plan shape: one fanout-guarded positional shingle explode feeds (a)
    the count tables and (b) the scoring stream. The model is TINY by
    construction — |charset|^k rows at most (1e6 for a 100-char
    alphabet at k=3) — so both count tables BROADCAST back onto the
    shingle stream: scoring the 100 TB corpus adds zero extra
    shuffles beyond the per-doc average. The prefix table derives from
    the k-gram table (sum by prefix), never from a second pass over
    the corpus.
    """
    from atiesh_spark.operators.dedup import char_shingles

    if k < 2:
        raise ValueError("k must be >= 2 (need a non-empty prefix context)")
    if smooth <= 0:
        raise ValueError("smooth must be > 0")
    grams = char_shingles(df, id_col, text_col, k=k, distinct=False).filter(
        F.length("sh") == k
    )
    # Pre-aggregate to (doc, gram, in-doc count): the positional stream
    # shuffles ONCE (map-side combined); the corpus tables derive from
    # the per-doc frame (distinct-sized input), and scoring is a
    # weighted average over per-doc DISTINCT grams instead of re-joining
    # every occurrence.
    # Materialized: this frame feeds FOUR consumers (k-gram table,
    # prefix table, vocab, and the scoring probe), and branch
    # re-aliasing defeats ReuseExchange — unmaterialized, the corpus
    # was scanned and gram-exploded once PER consumer (5 scans in the
    # q94 physical plan; measured 3.2 -> 2.0 s solo at sf0.1). One
    # explode + one map-side-combined shuffle is also the honest cost
    # at 100 TB: the (doc, gram, count) frame is the algorithm's
    # working set.
    per_doc = (
        grams.groupBy(id_col, "sh")
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint()
    )
    ck = per_doc.groupBy("sh").agg(F.sum("__n").alias("__ck"))
    prefix = ck.groupBy(F.substring("sh", 1, k - 1).alias("__pfx")).agg(
        F.sum("__ck").alias("__cp")
    )
    vocab = ck.agg(
        F.countDistinct(F.substring("sh", k, 1)).alias("__v")
    )
    bits = -F.log2(
        (F.col("__ck") + F.lit(float(smooth)))
        / (F.col("__cp") + F.lit(float(smooth)) * F.col("__v"))
    )
    scored = (
        per_doc.join(F.broadcast(ck), "sh")
        .withColumn("__pfx", F.substring("sh", 1, k - 1))
        .join(F.broadcast(prefix), "__pfx")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("__n").alias("n_ngrams"),
            F.round(F.sum(F.col("__n") * bits) / F.sum("__n"), round_to).alias(
                "bits_per_char"
            ),
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
        F.col("bits_per_char"),
    )


def dsir_log_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_filter: Column,
    buckets: int = 4096,
    smooth: float = 1.0,
    round_to: int = 4,
) -> DataFrame:
    """DSIR-style importance weights for targeted data selection:
    (id_col, n_tokens, log_weight).

    Data Selection via Importance Resampling (Xie et al., 2023,
    arXiv:2302.03169): estimate target and source distributions over
    HASHED n-gram features and weight every document by its
    log-likelihood ratio — documents that look like the target domain
    get large weights, generic ones get negative. Feed the weights
    (exponentiated, e.g. after a max-shift) into
    :func:`atiesh_spark.operators.sampling.weighted_sample` for the
    full select-then-sample recipe, all deterministic.

    Features are whitespace word unigrams hashed into ``buckets``
    md5 buckets (hashing IS the DSIR trick: a fixed-size table no
    matter the vocabulary). Both distributions are add-``smooth``
    smoothed over the bucket space; ``target_filter`` is any boolean
    Column over the input rows (a language, a source, a quality flag).

    Plan shape: one fanout-guarded token explode; the two count tables
    are <= ``buckets`` rows (4096 default) and the per-bucket
    log-ratio table broadcasts back onto the token stream — like
    ``ngram_lm_scores``, scoring adds no shuffle beyond the final
    per-doc sum. Docs with no tokens score 0 with n_tokens 0 (the
    neutral weight).
    """
    from atiesh_spark.functions.hashing import md5_long
    from atiesh_spark.operators.dedup import _fanout

    if buckets <= 0:
        raise ValueError("buckets must be > 0")
    if smooth <= 0:
        raise ValueError("smooth must be > 0")
    base = _fanout(
        df.select(id_col, text_col, target_filter.cast("boolean").alias("__tgt"))
    )
    toks = base.select(
        F.col(id_col),
        F.col("__tgt"),
        F.explode(_ws_tokens(F.col(text_col))).alias("__tok"),
    ).withColumn("__bkt", md5_long(F.col("__tok"), 15) % buckets)

    src = toks.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__cs"))
    tgt = toks.filter("__tgt").groupBy("__bkt").agg(F.count(F.lit(1)).alias("__ct"))
    ratio = (
        # both count tables are <= `buckets` rows by construction; force
        # the build side so the planner never SMJs two tiny aggregates
        src.join(F.broadcast(tgt), "__bkt", "left")
        .withColumn("__ct", F.coalesce("__ct", F.lit(0)))
        .crossJoin(
            F.broadcast(
                toks.agg(
                    F.count(F.lit(1)).alias("__ts"),
                    F.sum(F.col("__tgt").cast("long")).alias("__tt"),
                )
            )
        )
        .select(
            "__bkt",
            (
                F.log(
                    (F.col("__ct") + F.lit(float(smooth)))
                    / (F.col("__tt") + F.lit(float(smooth) * buckets))
                )
                - F.log(
                    (F.col("__cs") + F.lit(float(smooth)))
                    / (F.col("__ts") + F.lit(float(smooth) * buckets))
                )
            ).alias("__lr"),
        )
    )
    scored = (
        toks.join(F.broadcast(ratio), "__bkt")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("__lr"), round_to).alias("log_weight"),
        )
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
    )


#: The eight English stop words Gopher checks for (Rae et al. 2021,
#: Appendix A1.1 "stop word filter").
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_words: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Per-document Gopher quality gate (Rae et al. 2021, Appendix A
    "quality filtering"): the composite rule set behind MassiveText —
    q32-q35/q57 expose the individual signals, this is the curation
    DECISION, one boolean per rule plus the conjunction, with the
    measured values kept so thresholds can be re-audited offline:

    (id, n_words, mean_word_len, symbol_word_ratio, bullet_line_frac,
    ellipsis_line_frac, alpha_word_frac, n_stop_words,
    ok_word_count, ok_word_len, ok_symbol_ratio, ok_bullets,
    ok_ellipsis, ok_alpha, ok_stop_words, pass)

    where symbols are '#' characters and '...' occurrences, bullet
    lines start with -, * or the bullet glyph after optional
    whitespace, ellipsis lines end with '...' or the ellipsis glyph,
    alpha words contain at least one ASCII letter, and stop words are
    the distinct members of :data:`GOPHER_STOP_WORDS` present as
    lowercase whitespace tokens. Empty docs (zero words) fail the
    word-count rule; ratio rules with an empty denominator read as
    passing (nothing to measure). All row-local codegen — zero
    shuffles, zero Python UDFs: the gate rides the corpus scan.
    """
    text = F.col(text_col)
    words = _ws_tokens(text)
    n_words = F.size(words)
    has_words = n_words > 0
    mean_wl = F.when(
        has_words,
        F.round(
            F.aggregate(
                words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
            )
            / n_words,
            round_to,
        ),
    )
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(text)
        - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    sym_ratio = F.when(
        has_words, F.round((n_hash + n_ell) / n_words, round_to)
    )
    lines = F.filter(F.split(text, "\n"), lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    has_lines = n_lines > 0
    bullet_frac = F.when(
        has_lines,
        F.round(
            F.size(F.filter(lines, lambda x: x.rlike(r"^\s*([-*•])")))
            / n_lines,
            round_to,
        ),
    )
    ellipsis_frac = F.when(
        has_lines,
        F.round(
            F.size(
                F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$"))
            )
            / n_lines,
            round_to,
        ),
    )
    alpha_frac = F.when(
        has_words,
        F.round(
            F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words,
            round_to,
        ),
    )
    lower_words = F.transform(words, F.lower)
    n_stop = F.size(
        F.filter(
            F.array([F.lit(s) for s in GOPHER_STOP_WORDS]),
            lambda s: F.array_contains(lower_words, s),
        )
    )
    ok_wc = (n_words >= min_words) & (n_words <= max_words)
    ok_wl = F.coalesce(
        (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len),
        F.lit(True),
    )
    ok_sym = F.coalesce(sym_ratio <= max_symbol_word_ratio, F.lit(True))
    ok_bul = F.coalesce(bullet_frac <= max_bullet_line_frac, F.lit(True))
    ok_ell = F.coalesce(ellipsis_frac <= max_ellipsis_line_frac, F.lit(True))
    ok_alpha = F.coalesce(alpha_frac >= min_alpha_word_frac, F.lit(True))
    ok_stop = n_stop >= min_stop_words
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_word_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.cast("long").alias("n_stop_words"),
        ok_wc.alias("ok_word_count"),
        ok_wl.alias("ok_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_bul.alias("ok_bullets"),
        ok_ell.alias("ok_ellipsis"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stop_words"),
        (
            ok_wc & ok_wl & ok_sym & ok_bul & ok_ell & ok_alpha & ok_stop
        ).alias("pass"),
    )


def classification_report(
    df: DataFrame,
    label_col: str,
    pred_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-class evaluation of any in-engine classifier (langID, the
    NB quality gate, noisy-label flags) against labels: one row per
    TRUE class — (label, n, tp, fp, fn, precision, recall, f1) with
    fp counted over rows whose PREDICTION is this class. The
    model-quality table a curation pipeline prints before trusting a
    gate at 100 TB. NULL labels/predictions are excluded (they are
    missing ground truth, not a class).

    Plan: one (label, pred) confusion groupBy — classes^2 rows — then
    two tiny re-aggregations; the corpus shuffles once on a two-string
    key. Empty denominators read as NULL.
    """
    base = df.filter(
        F.col(label_col).isNotNull() & F.col(pred_col).isNotNull()
    ).select(
        F.col(label_col).cast("string").alias("__l"),
        F.col(pred_col).cast("string").alias("__p"),
    )
    conf = base.groupBy("__l", "__p").agg(F.count(F.lit(1)).alias("__n"))
    per_label = conf.groupBy(F.col("__l").alias("label")).agg(
        F.sum("__n").alias("n"),
        F.sum(F.when(F.col("__p") == F.col("__l"), F.col("__n")).otherwise(0)).alias("tp"),
    )
    per_pred = conf.groupBy(F.col("__p").alias("label")).agg(
        F.sum("__n").alias("n_pred")
    )
    return (
        per_label.join(per_pred, "label", "left")
        .select(
            "label",
            F.col("n").cast("long").alias("n"),
            F.col("tp").cast("long").alias("tp"),
            (F.coalesce("n_pred", F.lit(0)) - F.col("tp")).cast("long").alias("fp"),
            (F.col("n") - F.col("tp")).cast("long").alias("fn"),
            F.round(
                F.col("tp") / F.nullif(F.coalesce("n_pred", F.lit(0)), F.lit(0)),
                round_to,
            ).alias("precision"),
            F.round(F.col("tp") / F.col("n"), round_to).alias("recall"),
            F.round(
                2 * F.col("tp")
                / F.nullif(F.col("n") + F.coalesce("n_pred", F.lit(0)), F.lit(0)),
                round_to,
            ).alias("f1"),
        )
    )


class StreamingWinnowIndex:
    """Maintain the winnowing fingerprint index incrementally from a
    document stream — the text-shingle analog of
    ``similarity.StreamingAnnIndex`` — as a ``foreachBatch`` function.

    The store holds ``winnow_fingerprints`` rows (id, fp_pos, fp_hash).
    Fingerprint selection is a PURE FUNCTION of the document text (md5
    gram hashes, deterministic window min — no RNG, no corpus-global
    state), so maintenance is append-shaped and exact: each batch's
    fingerprints are computed once, keys already present are replaced
    (re-ingested docs take their new text), untouched rows pass
    through, and after N batches the store equals the one-shot
    ``winnow_fingerprints`` over every document's latest version, row
    for row. Duplicate keys within a batch collapse to the
    deterministic max text before fingerprinting. A replayed batch
    recomputes identical rows, so the versioned store converges
    (``sources/versioned.VersionedStore``, the shared idempotent
    backend).

    This is what makes MOSS-style copy detection maintainable at
    100 TB: the corpus is fingerprinted exactly once as it arrives,
    and ``winnow_overlap_pairs(fingerprints=index.read(spark))``
    matches new batches against the whole history without ever
    re-fingerprinting it. Partition the store parquet by a fp_hash
    prefix in production so overlap probes prune.
    """

    def __init__(
        self,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 5,
        w: int = 4,
        keep_versions: int = 2,
    ) -> None:
        from atiesh_spark.sources.versioned import VersionedStore

        if k < 1 or w < 1:
            raise ValueError("k and w must be >= 1")
        self.id_col, self.text_col, self.k, self.w = id_col, text_col, k, w
        # fp_hash is the md5-conv gram hash at gram size k, window w —
        # family and parameters are part of the stored bytes, so the
        # stamp carries both: a parameter or hash-family change makes
        # overlap joins silently empty, so loading mismatched state
        # must raise instead (sources/versioned.py).
        self.store = VersionedStore(
            path,
            keep_versions=keep_versions,
            format_tag=f"winnow/md5-conv-v1/k{k}w{w}",
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        one = (
            batch_df.select(self.id_col, self.text_col)
            .groupBy(self.id_col)
            .agg(F.max(self.text_col).alias(self.text_col))
        )
        fresh = winnow_fingerprints(
            one, self.id_col, self.text_col, k=self.k, w=self.w
        )
        prev = self.store.read_before(spark, batch_id)
        if prev is not None:
            keys = batch_df.select(self.id_col).distinct()
            fresh = prev.join(
                F.broadcast(keys), self.id_col, "left_anti"
            ).unionByName(fresh)
        self.store.write(fresh, batch_id)

    def read(self, spark) -> DataFrame:
        return self.store.read(spark)


def winnow_probe(
    new_df: DataFrame,
    index_fp: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    max_df: int = 5,
    min_shared: int = 2,
) -> DataFrame:
    """Incremental copy detection: match a NEW document batch against
    the stored fingerprint index (``StreamingWinnowIndex.read`` or any
    persisted ``winnow_fingerprints`` frame) WITHOUT re-fingerprinting
    history — the probe side of the q175 maintenance loop, and the
    asymmetric counterpart of ``winnow_overlap_pairs`` (which pairs
    within one corpus).

    Only the new batch is fingerprinted (work ∝ batch size, never
    history). The document-frequency cap is computed over the INDEX —
    boilerplate is a property of the accumulated corpus, not of the
    arriving batch — and only index hashes with ``df <= max_df``
    participate (df >= 1 suffices here: one stored occurrence makes a
    probe hit meaningful, unlike the intra-corpus case where a pair
    needs two). Output: (new_id, old_id, shared_fp, frac_new,
    frac_old) for pairs sharing >= ``min_shared`` distinct hashes,
    fractions over each side's distinct fingerprint counts.
    """
    if max_df < 1:
        raise ValueError("max_df must be >= 1")
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    newfp = (
        winnow_fingerprints(new_df, id_col, text_col, k=k, w=w)
        .select(F.col(id_col).alias("new_id"), "fp_hash")
        .distinct()
    )
    stored = index_fp.select(
        F.col(id_col).alias("old_id"), "fp_hash"
    ).distinct()
    n_new = newfp.groupBy("new_id").agg(F.count(F.lit(1)).alias("__nn"))
    n_old = stored.groupBy("old_id").agg(F.count(F.lit(1)).alias("__no"))
    keep = (
        stored.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_df)
        .select("fp_hash")
    )
    shared = (
        newfp.join(stored.join(keep, "fp_hash", "left_semi"), "fp_hash")
        .groupBy("new_id", "old_id")
        .agg(F.count(F.lit(1)).alias("shared_fp"))
        .filter(F.col("shared_fp") >= min_shared)
    )
    return (
        shared.join(n_new, "new_id")
        .join(n_old, "old_id")
        .select(
            "new_id",
            "old_id",
            "shared_fp",
            F.round(F.col("shared_fp") / F.col("__nn"), 4).alias("frac_new"),
            F.round(F.col("shared_fp") / F.col("__no"), 4).alias("frac_old"),
        )
    )


def winnow_overlap_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    max_df: int = 5,
    min_shared: int = 2,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """``winnow_overlap_pairs`` plus SPAN LOCALIZATION: for each
    matched pair, where in each document the shared material sits —
    (id_1, id_2, shared_fp, lo_1, hi_1, lo_2, hi_2) with lo/hi the
    min/max character position of the shared fingerprints' grams on
    each side (hi is the gram START; add k-1 for the inclusive end).
    This is what positions buy over MinHash/SimHash: a reviewer (or a
    span-removal pass a la Lee et al.) gets the overlapping REGION,
    not just the fact of overlap.

    A fingerprint hash can be selected at several positions in one
    doc; the span covers them all (min/max over every selected
    position of every shared hash — the conservative hull). Same caps
    and shapes as winnow_overlap_pairs: df-capped hash join, counts
    over DISTINCT shared hashes, spans aggregated in the same pass.
    """
    if max_df < 2:
        raise ValueError("max_df must be >= 2 (a pair needs two docs)")
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    fp = (
        fingerprints
        if fingerprints is not None
        else winnow_fingerprints(df, id_col, text_col, k=k, w=w)
    )
    docfp = fp.select(F.col(id_col), "fp_hash", "fp_pos")
    dist = docfp.select(id_col, "fp_hash").distinct()
    keep = (
        dist.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter((F.col("__df") >= 2) & (F.col("__df") <= max_df))
        .select("fp_hash")
    )
    rare = docfp.join(keep, "fp_hash", "left_semi")
    a = rare.select(
        "fp_hash", F.col(id_col).alias("id_1"), F.col("fp_pos").alias("__p1")
    )
    b = rare.select(
        "fp_hash", F.col(id_col).alias("id_2"), F.col("fp_pos").alias("__p2")
    )
    return (
        a.join(b, "fp_hash")
        .filter(F.col("id_1") < F.col("id_2"))
        .groupBy("id_1", "id_2")
        .agg(
            F.countDistinct("fp_hash").alias("shared_fp"),
            F.min("__p1").alias("lo_1"),
            F.max("__p1").alias("hi_1"),
            F.min("__p2").alias("lo_2"),
            F.max("__p2").alias("hi_2"),
        )
        .filter(F.col("shared_fp") >= min_shared)
    )


def remove_overlap_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Span REMOVAL from overlap hulls: the third step of
    detect (q164) -> localize (q181) -> remove — cut the shared
    region out of the LOWER-PRIORITY side of every matched pair (the
    larger id, matching the min-id-survives convention everywhere
    else in the repo), keeping the rest of the document. The
    winnow-driven analog of exact-substring span removal (Lee et al.
    2022, ``corpus.remove_spans``): hulls come from fingerprints, so
    partial/paraphrase-adjacent copies are cut too.

    ``spans`` is a ``winnow_overlap_spans`` frame; the removed region
    for a pair is ``[lo_2, hi_2 + k - 1]`` (hull gram starts widened
    to the gram end). Multiple overlapping regions per document merge
    first (gaps-and-islands: a region starts a new island when its lo
    exceeds every previous hi), then the kept text is rebuilt
    RELATIONALLY — per merged region one "gap" segment
    (prev_hi+1 .. lo-1) plus the tail after the last region,
    reassembled with an executor-side array_sort — no per-row Python,
    no quadratic string surgery. Documents with no spans pass through
    unchanged. Output: (id, text_clean, n_removed) with ``n_removed``
    = chars cut.

    Engine shape: the spans frame is pair-sized (already candidate-
    bounded upstream); merging and segment extraction are one window
    + one groupBy on it; the corpus joins once, left, by id.
    """
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    regions = spans.select(
        F.col("id_2").alias(id_col),
        F.col("lo_2").alias("__lo"),
        (F.col("hi_2") + k - 1).alias("__hi"),
    )
    w = Window.partitionBy(id_col).orderBy("__lo", "__hi")
    prev_max = F.max("__hi").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = regions.select(
        F.col(id_col),
        "__lo",
        "__hi",
        F.sum(
            (F.col("__lo") > F.coalesce(prev_max, F.lit(0))).cast("int")
        )
        .over(w)
        .alias("__isl"),
    )
    merged = islands.groupBy(id_col, "__isl").agg(
        F.min("__lo").alias("__lo"), F.max("__hi").alias("__hi")
    )
    base = df.select(F.col(id_col), F.col(text_col))
    m = merged.join(base, id_col)
    w2 = Window.partitionBy(id_col).orderBy("__lo")
    gaps = m.select(
        F.col(id_col),
        F.col("__lo"),
        F.substring(
            F.col(text_col),
            F.coalesce(F.lag("__hi").over(w2), F.lit(0)) + 1,
            F.col("__lo") - F.coalesce(F.lag("__hi").over(w2), F.lit(0)) - 1,
        ).alias("__seg"),
    )
    tails = (
        m.groupBy(id_col)
        .agg(F.max("__hi").alias("__mh"))
        .join(base, id_col)
        .select(
            F.col(id_col),
            (F.length(text_col) + 1).alias("__lo"),
            F.expr(f"substring({text_col}, __mh + 1)").alias("__seg"),
        )
    )
    rebuilt = (
        gaps.unionByName(tails)
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__lo", "__seg"))
                    ),
                    lambda s: s["__seg"],
                ),
                "",
            ).alias("text_clean")
        )
    )
    return (
        base.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("text_clean", F.col(text_col)).alias("text_clean"),
            (
                F.length(text_col)
                - F.length(F.coalesce("text_clean", F.col(text_col)))
            ).alias("n_removed"),
        )
    )


def winnow_probe_spans(
    batch_keys: DataFrame,
    index_fp: DataFrame,
    id_col: str = "doc_id",
    max_df: int = 5,
    min_shared: int = 2,
) -> DataFrame:
    """Span-localized incremental copy detection: every overlap pair
    that involves at least one document of the CURRENT batch, with the
    q181 span hull — (id_1, id_2, shared_fp, lo_1, hi_1, lo_2, hi_2),
    id_1 < id_2.

    The probe side of :class:`StreamingCopyDetector`: the a-side of
    the pair join is restricted to ``batch_keys`` BEFORE the hash
    join, so per-batch work is ∝ batch candidates, never history²;
    pairs between two historical docs are not recomputed (they were
    emitted when their later member arrived). Because the restricted
    side can be either end of a canonical (lesser-id, greater-id)
    pair, positions are swapped per-row into id_1/id_2 order before
    the hull aggregate — an intra-batch pair appears in both
    orientations and collapses in the DISTINCT-hash count and
    min/max hulls. The df cap is computed over the INDEX (the q180
    discipline: boilerplate is a property of the accumulated corpus).
    """
    if max_df < 2:
        raise ValueError("max_df must be >= 2 (a pair needs two docs)")
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    docfp = index_fp.select(F.col(id_col), "fp_hash", "fp_pos")
    dist = docfp.select(id_col, "fp_hash").distinct()
    keep = (
        dist.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter((F.col("__df") >= 2) & (F.col("__df") <= max_df))
        .select("fp_hash")
    )
    rare = docfp.join(keep, "fp_hash", "left_semi")
    a = rare.join(
        F.broadcast(batch_keys.select(id_col).distinct()), id_col, "left_semi"
    ).select(
        "fp_hash", F.col(id_col).alias("__ida"), F.col("fp_pos").alias("__pa")
    )
    b = rare.select(
        "fp_hash", F.col(id_col).alias("__idb"), F.col("fp_pos").alias("__pb")
    )
    swap = F.col("__ida") < F.col("__idb")
    return (
        a.join(b, "fp_hash")
        .filter(F.col("__ida") != F.col("__idb"))
        .select(
            "fp_hash",
            F.least("__ida", "__idb").alias("id_1"),
            F.greatest("__ida", "__idb").alias("id_2"),
            F.when(swap, F.col("__pa")).otherwise(F.col("__pb")).alias("__p1"),
            F.when(swap, F.col("__pb")).otherwise(F.col("__pa")).alias("__p2"),
        )
        .groupBy("id_1", "id_2")
        .agg(
            F.countDistinct("fp_hash").alias("shared_fp"),
            F.min("__p1").alias("lo_1"),
            F.max("__p1").alias("hi_1"),
            F.min("__p2").alias("lo_2"),
            F.max("__p2").alias("hi_2"),
        )
        .filter(F.col("shared_fp") >= min_shared)
    )


class StreamingCopyDetector:
    """The full MOSS-style copy-detection lifecycle in ONE
    ``foreachBatch`` function — maintain → probe → span-localize —
    incremental copy detection as a user would deploy it:

    1. **maintain**: the batch's fingerprints merge into the
       :class:`StreamingWinnowIndex` store (each doc fingerprinted
       exactly once, history never re-shingled);
    2. **probe + localize**: :func:`winnow_probe_spans` matches the
       batch against the updated index and localizes the overlap
       hull of every pair the batch completes;
    3. **accumulate**: new pairs merge into a second versioned pair
       store keyed by (id_1, id_2) — replacing any prior version of
       the same pair, so a replayed batch converges
       (``sources/versioned.VersionedStore`` on both stores).

    Exactness contract (the q196 replay grade): when document
    versions are stable and no participating hash ever exceeds
    ``max_df``, the accumulated pair store after N batches equals
    the one-shot ``winnow_overlap_spans`` over the whole corpus —
    each pair is emitted exactly when its later member arrives, from
    the same fingerprint rows the batch computation uses. When df
    DOES drift past the cap mid-stream (heavy boilerplate arriving
    late), streaming keeps pairs a full-corpus run would have
    capped away — the honest difference between prefix-df and
    corpus-df, documented here rather than hidden.
    """

    def __init__(
        self,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 5,
        w: int = 4,
        max_df: int = 5,
        min_shared: int = 2,
        keep_versions: int = 2,
    ) -> None:
        from atiesh_spark.sources.versioned import VersionedStore

        self.index = StreamingWinnowIndex(
            f"{path}/index", id_col, text_col, k=k, w=w,
            keep_versions=keep_versions,
        )
        self.pairs = VersionedStore(f"{path}/pairs", keep_versions=keep_versions)
        self.id_col = id_col
        self.max_df = max_df
        self.min_shared = min_shared

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        self.index(batch_df, batch_id)
        fresh = winnow_probe_spans(
            batch_df.select(self.id_col),
            self.index.read(spark),
            self.id_col,
            max_df=self.max_df,
            min_shared=self.min_shared,
        )
        prev = self.pairs.read_before(spark, batch_id)
        if prev is not None:
            fresh = prev.join(
                fresh.select("id_1", "id_2"), ["id_1", "id_2"], "left_anti"
            ).unionByName(fresh)
        self.pairs.write(fresh, batch_id)

    def read(self, spark) -> DataFrame:
        return self.pairs.read(spark)


def compression_ratio(
    df: DataFrame,
    text_col: str,
    out_col: str = "zlib_ratio",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio (compressed bytes / raw
    UTF-8 bytes) — the cheap whole-document redundancy signal the
    Gopher/Dolma-class curation stacks use alongside the per-pattern
    repetition fractions of ``gopher_rules``: templated or looped text
    compresses far below natural prose, machine-generated high-entropy
    noise compresses above it, and the ratio needs no corpus pass, no
    vocabulary, and no shuffle.

    Arrow-batched pandas UDF over stdlib zlib at a FIXED level so the
    bytes (hence the ratio) are deterministic; empty/NULL text yields
    NULL (no bytes to judge — surface it, never 0). Row-local: scoring
    100 TB rides the scan like the rest of the quality family; the
    ratio composes with ``curation``'s reason-coded gates as an
    ordinary numeric column.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NB: hints are evaluated against module globals (PEP 563 +
    # pyspark's get_type_hints), so the locally-imported pd cannot be
    # referenced in the signature — annotate via __annotations__.
    def _ratio_fn(s):
        import zlib

        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, level)) / len(raw)

        return s.map(one)

    _ratio_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _ratio = pandas_udf(_ratio_fn, "double")

    return df.withColumn(out_col, _ratio(F.col(text_col)))


def luhn_card_audit(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Checksum-validated card-number audit: (id_col, n_candidates,
    n_valid, n_invalid), one row per document that contains at least
    one candidate.

    The regex-only PII scrub (redact_pii) treats every 13-19 digit run
    as a card — at corpus scale that over-redacts order ids and
    timestamps. This operator separates LOOKS-LIKE from IS: a
    candidate is a whitespace token of digit groups (dashes allowed)
    whose digit count is 13-19; it is VALID iff it passes the Luhn
    mod-10 checksum (ISO/IEC 7812) — double every second digit from
    the right, subtract 9 when it exceeds 9, total divisible by 10.
    The precision gate a redaction pipeline applies before destroying
    non-PII tokens.

    All row-local codegen: tokens materialize once, candidates keep
    their digit string in a struct (never re-normalized per digit),
    and the checksum is one aggregate() fold per candidate — zero
    shuffles beyond the final projection, no lookaround regex (the
    rule stays portable to RE2-based engines for oracle replay).
    """
    from atiesh_spark.functions.text import ws_tokens

    base = df.select(
        F.col(id_col), ws_tokens(F.col(text_col)).alias("__toks")
    )
    cand_digits = F.filter(
        F.transform(
            F.filter(
                F.col("__toks"),
                lambda t: t.rlike(r"^[0-9]+(-[0-9]+)*$"),
            ),
            lambda t: F.regexp_replace(t, "-", ""),
        ),
        lambda d: (F.length(d) >= 13) & (F.length(d) <= 19),
    )

    def luhn_ok(d):
        # i counts 1-based from the RIGHT; even i doubles
        def dig(i):
            return F.ascii(d.substr(F.length(d) - i + 1, F.lit(1))) - 48

        total = F.aggregate(
            F.sequence(F.lit(1), F.length(d)),
            F.lit(0),
            lambda acc, i: acc
            + F.when(
                i % 2 == 0,
                F.when(dig(i) * 2 > 9, dig(i) * 2 - 9)
                .otherwise(dig(i) * 2),
            ).otherwise(dig(i)),
        )
        return total % 10 == 0

    staged = (
        base.select(F.col(id_col), cand_digits.alias("__cands"))
        .filter(F.size("__cands") > 0)
        .select(
            F.col(id_col),
            F.size("__cands").cast("bigint").alias("n_candidates"),
            # materialized so the fold runs once, not once per use
            F.size(F.filter("__cands", luhn_ok))
            .cast("bigint").alias("n_valid"),
        )
    )
    return staged.select(
        id_col, "n_candidates", "n_valid",
        (F.col("n_candidates") - F.col("n_valid")).alias("n_invalid"),
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str,
    group_col: str,
    top_k: int = 1000,
    round_to: int = 4,
) -> DataFrame:
    """Coverage of a fixed top-K corpus vocabulary per group:
    (group, n_tokens, covered, coverage, oov_types) — the vocabulary-
    planning twin of the Heaps curve (corpus.vocab_growth): a K-entry
    vocab chosen on corpus frequency covers each language/domain
    unevenly, and the groups with low coverage are the ones a shared
    tokenizer will shred into bytes/UNKs.

    vocab = the top_k most frequent tokens corpus-wide (count desc,
    token asc — deterministic tie-break). Plan: ONE token-count
    shuffle (map-side combined), TakeOrderedAndProject for the top-k,
    then the K-row vocab broadcasts onto the per-(group, token)
    occurrence counts — the corpus never shuffles twice and the
    selection never range-sorts globally.
    """
    from atiesh_spark.functions.text import ws_tokens

    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    toks = df.select(
        F.col(group_col).alias("__grp"),
        F.explode(ws_tokens(F.col(text_col))).alias("__tok"),
    )
    counts = toks.groupBy("__grp", "__tok").agg(
        F.count(F.lit(1)).alias("__n")
    )
    vocab = (
        counts.groupBy("__tok")
        .agg(F.sum("__n").alias("__total"))
        .orderBy(F.desc("__total"), F.asc("__tok"))
        .limit(top_k)
        .select("__tok", F.lit(True).alias("__in_vocab"))
    )
    flagged = counts.join(F.broadcast(vocab), "__tok", "left")
    return flagged.groupBy(F.col("__grp").alias(group_col)).agg(
        F.sum("__n").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("__in_vocab"), F.col("__n")).otherwise(F.lit(0)))
        .cast("bigint").alias("covered"),
        F.round(
            F.sum(F.when(F.col("__in_vocab"), F.col("__n"))
                  .otherwise(F.lit(0))) / F.sum("__n"),
            round_to,
        ).alias("coverage"),
        F.sum(F.when(F.col("__in_vocab").isNull(), F.lit(1))
              .otherwise(F.lit(0)))
        .cast("bigint").alias("oov_types"),
    )
