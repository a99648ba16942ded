"""Corpus-level generation-quality metrics: BLEU and chrF.

The reference engine (whisperaven/atiesh) is an event mover with no
evaluation surface; these operators extend the engine for the
LLM-data-pipeline role the repo targets: once a pipeline produces
candidate text (translations, paraphrases, distilled rewrites), the
closing loop is corpus-level n-gram agreement against references —
BLEU (Papineni et al., ACL 2002) and chrF (Popović, WMT 2015), the
two metrics every MT/generation pipeline reports.

Scale shape (rebuilt round 14, the row-local-shingle discipline):
both sides of a (candidate, reference) pair live in the SAME ROW, so
the per-pair clipped overlap needs NO shuffle at all — the r13 lesson
(move per-doc work before the exchange) taken to its limit. The
prepped token array / char stream is materialized in its own
projection (so split/regexp_replace run once per ROW — inlining them
into the gram lambdas re-evaluates them per gram POSITION, an
O(len^2) trap measured at 4x+ on this very module); then, per order
n, the two sides' grams are tagged, ARRAY-SORTED and run-length
walked row-locally (sort + neighbor-compare run ends + one
slice/filter pass per run — O(k log k) per row, all codegen), which
yields sum(min(cand_count, ref_count)) per (pair, n) without ever
exploding gram occurrences. The ONLY shuffle in the whole metric is
the final per-(group, n) integer-sum aggregate: 6 short rows per
pair instead of one row per gram occurrence (~2 sides x 6 orders x
|text| rows — the former plan's shuffle, whose sort/spill made q216
the steepest non-pinned scale curve at 7.99x for 10x data). Nothing
is all-pairs; metric cost is linear in corpus tokens and the shuffle
is corpus-INDEPENDENT per pair.

Determinism: every precision/recall is a ratio of exact integer
sums; the only float ops are the final log/exp/divide on those
integers, rounded to 4 decimals on both the Spark and oracle sides
(the q209 discipline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from atiesh_spark.session import widen_for_python_stage

__all__ = ["corpus_bleu", "corpus_chrf", "corpus_rouge_n"]


def _grams_one(col: str, n: int, unit: str) -> str:
    """SQL for the array<string> of order-``n`` grams over an
    already-materialized prepped column (token array for ``word``,
    space-stripped string for ``char``). The lambda body only
    slices/substrings the bound column reference — never re-tokenizes.
    """
    # sequence(1, k) with k < 1 DESCENDS ([1, 0]); the filter guard
    # (not greatest()) is what keeps short texts from feeding slice()
    # a zero start.
    if unit == "char":
        return (
            f"transform(filter(sequence(1, greatest(length({col}), 1)), "
            f"i -> i + {n} - 1 <= length({col})), "
            f"i -> substring({col}, i, {n}))"
        )
    return (
        f"transform(filter(sequence(1, greatest(size({col}), 1)), "
        f"i -> i + {n} - 1 <= size({col})), "
        f"i -> concat_ws(' ', slice({col}, i, {n})))"
    )


def _gram_total(col: str, n: int, unit: str) -> str:
    """Closed-form order-``n`` gram count of a prepped column: exactly
    ``size(_grams_one(...))`` (= max(len - n + 1, 0)) without building
    the array."""
    length = f"length({col})" if unit == "char" else f"size({col})"
    return f"cast(greatest({length} - {n} + 1, 0) AS bigint)"


def _clipped_counts(
    pairs: DataFrame,
    pair_col: str,
    group_col: str,
    cand_col: str,
    ref_col: str,
    prep,
    unit: str,
    n_max: int,
    keep_one_sided: bool = False,
    n_min: int = 1,
) -> DataFrame:
    """Per-(pair, group, n): candidate gram total, reference gram
    total, and the clipped overlap sum(min(cand_count, ref_count)) —
    the shared kernel of BLEU, chrF and ROUGE-N.

    ``prep`` maps a raw text column name to the per-row prepped
    Column (token array / stripped string, NULL-safe) — materialized
    ONCE in its own projection. ``unit`` is ``"word"`` or ``"char"``.
    Single-order callers (ROUGE-N) pass ``n_min == n_max`` so lower
    orders are never built.

    ROW-LOCAL (round 14): both sides of a pair live in one row, so
    the clipped overlap is computed WITHOUT a gram shuffle. Per order:

      1. tag each side's grams (c=1 candidate, c=0 reference), concat,
         ``array_sort`` — equal grams become contiguous runs
         (O(k log k) per row);
      2. ONE ``aggregate`` pass walks the sorted array carrying
         (acc, previous gram, run cand-count, run ref-count): a gram
         change closes the run and adds ``min(cc, rc)``; the finish
         lambda closes the last run. ``clipped`` = sum over distinct
         grams of min(cand_count, ref_count), O(k), single pass (the
         fused form measured ~2x the run-ends/slice variant — one
         interpreted-lambda walk instead of three).

    Gram totals are closed-form (``_gram_total``). The former plan
    exploded every gram OCCURRENCE into a (pair, group, n, gram)
    shuffle — 2 sides x orders x |text| rows whose sort/spill made the
    metric the steepest non-pinned scale curve (7.99x at 10x data,
    r13); now the pair row emits ``n_max - n_min + 1`` integer rows
    and only the per-group reduction shuffles.

    ``keep_one_sided`` controls the empty-side convention: corpus
    BLEU/chrF (sacrebleu aggregation) keep a (pair, n) row when only
    ONE side produced grams — a candidate facing an empty/short
    reference still counts in the precision denominator (clipped = 0)
    and both unigram totals still feed the corpus lengths. Per-pair
    metrics (ROUGE-N) pass False: a pair with no order-n grams on
    either side has an undefined score and is excluded (the standard
    empty-reference convention; callers document it). Rows where BOTH
    totals are zero are dropped in every mode, matching the
    no-gram-rows behavior of the former exploded plan.
    """
    orders = list(range(n_min, n_max + 1))
    # Widen BEFORE the gram stage: a single small parquet file scans
    # as one split, and without this the whole sort/count runs on one
    # core. At warehouse scale (thousands of files) this is a
    # plan-analysis no-op.
    base = widen_for_python_stage(
        pairs.select(pair_col, group_col, cand_col, ref_col)
    ).select(
        pair_col,
        F.col(group_col).alias("__grp"),
        prep(cand_col).alias("__c"),
        prep(ref_col).alias("__r"),
    )
    # Intermediates are materialized as REAL projection columns per
    # order — each is referenced several times downstream, and
    # CollapseProject will not re-inline a non-trivial alias referenced
    # more than once (the same device as word_shingles' token array).
    srt = base.select(
        pair_col, "__grp", "__c", "__r",
        *[
            F.expr(
                "array_sort(concat("
                f"transform({_grams_one('__c', n, unit)}, "
                "g -> struct(g AS gram, 1 AS c)), "
                f"transform({_grams_one('__r', n, unit)}, "
                "g -> struct(g AS gram, 0 AS c))))"
            ).alias(f"__s{n}")
            for n in orders
        ],
    )
    # fused run walk: initial pg = NULL never null-safe-equals a gram,
    # so the first element always opens a run; min(0, 0) = 0 makes the
    # empty-array and first-run closes free
    clipped = (
        "aggregate(__s{n}, "
        "struct(cast(0 as bigint) AS acc, cast(null as string) AS pg, "
        "0 AS cc, 0 AS rc), "
        "(s, x) -> if(x.gram <=> s.pg, "
        "struct(s.acc AS acc, s.pg AS pg, s.cc + x.c AS cc, "
        "(s.rc + 1) - x.c AS rc), "
        "struct(s.acc + cast(least(s.cc, s.rc) as bigint) AS acc, "
        "x.gram AS pg, x.c AS cc, 1 - x.c AS rc)), "
        "s -> s.acc + least(s.cc, s.rc))"
    )
    structs = [
        F.expr(
            f"struct({n} AS n, "
            f"{clipped.format(n=n)} AS clipped, "
            f"{_gram_total('__c', n, unit)} AS c_total, "
            f"{_gram_total('__r', n, unit)} AS r_total)"
        )
        for n in orders
    ]
    out = (
        srt.select(pair_col, "__grp", F.explode(F.array(*structs)).alias("g"))
        .select(
            pair_col, "__grp",
            F.col("g.n").alias("n"), F.col("g.clipped").alias("clipped"),
            F.col("g.c_total").alias("c_total"),
            F.col("g.r_total").alias("r_total"),
        )
    )
    if keep_one_sided:
        return out.filter((F.col("c_total") > 0) | (F.col("r_total") > 0))
    return out.filter((F.col("c_total") > 0) & (F.col("r_total") > 0))


def _word_prep(col: str) -> Column:
    # NULL-safe: a NULL text produced zero exploded gram rows in the
    # former plan; the row-local kernel gets the same zero totals from
    # an empty array.
    return F.expr(
        f"coalesce(filter(split({col}, '\\\\s+'), x -> x != ''), array())"
    )


def _char_prep(col: str) -> Column:
    return F.coalesce(
        F.regexp_replace(F.col(col), r"\s+", ""), F.lit("")
    )


def corpus_bleu(
    pairs: DataFrame,
    pair_col: str,
    cand_col: str,
    ref_col: str,
    group_col: str,
    max_n: int = 4,
    round_to: int = 4,
) -> DataFrame:
    """Corpus-level BLEU per ``group_col``: (group, n_pairs, c_len,
    r_len, bp, p1..p{max_n}, bleu).

    Papineni et al. 2002 exactly: modified (clipped) n-gram precision
    p_n = sum over the whole group of min(cand_count, ref_count) /
    sum of candidate n-gram counts; brevity penalty
    bp = min(1, exp(1 - r_len/c_len)); bleu = bp *
    exp(mean_n log p_n). Orders n >= 2 use add-one smoothing
    ((clipped+1)/(total+1), Lin & Och 2004) so a group with no
    higher-order match degrades instead of hitting log 0; p1 stays
    exact, and a group with p1 = 0 scores bleu = 0.

    Empty-side pairs follow the published corpus aggregation
    (keep_one_sided=True): a candidate facing an empty reference still
    feeds the p_n denominators (clipped = 0) and both sides' unigram
    totals still feed c_len/r_len, matching sacrebleu. A group whose
    candidates are ALL empty lands c_len = 0: bp is defined as 0 there
    (r_len > 0 means maximal brevity) instead of dividing by zero.
    """
    counts = _clipped_counts(
        pairs, pair_col, group_col, cand_col, ref_col,
        _word_prep, "word", max_n, keep_one_sided=True,
    )
    per_group = counts.groupBy(F.col("__grp").alias("grp"), "n").agg(
        F.sum("clipped").alias("clipped"),
        F.sum("c_total").alias("c_total"),
        F.sum("r_total").alias("r_total"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    # Complete the (group, n) grid: an order no candidate in the group
    # reaches (all texts shorter than n words) has no aggregate row,
    # but its smoothed precision is a well-defined (0+1)/(0+1) = 1 —
    # without the grid it would surface as NULL and poison the log
    # mean. The grid is |groups| x max_n rows — driver-side nothing.
    # Groups come from the source table, NOT per_group: deriving them
    # from per_group.distinct() would execute the whole gram pipeline
    # a second time just to learn the group keys. A group whose every
    # pair was filtered out (no grams on one side) gets an all-zero
    # grid row here; the n_pairs > 0 filter below drops it, matching
    # the no-row behavior of the aggregate itself.
    grid = (
        pairs.select(F.col(group_col).alias("grp")).distinct()
        .crossJoin(
            pairs.sparkSession.range(1, max_n + 1)
            .select(F.col("id").cast("int").alias("n"))
        )
    )
    per_group = grid.join(per_group, ["grp", "n"], "left").fillna(
        0, subset=["clipped", "c_total", "r_total", "n_pairs"]
    )
    # Unigram totals double as corpus candidate/reference token
    # lengths (every token is a 1-gram).
    # guard the exact unigram ratio: a group whose every pair was
    # filtered out reaches this projection as an all-zero grid row
    # BEFORE the n_pairs > 0 filter drops it, and 0/0 THROWS under
    # Spark 4 ANSI (on in this repo's session) instead of the NULL a
    # non-ANSI engine would shrug at; the guarded value never survives
    p_exact = F.when(
        F.col("c_total") > 0, F.col("clipped") / F.col("c_total")
    ).otherwise(F.lit(0.0))
    p_smooth = (F.col("clipped") + 1) / (F.col("c_total") + 1)
    p_n = F.when(F.col("n") == 1, p_exact).otherwise(p_smooth)
    agg = per_group.groupBy("grp").agg(
        F.max(F.when(F.col("n") == 1, F.col("n_pairs"))).alias("n_pairs"),
        F.max(F.when(F.col("n") == 1, F.col("c_total"))).alias("c_len"),
        F.max(F.when(F.col("n") == 1, F.col("r_total"))).alias("r_len"),
        F.max(F.when(F.col("n") == 1, F.col("clipped"))).alias("clip1"),
        *[
            F.max(F.when(F.col("n") == i, F.round(p_n, round_to)))
            .alias(f"p{i}")
            for i in range(1, max_n + 1)
        ],
        (F.sum(F.when(F.col("n") <= max_n, F.log(p_n))) / max_n)
        .alias("__logmean"),
    )
    bp = (
        F.when(F.col("c_len") >= F.col("r_len"), F.lit(1.0))
        .when(
            F.col("c_len") > 0,
            F.exp(F.lit(1.0) - F.col("r_len") / F.col("c_len")),
        )
        .otherwise(F.lit(0.0))  # all-empty candidates: ANSI-safe bp
    )
    bleu = F.when(F.col("clip1") == 0, F.lit(0.0)).otherwise(
        bp * F.exp(F.col("__logmean"))
    )
    return agg.filter(F.col("n_pairs") > 0).select(
        F.col("grp").alias(group_col),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.col("c_len").cast("bigint").alias("c_len"),
        F.col("r_len").cast("bigint").alias("r_len"),
        F.round(bp, round_to).alias("bp"),
        *[F.col(f"p{i}") for i in range(1, max_n + 1)],
        F.round(bleu, round_to).alias("bleu"),
    )


def corpus_chrf(
    pairs: DataFrame,
    pair_col: str,
    cand_col: str,
    ref_col: str,
    group_col: str,
    max_n: int = 6,
    beta: float = 2.0,
    round_to: int = 4,
) -> DataFrame:
    """Corpus-level chrF per ``group_col``: (group, n_pairs, chr_p,
    chr_r, chrf).

    Popović 2015: character-n-gram precision and recall (n = 1..max_n,
    whitespace stripped), averaged ARITHMETICALLY over n, combined as
    F_beta = (1+beta^2) * P * R / (beta^2 * P + R) with beta = 2
    (recall-weighted — the published chrF2). Corpus-level: counts sum
    over the group before the per-n ratios, and one-sided pairs keep
    contributing their grams to the side that has them (sacrebleu
    aggregation, keep_one_sided=True). Orders longer than every
    candidate/reference in the group contribute nothing and are
    excluded from the average (the sacrebleu "effective order"
    convention — the group-level both-sides filter below).
    """
    counts = _clipped_counts(
        pairs, pair_col, group_col, cand_col, ref_col,
        _char_prep, "char", max_n, keep_one_sided=True,
    )
    per_group = (
        counts.groupBy(F.col("__grp").alias("grp"), "n")
        .agg(
            F.sum("clipped").alias("clipped"),
            F.sum("c_total").alias("c_total"),
            F.sum("r_total").alias("r_total"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .filter((F.col("c_total") > 0) & (F.col("r_total") > 0))
    )
    agg = per_group.groupBy("grp").agg(
        F.max("n_pairs").alias("n_pairs"),
        F.avg(F.col("clipped") / F.col("c_total")).alias("__p"),
        F.avg(F.col("clipped") / F.col("r_total")).alias("__r"),
    )
    b2 = beta * beta
    chrf = F.when(
        (F.col("__p") == 0) & (F.col("__r") == 0), F.lit(0.0)
    ).otherwise(
        (1 + b2) * F.col("__p") * F.col("__r")
        / (b2 * F.col("__p") + F.col("__r"))
    )
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.round("__p", round_to).alias("chr_p"),
        F.round("__r", round_to).alias("chr_r"),
        F.round(chrf, round_to).alias("chrf"),
    )


def corpus_rouge_n(
    pairs: DataFrame,
    pair_col: str,
    cand_col: str,
    ref_col: str,
    group_col: str,
    n: int = 2,
    round_to: int = 4,
) -> DataFrame:
    """ROUGE-N per ``group_col``: (group, n_pairs, sum_p, sum_r,
    sum_f1) — SUMS of the per-pair rounded scores, with the mean left
    to the reader as sum/n_pairs.

    Lin 2004 (Text Summarization Branches Out): per-pair n-gram
    precision/recall/F1 with reference-side clipping — unlike BLEU the
    canonical ROUGE is a per-pair score averaged over the corpus, so
    the per-pair ratios (exact integer divisions) are rounded first
    and SUMMED, never averaged after rounding (a mean of 4dp values
    can land exactly on a .00005 boundary where engines round apart;
    a sum of 0.0001-multiples is itself a 0.0001-multiple). Pairs
    where either side has no order-n gram (text shorter than n words)
    are excluded, the standard empty-reference convention — n_pairs
    counts what was scored.

    Same row-local kernel as corpus_bleu (the only shuffle is the
    per-group reduction); cost linear in corpus tokens.
    """
    # single order only: lower orders would be built and dropped again
    counts = _clipped_counts(
        pairs, pair_col, group_col, cand_col, ref_col,
        _word_prep, "word", n, n_min=n,
    )
    p = F.col("clipped") / F.col("c_total")
    r = F.col("clipped") / F.col("r_total")
    f1 = F.when(
        F.col("clipped") > 0, 2 * p * r / (p + r)
    ).otherwise(F.lit(0.0))
    per_pair = counts.select(
        F.col("__grp").alias("grp"),
        F.round(p, round_to).alias("__p"),
        F.round(r, round_to).alias("__r"),
        F.round(f1, round_to).alias("__f1"),
    )
    return per_pair.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum("__p"), round_to).alias("sum_p"),
        F.round(F.sum("__r"), round_to).alias("sum_r"),
        F.round(F.sum("__f1"), round_to).alias("sum_f1"),
    ).select(
        F.col("grp").alias(group_col),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        "sum_p", "sum_r", "sum_f1",
    )
