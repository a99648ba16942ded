"""Corpus-level generation-quality metrics: BLEU and chrF.

The reference engine (whisperaven/atiesh) is an event mover with no
evaluation surface; these operators extend the engine for the
LLM-data-pipeline role the repo targets: once a pipeline produces
candidate text (translations, paraphrases, distilled rewrites), the
closing loop is corpus-level n-gram agreement against references —
BLEU (Papineni et al., ACL 2002) and chrF (Popović, WMT 2015), the
two metrics every MT/generation pipeline reports.

Scale shape: each (candidate, reference) pair reduces to clipped
n-gram count AGGREGATES before anything corpus-wide happens. The
plan is ONE pass: the prepped token array / char stream is
materialized in its own projection (so split/regexp_replace run once
per ROW — inlining them into the gram lambdas re-evaluates them per
gram POSITION, an O(len^2) trap measured at 4x+ on this very module),
then a single explode emits both sides' grams tagged c/r, a single
map-side-combined shuffle lands per-(pair, group, n, gram) counts,
and two narrowing aggregates produce per-(group, n) integer sums.
The group key rides the gram shuffle (it is functionally dependent
on the pair id), so no join back to the text table ever happens.
Nothing is all-pairs; metric cost is linear in corpus tokens.

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


def _word_ngrams(col: str, n_max: int, n_min: int = 1) -> str:
    """SQL for array<struct<n,gram>> of ALL word n-grams
    n = n_min..n_max over an already-materialized token-array column —
    one explode covers every order, and the lambda body only slices
    the bound array reference (never re-tokenizes). Single-order
    callers (ROUGE-N) pass n_min == n_max so lower orders are never
    built or shuffled."""
    # sequence(1, k) with k < 1 DESCENDS ([1, 0]); the filter guard
    # (not greatest()) is what keeps short texts from feeding slice()
    # a zero start.
    per_n = ", ".join(
        f"transform(filter(sequence(1, greatest(size({col}), 1)), "
        f"i -> i + {n} - 1 <= size({col})), "
        f"i -> struct({n} AS n, "
        f"concat_ws(' ', slice({col}, i, {n})) AS gram))"
        for n in range(n_min, n_max + 1)
    )
    return f"flatten(array({per_n}))"


def _char_ngrams(col: str, n_max: int) -> str:
    """Same device over an already-materialized space-stripped string
    column (chrF counts character n-grams with whitespace removed)."""
    per_n = ", ".join(
        f"transform(filter(sequence(1, greatest(length({col}), 1)), "
        f"i -> i + {n} - 1 <= length({col})), "
        f"i -> struct({n} AS n, substring({col}, i, {n}) AS gram))"
        for n in range(1, n_max + 1)
    )
    return f"flatten(array({per_n}))"


def _clipped_counts(
    pairs: DataFrame,
    pair_col: str,
    group_col: str,
    cand_col: str,
    ref_col: str,
    prep,
    grams,
    n_max: int,
    keep_one_sided: bool = False,
) -> DataFrame:
    """Per-(pair, group, n): candidate gram total, reference gram
    total, and the clipped overlap sum(min(cand_count, ref_count)) —
    the shared kernel of BLEU, chrF and ROUGE-N.

    ``prep`` maps a raw text column name to the per-row prepped
    Column (token array / stripped string) — materialized ONCE in
    its own projection. ``grams`` is _word_ngrams or _char_ngrams
    over the materialized column.

    ``keep_one_sided`` controls the empty-side convention: corpus
    BLEU/chrF (sacrebleu aggregation) keep a (pair, n) row when only
    ONE side produced grams — a candidate facing an empty/short
    reference still counts in the precision denominator (clipped = 0)
    and both unigram totals still feed the corpus lengths. Per-pair
    metrics (ROUGE-N) pass False: a pair with no order-n grams on
    either side has an undefined score and is excluded (the standard
    empty-reference convention; callers document it). Rows where BOTH
    totals are zero cannot exist — a (pair, n) group only forms from
    at least one exploded gram row.
    """
    # Widen BEFORE the gram explode: a single small parquet file scans
    # as one split, and without this the entire explode+count runs on
    # one core. At warehouse scale (thousands of files) this is a
    # plan-analysis no-op.
    base = widen_for_python_stage(
        pairs.select(pair_col, group_col, cand_col, ref_col)
    ).select(
        pair_col,
        F.col(group_col).alias("__grp"),
        prep(cand_col).alias("__c"),
        prep(ref_col).alias("__r"),
    )
    # One generator row per gram, both sides tagged — a single scan
    # and a single shuffle cover candidate and reference counts.
    both = (
        f"concat("
        f"transform({grams('__c', n_max)}, "
        f"g -> struct(g.n AS n, g.gram AS gram, 1 AS is_c)), "
        f"transform({grams('__r', n_max)}, "
        f"g -> struct(g.n AS n, g.gram AS gram, 0 AS is_c)))"
    )
    cnt = (
        base.select(pair_col, "__grp", F.explode(F.expr(both)).alias("g"))
        .groupBy(
            pair_col, "__grp",
            F.col("g.n").alias("n"), F.col("g.gram").alias("gram"),
        )
        .agg(
            F.sum("g.is_c").alias("c_cnt"),
            (F.count(F.lit(1)) - F.sum("g.is_c")).alias("r_cnt"),
        )
    )
    out = cnt.groupBy(pair_col, "__grp", "n").agg(
        F.sum(F.least("c_cnt", "r_cnt")).alias("clipped"),
        F.sum("c_cnt").alias("c_total"),
        F.sum("r_cnt").alias("r_total"),
    )
    if keep_one_sided:
        return out
    return out.filter((F.col("c_total") > 0) & (F.col("r_total") > 0))


def _word_prep(col: str) -> Column:
    return F.expr(f"filter(split({col}, '\\\\s+'), x -> x != '')")


def _char_prep(col: str) -> Column:
    return F.regexp_replace(F.col(col), r"\s+", "")


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
        _word_prep, _word_ngrams, max_n, keep_one_sided=True,
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
        _char_prep, _char_ngrams, max_n, keep_one_sided=True,
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

    Same single-shuffle kernel as corpus_bleu; cost linear in corpus
    tokens.
    """
    # single-order gram builder: orders < n would be exploded,
    # shuffled, and aggregated only to be filtered out again
    counts = _clipped_counts(
        pairs, pair_col, group_col, cand_col, ref_col,
        _word_prep,
        lambda c, nm: _word_ngrams(c, nm, n_min=n),
        n,
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
