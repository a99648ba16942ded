"""End-to-end corpus curation: the whole pre-training data-prep chain
as ONE declarative plan.

quality gate -> exact dedup -> per-language token budget, reported per
language with the count surviving each stage. This is the composite the
individual operators exist for: because every stage is a DataFrame
transformation (no driver round-trips, no materialization between
stages), Catalyst sees the WHOLE pipeline — filters fuse into the scan,
the dedup shuffle carries only gate survivors, and the budget window
reuses rows already partitioned by language where possible.

At 100 TB each stage is the scale-proven operator it delegates to:
the gate is codegen predicates, dedup shuffles md5 digests (never full
text twice), the budget is one window pass. The per-stage report is a
handful of per-language aggregates over ever-smaller frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from atiesh_spark.operators.dedup import exact_dedup
from atiesh_spark.operators.sampling import budgeted_take


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    cost_col: str = "n_chars",
    min_chars: int = 20,
    max_chars: int = 100_000,
    max_mean_word_len: float = 20.0,
    budget: int = 5_000,
    bucketed_table: str | None = None,
    num_buckets: int = 32,
    bucketed_table_mode: str = "errorifexists",
) -> DataFrame:
    """Curate a document corpus and report per language:
    (lang, n_candidates, n_after_quality, n_after_dedup, n_selected,
    cost_selected).

    Stages (all declarative, one plan):
      1. quality gate — cost in [min_chars, max_chars] and mean
         whitespace-token length <= ``max_mean_word_len`` (the cheap
         C4-style screens; spam/base64 blobs fail the word-length one);
      2. exact dedup — md5(text), min-id survivor per digest;
      3. budget take — per language in deterministic ``id_col`` order
         until ``budget`` cost accumulates (first row over the line
         kept), the q49/budgeted_take contract.

    Languages whose every document fails a stage still report (their
    later-stage counts are 0) — a silent vanishing language is exactly
    what the report exists to catch.

    ``bucketed_table``: the 100-TB path for stage 2's survivor semi
    join — by default the corpus makes ONE full-width shuffle on
    ``id_col`` to meet the survivor keys (the accepted floor for the
    ad-hoc call). Passing a table name instead persists the gate
    survivors ONCE as a ``write_bucketed`` managed table bucketed by
    ``id_col`` (``num_buckets``), and the semi join plans with NO
    exchange on the corpus side — only the narrow keep-id keys shuffle
    into the buckets. The shuffle is paid at write time and amortized
    over every later join/aggregation on the id (incremental re-runs,
    downstream enrichment) — the ``sources/bucketing`` discipline.

    The bucketed write happens EAGERLY at call time (building the
    report DataFrame is otherwise lazy). ``bucketed_table_mode`` is the
    save mode for that write and defaults to ``errorifexists`` so an
    existing table with the same name is never silently clobbered;
    pass ``overwrite`` explicitly to refresh a previous run's table.
    """
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    mean_wl = F.when(
        F.size(words) > 0,
        (F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
         / F.size(words)),
    ).otherwise(F.lit(0.0))
    gated = docs.filter(
        (F.col(cost_col) >= min_chars)
        & (F.col(cost_col) <= max_chars)
        & (mean_wl <= max_mean_word_len)
    )
    if bucketed_table is not None:
        from atiesh_spark.sources.bucketing import write_bucketed

        write_bucketed(gated, bucketed_table, [id_col],
                       num_buckets=num_buckets, sort_cols=[id_col],
                       mode=bucketed_table_mode)
        gated = docs.sparkSession.table(bucketed_table)
    # exact_dedup emits (digest, keep_id, n_dups); the min-id survivors'
    # full rows come back via a LEFT SEMI join on the id — the text
    # column itself never shuffles twice
    keep = exact_dedup(gated, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    # Stage materialization: the deduped survivors feed the budget
    # take's digest pass, the final take, and a report branch —
    # checkpointing runs the quality gate + dedup join exactly once
    # (the "persist the cleaned corpus between stages" discipline every
    # production pipeline applies before multi-pass consumers).
    deduped = gated.join(keep, id_col, "left_semi").localCheckpoint()
    selected = budgeted_take(deduped, lang_col, cost_col, budget=budget,
                             order_col=id_col)

    def per_lang(df: DataFrame, *aggs) -> DataFrame:
        return df.groupBy(lang_col).agg(*aggs)

    report = (
        per_lang(docs, F.count(F.lit(1)).alias("n_candidates"))
        .join(per_lang(gated, F.count(F.lit(1)).alias("n_after_quality")),
              lang_col, "left")
        .join(per_lang(deduped, F.count(F.lit(1)).alias("n_after_dedup")),
              lang_col, "left")
        .join(
            per_lang(
                selected,
                F.count(F.lit(1)).alias("n_selected"),
                F.sum(cost_col).alias("cost_selected"),
            ),
            lang_col,
            "left",
        )
    )
    fill = {c: 0 for c in
            ("n_after_quality", "n_after_dedup", "n_selected", "cost_selected")}
    return report.fillna(fill)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    shards: int = 16,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically by
    md5 order of the row key — the per-domain document cap crawl corpora
    apply so no single site dominates the training mix (C4 and friends
    cap pages per domain for exactly this reason).

    Selection order is ``(md5(key), key)``: an unbiased, reproducible
    "random" cap — NOT recency- or position-biased the way LIMIT-per-file
    sampling is — and the same rows survive on any cluster or engine.

    Plan shape — TWO-PHASE to dodge the hot-domain straggler: a plain
    ``row_number() OVER (PARTITION BY group)`` funnels each group through
    one task, and at 100 TB the hottest domain is millions of pages.
    Phase 1 ranks within ``(group, shard)`` — shard = md5(key) mod
    ``shards`` — and keeps ``cap`` per shard, shrinking every group to
    <= cap * shards rows no matter how hot it was. Phase 2 re-ranks the
    bounded survivors within the group and keeps ``cap``. The result is
    IDENTICAL to the single-window cap (the global top-cap rows in hash
    order are each in their own shard's top-cap), but the heaviest task
    holds cap * shards rows instead of a whole domain.
    """
    from pyspark.sql.window import Window

    from atiesh_spark.functions.hashing import md5_long
    from atiesh_spark.operators.sampling import hash_bucket

    if cap <= 0:
        raise ValueError("cap must be > 0")
    if shards <= 0:
        raise ValueError("shards must be > 0")
    reserved = {"__h", "__shard", "__rk"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input columns collide with reserved names: {sorted(clash)}")

    hashed = df.withColumn(
        "__h", md5_long(F.col(key_col).cast("string"), 15)
    ).withColumn("__shard", hash_bucket(key_col, shards))
    w1 = Window.partitionBy(group_col, "__shard").orderBy("__h", key_col)
    w2 = Window.partitionBy(group_col).orderBy("__h", key_col)
    return (
        hashed.withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= cap)
        .withColumn("__rk", F.row_number().over(w2))
        .filter(F.col("__rk") <= cap)
        .drop("__h", "__shard", "__rk")
    )


def filter_report(
    df: DataFrame,
    id_col: str,
    rules: list[tuple[str, Column]],
) -> DataFrame:
    """Reason-coded filtering: the practical curation artifact is not
    the kept corpus but the ANSWER TO 'why was this document dropped'
    — per-rule accounting is how a pipeline owner debugs a yield drop
    (FineWeb/RefinedWeb publish exactly these tables).

    ``rules`` is an ORDERED list of (name, fails_predicate) — each
    predicate is a Column that is true when the document FAILS that
    rule. Output: one boolean ``fail_<name>`` column per rule, plus
    ``verdict``: the name of the FIRST failing rule in list order, or
    'keep'. NULL predicate results count as failures (a rule that
    cannot evaluate a doc has not passed it — the conservative
    reading, coalesced explicitly so the verdict column is never
    NULL).

    Pure column composition: the predicates come from other operators'
    outputs (gopher_rules, script_profile, exact-dup survivorship...),
    so this adds zero shuffles beyond what the inputs already cost,
    and the whole chain stays ONE declarative plan.
    """
    if not rules:
        raise ValueError("need at least one rule")
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    flags = [
        F.coalesce(pred, F.lit(True)).alias(f"fail_{name}")
        for name, pred in rules
    ]
    out = df.select(F.col(id_col), *flags)
    verdict = F.lit("keep")
    for name in reversed(names):
        verdict = F.when(F.col(f"fail_{name}"), F.lit(name)).otherwise(verdict)
    return out.withColumn("verdict", verdict)
