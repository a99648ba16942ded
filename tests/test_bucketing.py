"""Bucketed-join test: co-located joins must plan without exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from atiesh_spark.sources.bucketing import read_table, write_bucketed
from atiesh_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    # managed tables land in the session's default warehouse dir
    # (warehouse.dir is a static conf); DROP TABLE below cleans up
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], num_buckets=8,
                   sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem, "lineitem_b", ["l_orderkey"], num_buckets=8,
        sort_cols=["l_orderkey"],
    )
    try:
        # disable broadcast so the join strategy is genuinely sort-merge
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, "orders_b").join(
            read_table(spark, "lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "simple"
        )
        assert "SortMergeJoin" in plan
        # bucketed both sides at matching bucket counts: no shuffle at all
        assert "Exchange hashpartitioning" not in plan

        # and the result is right
        n = joined.count()
        plain = orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        ).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_curation_bucketed_corpus_semi_join_no_corpus_exchange(spark):
    """curate_corpus(bucketed_table=...): the dedup survivor semi join
    must plan with NO exchange on the corpus side — only the narrow
    keep-id keys shuffle into the buckets (the 100-TB path; the default
    ad-hoc call accepts one corpus-width shuffle as its floor)."""
    from atiesh_spark.operators.curation import curate_corpus
    from atiesh_spark.operators.dedup import exact_dedup

    docs = load_table(spark, SF_SMALL, "documents")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        report = curate_corpus(docs, bucketed_table="corpus_b",
                               num_buckets=8)
        # the composite's report must be unchanged by the layout choice
        plain = curate_corpus(docs)
        canon = lambda df: sorted(map(tuple, df.collect()))
        assert canon(report) == canon(plain)

        # plan check on the survivor semi join over the bucketed table
        gated = read_table(spark, "corpus_b")
        keep = exact_dedup(gated, "doc_id", "text").select(
            F.col("keep_id").alias("doc_id")
        )
        deduped = gated.join(keep, "doc_id", "left_semi")
        plan = deduped._sc._jvm.PythonSQLUtils.explainString(
            deduped._jdf.queryExecution(), "simple"
        )
        assert "SortMergeJoin" in plan and "Bucketed: true" in plan
        # the corpus branch (the left ':-' spine of the semi join) must
        # contain NO exchange — it reads the buckets and sorts locally;
        # the keys side keeps its digest groupBy exchange plus the
        # narrow shuffle INTO the buckets
        corpus_branch = [
            ln for ln in plan.splitlines() if ln.lstrip().startswith(":")
        ]
        assert corpus_branch, plan
        assert not any("Exchange" in ln for ln in corpus_branch), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS corpus_b")


def test_curation_bucketed_table_mode_never_silently_clobbers(spark):
    """ADVICE r12: the eager bucketed write defaults to errorifexists —
    a pre-existing table with the same name must not be overwritten
    unless the caller passes mode='overwrite' explicitly."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException

    from atiesh_spark.operators.curation import curate_corpus

    docs = spark.createDataFrame(
        [(i, "some document text here", "en", 23) for i in range(6)],
        "doc_id int, text string, lang string, n_chars int",
    )
    try:
        curate_corpus(docs, bucketed_table="curation_mode_b", num_buckets=2)
        with pytest.raises((AnalysisException, Py4JJavaError)):
            curate_corpus(docs, bucketed_table="curation_mode_b",
                          num_buckets=2)
        # explicit overwrite refreshes the table
        report = curate_corpus(docs, bucketed_table="curation_mode_b",
                               num_buckets=2,
                               bucketed_table_mode="overwrite")
        assert report.count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS curation_mode_b")
