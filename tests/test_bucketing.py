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
