"""Skew utilities + exactly-once sink tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from atiesh_spark.operators.skew import salted_aggregate, salted_broadcast_join
from atiesh_spark.streaming.sinks import idempotent_parquet_writer


def skewed_df(spark):
    # one hot key (90%), several cold keys
    hot = spark.range(900).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    cold = spark.range(100).select(
        F.concat(F.lit("c"), (F.col("id") % 10).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.union(cold)


def test_salted_aggregate_matches_plain(spark):
    df = skewed_df(spark)
    plain = {
        (r["k"]): (r["cnt"], r["total"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("total"))
        .collect()
    }
    salted = {
        (r["k"]): (r["cnt"], r["total"])
        for r in salted_aggregate(
            df,
            ["k"],
            partial_aggs={"pc": F.count(F.lit(1)), "ps": F.sum("v")},
            merge_aggs={"cnt": F.sum("pc"), "total": F.sum("ps")},
            buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_broadcast_join_matches_plain(spark):
    fact = skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"c{i}", f"C{i}") for i in range(10)], "k string, label string"
    )
    plain = sorted((r["k"], r["v"], r["label"]) for r in fact.join(dim, "k").collect())
    salted = sorted(
        (r["k"], r["v"], r["label"])
        for r in salted_broadcast_join(fact, dim, "k", buckets=4).collect()
    )
    assert salted == plain
    assert len(salted) == 1000


def test_idempotent_parquet_replay(spark, tmp_path):
    out = str(tmp_path / "out")
    w = idempotent_parquet_writer(out)
    df1 = spark.createDataFrame([("a",), ("b",)], "value string")
    w(df1, 0)
    # replay of batch 0 (e.g. failure before checkpoint commit): same
    # batch re-delivered must not duplicate
    w(df1, 0)
    w(spark.createDataFrame([("c",)], "value string"), 1)
    rows = sorted(r["value"] for r in spark.read.parquet(out).collect())
    assert rows == ["a", "b", "c"]


def test_salted_join_rejects_dim_preserving_how(spark):
    import pytest

    fact = spark.createDataFrame([("k1", 1)], "k string, v int")
    dim = spark.createDataFrame([("k1", "x")], "k string, label string")
    with pytest.raises(ValueError, match="fact-preserving joins only"):
        salted_broadcast_join(fact, dim, "k", how="full")
