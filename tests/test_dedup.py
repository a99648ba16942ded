

def test_dedup_savings_report_accounting(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from atiesh_spark.operators.dedup import dedup_savings_report

    # clusters: {1,2,3} -> survivor 1; {10,11} -> survivor 10; {20} alone
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)],
        "doc_id long, cluster_id long",
    )
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "bbbbbb"), (3, "cc"), (10, "ddddd"),
         (11, "e"), (20, "ffffffff")],
        "doc_id long, text string",
    )
    got = {r["cluster_size"]: r for r in dedup_savings_report(
        clusters, docs, "doc_id", "text").collect()}
    assert got[3]["n_clusters"] == 1 and got[3]["n_removable"] == 2
    assert got[3]["removable_bytes"] == 6 + 2  # docs 2 and 3; survivor 1 kept
    assert got[2]["removable_bytes"] == 1      # doc 11; survivor 10 kept
    assert got[1]["n_removable"] == 0 and got[1]["removable_bytes"] == 0
    # totals reconstruct the corpus
    assert sum(r["n_docs"] for r in got.values()) == 6
