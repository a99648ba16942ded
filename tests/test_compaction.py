"""Compaction / file-sizing tests: AQE rebalance actually consolidates
a fragmented write, clustering orders rows within files."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from atiesh_spark.operators.compaction import compact_dataset, write_sized_parquet
from atiesh_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def _parquet_files(path):
    return glob.glob(f"{path}/**/*.parquet", recursive=True)


def test_compaction_consolidates_small_files(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    frag = str(tmp_path / "frag")
    # simulate a streaming sink's small-file explosion: 32 task files
    docs.repartition(32).write.parquet(frag)
    assert len(_parquet_files(frag)) >= 32

    compacted = str(tmp_path / "compact")
    compact_dataset(spark, frag, compacted, target_file_mb=128)
    n_files = len(_parquet_files(compacted))
    assert 1 <= n_files <= 4  # tiny dataset -> AQE coalesces to ~1 file
    # content preserved
    assert spark.read.parquet(compacted).count() == docs.count()


def test_write_sized_with_partitions_and_clustering(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    out = str(tmp_path / "out")
    write_sized_parquet(
        docs, out, target_file_mb=128,
        partition_cols=["lang"], cluster_cols=["n_chars"],
    )
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    for lang in langs:
        files = _parquet_files(f"{out}/lang={lang}")
        assert 1 <= len(files) <= 2  # no per-task explosion inside a partition
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # clustering: rows inside each file are sorted by n_chars
    one_file = _parquet_files(out)[0]
    vals = [r["n_chars"] for r in spark.read.parquet(one_file).collect()]
    assert vals == sorted(vals)


def test_advisory_conf_restored(spark, tmp_path):
    key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    before = spark.conf.get(key, None)
    docs = load_table(spark, SF_SMALL, "documents")
    write_sized_parquet(docs, str(tmp_path / "o2"), target_file_mb=64)
    assert spark.conf.get(key, None) == before


def test_compact_preserves_partition_layout(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    frag = str(tmp_path / "pfrag")
    docs.repartition(8).write.partitionBy("lang").parquet(frag)

    out = str(tmp_path / "pcompact")
    compact_dataset(spark, frag, out, partition_cols=["lang"])
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    for lang in langs:
        assert len(_parquet_files(f"{out}/lang={lang}")) >= 1  # dirs kept
    assert spark.read.parquet(out).count() == docs.count()


def test_export_training_shards_layout_and_manifest(spark, tmp_path):
    import glob
    import os

    from atiesh_spark.operators.compaction import export_training_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}", (i % 7 + 1) * 100) for i in range(200)],
        "doc_id long, text string, n_bytes long",
    )
    out = str(tmp_path / "shards")
    manifest = export_training_shards(
        df, out, "n_bytes", "doc_id", num_shards=4, fmt="json"
    )
    # one directory per shard, all rows round-trip
    dirs = sorted(
        d for d in os.listdir(out) if d.startswith("shard=")
    )
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]
    back = spark.read.json(f"{out}/shard=*")
    assert back.count() == 200
    # manifest persisted and balanced within the serpentine bound
    m = {r["shard"]: r for r in manifest.collect()}
    assert len(m) == 4
    stored = spark.read.parquet(f"{out}/_manifest.parquet")
    assert stored.count() == 4
    weights = [m[s]["total_weight"] for s in sorted(m)]
    assert max(weights) - min(weights) <= 700  # one max-weight row
    import pytest as _pt

    with _pt.raises(ValueError):
        export_training_shards(df, out, "n_bytes", "doc_id", fmt="csvx")
