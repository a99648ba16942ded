"""Format-stamping contract of the versioned parquet store (round 14).

The hazard (r13 postmortem): the md5-hex -> md5_long MinHash migration
means band signatures from the two families NEVER collide, so an
incremental dedup pipeline joining a pre-migration store keeps running
while silently finding zero duplicates — the worst failure shape for
dedup state. The stamp turns that into a loud load-time error, for
every signature-bearing maintenance loop.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from atiesh_spark.sources.versioned import StoreFormatError, VersionedStore


def _df(spark, n=10):
    return spark.range(n).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("sig")
    )


def test_fresh_store_stamps_and_roundtrips(spark, tmp_path):
    store = VersionedStore(str(tmp_path / "s"), format_tag="fam/v1")
    store.write(_df(spark), 0)
    assert store.stored_format(spark) == "fam/v1"
    assert store.read(spark).count() == 10
    # same-tag reopen (a restarted loop) keeps working
    again = VersionedStore(str(tmp_path / "s"), format_tag="fam/v1")
    assert again.read_before(spark, 5).count() == 10
    again.write(_df(spark, 3), 1)
    assert again.read(spark).count() == 3


def test_mismatched_tag_refuses_read_and_write(spark, tmp_path):
    old = VersionedStore(str(tmp_path / "s"), format_tag="fam/v1")
    old.write(_df(spark), 0)
    new = VersionedStore(str(tmp_path / "s"), format_tag="fam/v2")
    with pytest.raises(StoreFormatError, match="fam/v1"):
        new.read(spark)
    with pytest.raises(StoreFormatError, match="fam/v2"):
        new.read_before(spark, 9)
    with pytest.raises(StoreFormatError):
        new.write(_df(spark), 1)
    # the old state is untouched by the refused open
    assert old.read(spark).count() == 10


def test_legacy_unstamped_store_refused_by_tagged_reader(spark, tmp_path):
    """A non-empty store WITHOUT a marker is exactly the pre-migration
    case — absence of the stamp must refuse, not pass."""
    legacy = VersionedStore(str(tmp_path / "s"))  # pre-r14 writer
    legacy.write(_df(spark), 0)
    tagged = VersionedStore(str(tmp_path / "s"), format_tag="fam/v2")
    with pytest.raises(StoreFormatError, match="no _FORMAT stamp"):
        tagged.read(spark)
    with pytest.raises(StoreFormatError):
        tagged.write(_df(spark), 1)
    # untagged opens still work (back-compat for format-free stores)
    assert legacy.read(spark).count() == 10


def test_empty_store_never_raises(spark, tmp_path):
    store = VersionedStore(str(tmp_path / "s"), format_tag="fam/v1")
    assert store.read_before(spark, 3) is None
    with pytest.raises(FileNotFoundError):
        store.read(spark)


def test_ann_index_refuses_resized_store(spark, tmp_path):
    """Maintenance-loop level: reopening a hyperplane index under a
    different signature WIDTH must raise, not quietly maintain buckets
    that can never collide with the stored ones."""
    from atiesh_spark.operators.similarity import StreamingAnnIndex

    vecs = spark.range(20).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1)).cast("double") for i in range(4)]).alias(
            "embedding"
        ),
    )
    path = str(tmp_path / "ann")
    idx8 = StreamingAnnIndex(path, num_planes=8)
    idx8(vecs, 0)
    assert idx8.read(spark).count() == 20

    idx16 = StreamingAnnIndex(path, num_planes=16)
    with pytest.raises(StoreFormatError, match="p8"):
        idx16(vecs, 1)
    with pytest.raises(StoreFormatError):
        idx16.read(spark)
    # the matching width still opens fine
    assert StreamingAnnIndex(path, num_planes=8).read(spark).count() == 20


def test_winnow_index_refuses_pre_stamp_store(spark, tmp_path):
    """Simulated pre-r13 store: fingerprint-shaped rows persisted by an
    untagged writer. The loop must raise on its next batch instead of
    anti-joining/matching against a different hash family's rows."""
    from atiesh_spark.operators.textstats import StreamingWinnowIndex

    path = str(tmp_path / "winnow")
    legacy_rows = spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("fp_pos"),
        F.col("id").alias("fp_hash"),
    )
    VersionedStore(path).write(legacy_rows, 0)

    docs = spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text body "), F.col("id").cast("string")).alias("text"),
    )
    idx = StreamingWinnowIndex(path, "doc_id", "text", k=5, w=4)
    with pytest.raises(StoreFormatError, match="no _FORMAT stamp"):
        idx(docs, 1)
    # and a parameter change against a stamped store is equally loud
    path2 = str(tmp_path / "winnow2")
    StreamingWinnowIndex(path2, "doc_id", "text", k=5, w=4)(docs, 0)
    with pytest.raises(StoreFormatError, match="k5w4"):
        StreamingWinnowIndex(path2, "doc_id", "text", k=7, w=4)(docs, 1)
