"""Multimodal pipeline queries (rows-only checked).

These exercise the binary-column plumbing (Arrow-batched Pandas UDFs,
mapInPandas fan-out) end-to-end on driver testdata. No SQL oracle: the
decode stage is Python-side by design (DuckDB has no equivalent), so the
driver records the weaker rows-only check — stated, not hidden.
Media blobs are synthesized from documents.text bytes (the container
ships no real media; see operators/multimodal.py for the stub contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atiesh_spark.operators.multimodal import (
    byte_histogram_features,
    decode_media,
    sample_frames,
)
from atiesh_spark.plans.registry import register
from atiesh_spark.sources.tables import load_table


def _media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> media-shaped table: blob + duration metadata."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("blob"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )


@register(
    "q38_media_features",
    oracle=None,
    doc="Binary->vector featurization (Arrow pandas UDF): normalized "
    "16-bin byte histogram per blob — the plan shape of any media "
    "embedder. Rows-only check (Python-side by design).",
)
def q38_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_table(spark, sf_dir)
    return media.select("media_id", byte_histogram_features("blob").alias("features"))


@register(
    "q39_media_decode",
    oracle=None,
    doc="Media decode via mapInPandas (stubbed codec, real batch shapes). "
    "Rows-only check.",
)
def q39_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_media(_media_table(spark, sf_dir), "media_id", "blob")


@register(
    "q40_frame_sample",
    oracle=None,
    doc="Video frame sampling: metadata-driven fan-out (one row per "
    "sampled frame, capped) via mapInPandas. Rows-only check.",
)
def q40_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(
        _media_table(spark, sf_dir), "media_id", "blob", "duration_ms",
        every_ms=1000, max_frames=8,
    )
