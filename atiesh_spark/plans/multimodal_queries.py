"""Multimodal pipeline queries.

These exercise the binary-column plumbing (Arrow-batched Pandas UDFs,
mapInPandas fan-out) end-to-end on driver testdata. The decode stage is
Python-side, but every stub output is derived from engine-independent
primitives (sha256, byte histograms), so each query has a full DuckDB
oracle: the registered projections stringify/scale the array outputs
(the driver's canonicalizer requires scalar cells), while the operators
themselves keep returning real arrays for library use.
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


def _hex_of_int_array(col: str) -> F.Column:
    """array<int of 0..255> -> lowercase hex string (canonicalizer-safe)."""
    return F.concat_ws(
        "", F.transform(col, lambda x: F.lpad(F.lower(F.hex(x)), 2, "0"))
    )


@register(
    "q38_media_features",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id,
               regexp_replace(hex(encode(text)), '(.).', '\\1', 'g') AS nib,
               greatest(octet_length(encode(text)), 1) AS len
        FROM documents
    )
    SELECT media_id,
           list_aggregate(list_transform(generate_series(0, 15), h ->
               CAST(CAST(round(CAST(CAST(CAST(length(nib) - length(replace(nib, substring('0123456789ABCDEF', h + 1, 1), '')) AS DOUBLE) / len AS REAL) AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)
           ), 'string_agg', ',') AS hist_ppm
    FROM m
    """,
    doc="Binary->vector featurization (Arrow pandas UDF): normalized "
    "16-bin byte histogram per blob — the plan shape of any media "
    "embedder. Registered projection scales each float32 bin to ppm and "
    "joins to CSV so the driver canonicalizer (scalar cells only) can "
    "hash it; the oracle rebuilds the histogram from the hex dump of the "
    "UTF-8 bytes (odd hex chars = high nibbles).",
)
def q38_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_table(spark, sf_dir)
    feats = media.select(
        "media_id", byte_histogram_features("blob").alias("features")
    )
    # float32 bin -> double -> ppm; identical promotion on the DuckDB side
    ppm = F.transform(
        "features",
        lambda x: F.round(x.cast("double") * F.lit(1000000.0)).cast("long").cast("string"),
    )
    return feats.select("media_id", F.concat_ws(",", ppm).alias("hist_ppm"))


@register(
    "q39_media_decode",
    oracle="""
    SELECT doc_id AS media_id,
           8 AS width, 8 AS height, 'FAKE' AS mode,
           substring(sha256(text), 1, 32) AS pixels_hex
    FROM documents
    """,
    doc="Media decode via mapInPandas (stubbed codec, real batch shapes). "
    "The stub derives pixels from sha256(blob), so the oracle recomputes "
    "them with DuckDB's sha256 over the same UTF-8 text; the registered "
    "projection hex-encodes the pixel array (canonicalizer-safe).",
)
def q39_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = decode_media(_media_table(spark, sf_dir), "media_id", "blob")
    return decoded.select(
        "media_id", "width", "height", "mode",
        _hex_of_int_array("pixels_sample").alias("pixels_hex"),
    )


@register(
    "q40_frame_sample",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id, text,
               least(greatest((n_chars * 10) // 1000, 1), 8) AS n
        FROM documents
    )
    SELECT media_id,
           CAST(i AS INT) AS frame_idx,
           CAST(i * 1000 AS BIGINT) AS ts_ms,
           sha256(text || ':' || CAST(i AS VARCHAR)) AS frame_hex
    FROM (SELECT media_id, text, unnest(generate_series(0, n - 1)) AS i FROM m)
    """,
    doc="Video frame sampling: metadata-driven fan-out (one row per "
    "sampled frame, capped at 8) via mapInPandas. Frame payload stub is "
    "sha256(blob ':' idx), so the oracle reproduces both the fan-out "
    "arithmetic and the payload bytes; frame_blob is hex-projected for "
    "the canonicalizer.",
)
def q40_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_frames(
        _media_table(spark, sf_dir), "media_id", "blob", "duration_ms",
        every_ms=1000, max_frames=8,
    )
    return frames.select(
        "media_id", "frame_idx", "ts_ms",
        F.lower(F.hex("frame_blob")).alias("frame_hex"),
    )
