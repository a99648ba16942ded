"""Temporal near-duplicate detection for animated/video-shaped media:
per-frame perceptual hashes, hashed into time-ordered grams, joined
with the df-capped candidate discipline.

Composition of three existing layers, which is the point — the engine
treats "video dedup" as a pipeline, not a monolith:

1. ``operators/gif.py`` decodes sampled frames (the container walk
   skips non-sampled frames without LZW work);
2. ``operators/imagehash.py`` pHashes each frame (32x32 area
   resample, DCT-II, median threshold — robust to re-encoding);
3. this module turns each document's ordered pHash sequence into
   ``gram``-length temporal fingerprints with a WINDOW ``lead`` +
   ``xxhash64`` — pure DataFrame ops, JVM-side — and recovers
   near-duplicate pairs through a df-capped equi-join.

Scale shape: decode+hash is row-local mapInPandas (frames never leave
the executor; one 8-byte hash per frame survives). The gram stage is
ONE window shuffle on media_id; the pair stage joins docs only where
a gram matches, with ubiquitous grams (title cards, black frames)
dropped by the df-cap — fan-out is bounded by |grams| * max_df²,
never |docs|². Same candidate discipline as the MinHash (q26),
winnowing (q164), image-pHash (q199), and audio-landmark (q202)
paths; temporal order is what the gram adds (a shuffled frame set is
NOT a near-duplicate animation).

Reference parity: the reference engine has no media pipeline (opaque
event bodies only); beyond-reference training-data toolkit.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from atiesh_spark.session import widen_for_python_stage
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FRAME_PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("phash", LongType()),
        StructField("error", StringType()),
    ]
)


def _sampled_luma_frames(blob: bytes, stride: int):
    """[(frame_idx, luma uint8 (h, w)), ...] for every ``stride``-th
    frame, dispatched on container magic: GIF (LZW walk that skips
    non-sampled frames) or AVI (round-9, ``operators/avi.py``
    chunk walk + the baseline-JPEG decoder for MJPEG streams, raw
    DIB frame decode for uncompressed 'DIB ' streams — real video files feed
    the same temporal-dedup pipeline as animations). Raises
    ValueError on malformed/unsupported containers."""
    if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
        from atiesh_spark.operators.avi import (
            _dib_decode_frame,
            _walk_avi_full,
        )
        from atiesh_spark.operators.jpeg import _parse_jpeg

        _usec, _total, cw, ch, frames, codec = _walk_avi_full(blob)
        out = []
        for idx in range(0, len(frames), stride):
            if codec == "rgb":
                px, nc = _dib_decode_frame(frames[idx], cw, ch), 3
            else:
                _w2, _h2, nc, px = _parse_jpeg(frames[idx])
            if nc == 1:
                out.append((idx, px))
            else:
                luma = (
                    px[..., 0].astype(np.int64) * 299
                    + px[..., 1].astype(np.int64) * 587
                    + px[..., 2].astype(np.int64) * 114
                ) // 1000
                out.append((idx, luma.astype(np.uint8)))
        return out

    from atiesh_spark.operators.gif import parse_gif_frames

    out = []
    for idx, _, _, rgb in parse_gif_frames(blob, stride):
        luma = (
            rgb[..., 0].astype(np.int64) * 299
            + rgb[..., 1].astype(np.int64) * 587
            + rgb[..., 2].astype(np.int64) * 114
        ) // 1000
        out.append((idx, luma.astype(np.uint8)))
    return out


def frame_phashes(
    df: DataFrame, id_col: str, blob_col: str, stride: int = 1
) -> DataFrame:
    """(media_id, frame_idx, phash, error): decode every ``stride``-th
    frame — GIF or MJPEG-AVI, dispatched on magic — convert to BT.601
    integer luma, pHash it. Malformed blobs yield one error row (the
    q161/q194/q200 contract)."""
    import pandas as pd

    from atiesh_spark.operators.imagehash import phash_gray

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct

        for pdf in batches:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    if blob is None:
                        raise ValueError("NULL blob")
                    for idx, luma in _sampled_luma_frames(
                        bytes(blob), stride
                    ):
                        out.append((mid, idx, phash_gray(luma), None))
                except (ValueError, struct.error, IndexError,
                        ZeroDivisionError, OverflowError) as exc:
                    out.append((mid, None, None, str(exc)))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "phash", "error"]
            )

    return widen_for_python_stage(
        df.select(F.col(id_col), F.col(blob_col))
    ).mapInPandas(
        gen, schema=FRAME_PHASH_SCHEMA
    )


def temporal_grams(ph: DataFrame, gram: int = 3) -> DataFrame:
    """(media_id, gram_idx, fp_hash): xxhash64 over ``gram``
    consecutive frame pHashes in frame order. One window shuffle on
    media_id; rows lacking ``gram - 1`` successors drop out (a doc
    with fewer than ``gram`` frames contributes no grams)."""
    if gram < 1:
        raise ValueError("gram must be >= 1")
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    cols = [F.col("phash")] + [
        F.lead("phash", i).over(w) for i in range(1, gram)
    ]
    out = (
        ph.filter(F.col("error").isNull())
        .select(
            "media_id",
            F.col("frame_idx").alias("gram_idx"),
            *[c.alias(f"__p{i}") for i, c in enumerate(cols)],
        )
        .dropna(subset=[f"__p{i}" for i in range(gram)])
    )
    return out.select(
        "media_id", "gram_idx",
        F.xxhash64(*[f"__p{i}" for i in range(gram)]).alias("fp_hash"),
    )


def temporal_near_dup_pairs(
    grams: DataFrame,
    min_shared: int = 3,
    max_df: int = 1024,
) -> DataFrame:
    """(id_a, id_b, shared_grams) for documents sharing at least
    ``min_shared`` distinct temporal grams. Grams in more than
    ``max_df`` documents are dropped before the self-join (a black
    frame repeated across a corpus identifies nothing and would
    contribute df² candidates)."""
    keys = grams.select("media_id", "fp_hash").distinct().localCheckpoint()
    # Materialize the narrow gram digest once: the df-cap aggregate and
    # both self-join sides otherwise each re-run the upstream LZW decode
    # + pHash stage (dedup.py:545 discipline).
    rare = (
        keys.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp_hash")
    )
    keyed = keys.join(rare, "fp_hash")
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp_hash") == F.col("b.fp_hash"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_grams"))
        .filter(F.col("shared_grams") >= min_shared)
    )
