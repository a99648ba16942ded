"""Perceptual image hashing (pHash) + banded Hamming near-dup join.

Image-level deduplication for multimodal training data: byte-identical
blobs are caught by exact hashing (q24's discipline), but re-encoded /
recompressed copies of the same picture need a PERCEPTUAL fingerprint.
pHash (public algorithm, e.g. Zauner 2010 "Implementation and
Benchmarking of Perceptual Image Hash Functions") is the standard one:

    grayscale -> area-resample to 32x32 -> 2-D DCT-II -> keep the
    top-left 8x8 low-frequency block -> threshold against the median
    (DC excluded) -> 64-bit hash.  Visually-identical images agree on
    nearly all 64 bits; JPEG requantization flips only a few.

Scale shape (the dedup.py discipline, never all-pairs):

- Hashing is row-local inside ``mapInPandas`` over the REAL decoders
  (operators/jpeg.py / png.py / multimodal.py) — pixels never leave
  the executor, corrupt blobs become error ROWS.
- The near-dup join is LSH-banded: a 64-bit hash splits into 4
  16-bit bands; two images are CANDIDATES only if they collide on at
  least one band (pigeonhole: Hamming distance <= 3 guarantees a
  shared band; distance <= 4*t+3 needs t+1 shared bits per band in
  the worst case, so ``bands`` is the recall/cost knob exactly like
  MinHash banding). Candidates verify with one ``bit_count(a ^ b)``
  — JVM codegen, no Python in the join path.
- At 100 TB the candidate join is bounded by band-bucket sizes, and a
  df-cap on pathological buckets (constant images — all-black frames)
  keeps the worst bucket quadratic bounded, same as dedup.py:557's
  rare-shingle cap.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from atiesh_spark.session import widen_for_python_stage
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_N = 32  # resample edge
_K = 8   # low-frequency block edge -> 64-bit hash

#: orthonormal DCT-II matrix for one 32-pixel axis (same construction
#: as jpeg.py's 8x8 _DCT_M, public textbook math)
_DCT32 = np.zeros((_N, _N), dtype=np.float64)
for _k in range(_N):
    _c = np.sqrt(1.0 / _N) if _k == 0 else np.sqrt(2.0 / _N)
    _DCT32[_k] = _c * np.cos((2 * np.arange(_N) + 1) * _k * np.pi / (2 * _N))


def phash_gray(px: np.ndarray) -> int:
    """64-bit pHash of a grayscale (h, w) uint8 array — deterministic,
    pure numpy. RGB callers convert with ITU-R BT.601 luma first."""
    h, w = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    # area-average resample to 32x32: mean over each target cell's
    # source box (edges weighted by fractional overlap via cumsum —
    # exact box filter, deterministic for any input size)
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(px.astype(np.float64), axis=0), axis=1)
    ys = np.linspace(0, h, _N + 1)
    xs = np.linspace(0, w, _N + 1)

    # Fully vectorized bilinear integral-image sampling at the 33x33
    # grid corners, then the 2-D difference gives every cell's box sum.
    # Term structure and evaluation ORDER mirror the original scalar
    # at()/_box() exactly (A + fy*(B-A) + fx*(C-A) + fy*fx*(D-B-C+A);
    # zero fractions contribute an exact +0.0), so hashes are
    # BIT-IDENTICAL to the per-cell loop this replaced — pinned by
    # test_imagehash.py::test_vectorized_matches_scalar_reference.
    yi = ys.astype(np.int64)
    xi = xs.astype(np.int64)
    fy = (ys - yi)[:, None]
    fx = (xs - xi)[None, :]
    yc = np.minimum(yi + 1, h)
    xc = np.minimum(xi + 1, w)
    a = ii[np.ix_(yi, xi)]
    b = ii[np.ix_(yc, xi)]
    c = ii[np.ix_(yi, xc)]
    d = ii[np.ix_(yc, xc)]
    at = a + fy * (b - a)
    at = at + fx * (c - a)
    at = at + (fy * fx) * (d - b - c + a)
    area = np.diff(ys)[:, None] * np.diff(xs)[None, :]
    small = (at[1:, 1:] - at[:-1, 1:] - at[1:, :-1] + at[:-1, :-1]) / area
    dct = _DCT32 @ small @ _DCT32.T
    block = dct[:_K, :_K].flatten()
    med = float(np.median(block[1:]))  # DC excluded from the threshold
    bits = 0
    for b, v in enumerate(block):
        if v > med:
            bits |= 1 << b
    # to signed 64-bit (Spark LongType)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("phash", LongType()),
        StructField("error", StringType()),
    ]
)


def phash_images(
    df: DataFrame, id_col: str, blob_col: str, codec: str = "jpeg"
) -> DataFrame:
    """(media_id, phash, error) for a binary image column, decoding
    with the repo's REAL pure-numpy codecs. Corrupt blobs become
    error rows (the q161/q194 contract). ``codec``: jpeg | png | pnm.
    """
    import pandas as pd

    if codec == "jpeg":
        from atiesh_spark.operators.jpeg import _parse_jpeg as parse
    elif codec == "png":
        from atiesh_spark.operators.png import _parse_png as parse
    elif codec == "pnm":
        from atiesh_spark.operators.multimodal import _parse_netpbm as _pn

        def parse(blob):
            fmt, w, h, arr = _pn(blob)
            return w, h, arr.shape[-1], arr.reshape(
                h, w) if arr.shape[-1] == 1 else arr
    else:
        raise ValueError(f"unknown codec {codec!r}")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import struct

        for pdf in batches:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    if blob is None:
                        raise ValueError("NULL blob")
                    w, h, nc, px = parse(bytes(blob))
                    if px.ndim == 3:
                        px = px[..., :3]
                        # BT.601 luma, rounded like the JPEG encoder
                        px = np.clip(
                            np.floor(
                                0.299 * px[..., 0]
                                + 0.587 * px[..., 1]
                                + 0.114 * px[..., 2]
                                + 0.5
                            ),
                            0,
                            255,
                        ).astype(np.uint8)
                    out.append((mid, phash_gray(px), None))
                except (ValueError, struct.error, IndexError,
                        ZeroDivisionError, OverflowError) as exc:
                    out.append((mid, None, str(exc)))
            yield pd.DataFrame(out, columns=["media_id", "phash", "error"])

    return widen_for_python_stage(
        df.select(F.col(id_col), F.col(blob_col))
    ).mapInPandas(
        gen, schema=PHASH_SCHEMA
    )


def near_dup_pairs_by_phash(
    hashes: DataFrame,
    max_distance: int = 0,
    bands: int = 4,
    max_bucket: int = 2000,
) -> DataFrame:
    """(id_a, id_b, distance) pairs with Hamming(phash) <= max_distance.

    LSH-banded candidate generation: ``bands`` equal bit-slices of the
    64-bit hash; a pair is a candidate iff it shares >= 1 band value
    (guaranteed for distance < bands by pigeonhole). The equi-join on
    (band_idx, band_val) is the only shuffle; verification is one
    codegen ``bit_count`` per candidate. ``max_bucket`` drops
    degenerate buckets (e.g. thousands of all-black thumbnails share
    every band) before the self-join, bounding the worst bucket at
    max_bucket^2 — the same df-cap discipline as the MinHash and
    winnowing paths.
    """
    if not 1 <= bands <= 64 or 64 % bands:
        raise ValueError("bands must divide 64")
    if max_distance >= bands:
        raise ValueError(
            f"banded recall guarantee needs max_distance < bands "
            f"({max_distance} >= {bands}); raise bands or verify exactly"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    h = hashes.filter(F.col("phash").isNotNull()).select(
        "media_id", "phash"
    ).localCheckpoint()  # bucket sizing and BOTH self-join sides read
    # this; unmaterialized, each re-runs the JPEG decode + DCT upstream.
    # (id, int64) rows only — tiny next to the blobs (dedup.py:545).
    banded = h.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        (
                            F.shiftrightunsigned(F.col("phash"), i * width)
                            .bitwiseAND(F.lit(mask))
                        ).alias("band_val"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bv"),
    ).select("media_id", "phash", "bv.band_idx", "bv.band_val")
    sizes = banded.groupBy("band_idx", "band_val").agg(
        F.count(F.lit(1)).alias("__n")
    )
    banded = banded.join(
        sizes.filter(F.col("__n") <= max_bucket), ["band_idx", "band_val"]
    ).drop("__n")
    a = banded.select(
        "band_idx", "band_val",
        F.col("media_id").alias("id_a"), F.col("phash").alias("ha"),
    )
    b = banded.select(
        "band_idx", "band_val",
        F.col("media_id").alias("id_b"), F.col("phash").alias("hb"),
    )
    pairs = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(
                F.col("ha").bitwiseXOR(F.col("hb"))
            ).cast("int").alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
        .distinct()
    )
    return pairs
