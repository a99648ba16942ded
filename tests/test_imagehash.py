"""pHash + banded Hamming near-dup tests: determinism, perceptual
robustness to JPEG requantization, banded-join correctness against a
brute-force reference, bucket capping, and error-row behavior."""

from __future__ import annotations

import numpy as np
import pytest

from atiesh_spark.operators.imagehash import (
    near_dup_pairs_by_phash,
    phash_gray,
    phash_images,
)
from atiesh_spark.operators.jpeg import _parse_jpeg, encode_jpeg_baseline


def _noise(seed: int, n: int = 32) -> np.ndarray:
    return (
        (np.arange(n * n, dtype=np.int64) * (2654435761 + seed * 97)
         + seed * seed * 1013) % 251 % 256
    ).reshape(n, n).astype(np.uint8)


def test_phash_deterministic_and_size_invariant_structure():
    a = _noise(3)
    assert phash_gray(a) == phash_gray(a.copy())
    # a visually identical upscale stays close (area resample): nearest-
    # neighbor 2x duplication preserves every 32x32 cell mean exactly
    big = np.repeat(np.repeat(a, 2, axis=0), 2, axis=1)
    assert phash_gray(big) == phash_gray(a)


def test_phash_recompression_distance_small_distinct_images_far():
    px = _noise(7, 48)
    _, _, _, d100 = _parse_jpeg(encode_jpeg_baseline(px, quality=100))
    _, _, _, d85 = _parse_jpeg(encode_jpeg_baseline(px, quality=85))
    ham = bin((phash_gray(d100) ^ phash_gray(d85)) & ((1 << 64) - 1)).count("1")
    assert ham <= 6  # requantized copy stays near

    other = _noise(8, 48)
    far = bin((phash_gray(px) ^ phash_gray(other)) & ((1 << 64) - 1)).count("1")
    assert far > 10  # unrelated noise is far


def test_seeds_used_by_q199_are_pairwise_distinct():
    hs = {phash_gray(_noise(s)) for s in range(97)}
    assert len(hs) == 97


def test_banded_join_matches_bruteforce_within_guarantee(spark):
    """Every pair at distance < bands MUST be found (pigeonhole);
    verify against brute force on a small planted set."""
    base = phash_gray(_noise(1))
    rows = []
    for i in range(12):
        h = base ^ sum(1 << (5 * j + i) for j in range(i % 4))  # flip 0-3 bits
        rows.append((i, h - (1 << 64) if h >= (1 << 63) else h))
    hashes = spark.createDataFrame(rows, "media_id long, phash long")
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in near_dup_pairs_by_phash(hashes, max_distance=3, bands=4).collect()
    }
    expect = {}
    for i, (ia, ha) in enumerate(rows):
        for ib, hb in rows[i + 1 :]:
            d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                expect[(ia, ib)] = d
    assert got == expect


def test_bucket_cap_and_validation(spark):
    rows = [(i, 0) for i in range(10)]  # all-identical hashes: 1 bucket
    hashes = spark.createDataFrame(rows, "media_id long, phash long")
    assert near_dup_pairs_by_phash(hashes, 0, 4).count() == 45
    assert near_dup_pairs_by_phash(hashes, 0, 4, max_bucket=5).count() == 0

    with pytest.raises(ValueError):
        near_dup_pairs_by_phash(hashes, max_distance=4, bands=4)
    with pytest.raises(ValueError):
        near_dup_pairs_by_phash(hashes, 0, bands=5)


def test_phash_images_error_rows_and_rgb_luma(spark):
    px = _noise(5)
    good = encode_jpeg_baseline(px, quality=100)
    rgb = np.stack([px, px, px], axis=-1)
    rgb_blob = encode_jpeg_baseline(rgb, quality=100)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"\x00bad")), (3, None),
         (4, bytearray(rgb_blob))],
        "media_id long, blob binary",
    )
    got = {r["media_id"]: r for r in
           phash_images(df, "media_id", "blob").collect()}
    assert got[1]["error"] is None and got[1]["phash"] is not None
    assert got[2]["error"] is not None and got[2]["phash"] is None
    assert got[3]["error"] == "NULL blob"
    # gray-in-RGB decodes to (r=g=b); luma == gray channel, hashes agree
    assert got[4]["phash"] is not None
    with pytest.raises(ValueError):
        phash_images(df, "media_id", "blob", codec="webp")


def test_vectorized_matches_scalar_reference():
    """The vectorized area-resample must be BIT-identical to the
    original per-cell loop (same term structure and float op order) —
    a drift here would silently shift every stored pHash."""
    import numpy as np

    from atiesh_spark.operators.imagehash import _DCT32, _K, _N, phash_gray

    def reference(px):
        h, w = px.shape
        ii = np.zeros((h + 1, w + 1), dtype=np.float64)
        ii[1:, 1:] = np.cumsum(
            np.cumsum(px.astype(np.float64), axis=0), axis=1
        )
        ys = np.linspace(0, h, _N + 1)
        xs = np.linspace(0, w, _N + 1)

        def at(y, x):
            yi, xi = int(y), int(x)
            fy, fx = y - yi, x - xi
            v = ii[yi, xi]
            if fy:
                v += fy * (ii[min(yi + 1, h), xi] - ii[yi, xi])
            if fx:
                v += fx * (ii[yi, min(xi + 1, w)] - ii[yi, xi])
            if fy and fx:
                v += fy * fx * (
                    ii[min(yi + 1, h), min(xi + 1, w)]
                    - ii[min(yi + 1, h), xi]
                    - ii[yi, min(xi + 1, w)]
                    + ii[yi, xi]
                )
            return v

        def box(y0, y1, x0, x1):
            return at(y1, x1) - at(y0, x1) - at(y1, x0) + at(y0, x0)

        small = np.empty((_N, _N), dtype=np.float64)
        for i in range(_N):
            for j in range(_N):
                area = (ys[i + 1] - ys[i]) * (xs[j + 1] - xs[j])
                small[i, j] = box(ys[i], ys[i + 1], xs[j], xs[j + 1]) / area
        dct = _DCT32 @ small @ _DCT32.T
        block = dct[:_K, :_K].flatten()
        med = float(np.median(block[1:]))
        bits = 0
        for bpos, v in enumerate(block):
            if v > med:
                bits |= 1 << bpos
        return bits - (1 << 64) if bits >= (1 << 63) else bits

    rng = np.random.default_rng(3)
    for h, w in [(32, 32), (17, 23), (64, 48), (5, 200), (200, 5), (1, 1)]:
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        assert phash_gray(px) == reference(px), (h, w)
