"""Temporal near-dup tests: frame pHash extraction through the GIF
path (grayscale palette makes luma exact), gram windowing semantics
(order matters, short docs drop out), planted-pair recovery, the
df-cap, and the distinctness pin for the q204 planting."""

import numpy as np
import pytest

from atiesh_spark.operators.gif import encode_gif
from atiesh_spark.operators.imagehash import phash_gray
from atiesh_spark.operators.video import (
    frame_phashes,
    temporal_grams,
    temporal_near_dup_pairs,
)

GRAY_PAL = np.stack([np.arange(256)] * 3, axis=-1).astype(np.uint8)


def _noise_frame(s: int, f: int) -> np.ndarray:
    n = np.arange(32 * 32, dtype=np.int64)
    return (
        (n * (2654435761 + s * 101 + f * 137) + s * s * 1013
         + f * f * 2027 + s * f * 7919) % 251 % 256
    ).reshape(32, 32).astype(np.uint8)


def _gif_for_seed(s: int, n_frames: int = 6) -> bytes:
    return encode_gif([_noise_frame(s, f) for f in range(n_frames)],
                      GRAY_PAL)


def test_frame_phashes_match_direct_hash(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_gif_for_seed(5, 3)))], "media_id long, blob binary"
    )
    rows = sorted(frame_phashes(df, "media_id", "blob").collect(),
                  key=lambda r: r.frame_idx)
    # identity-gray palette => luma == planted index array exactly
    for f, r in enumerate(rows):
        assert r.phash == phash_gray(_noise_frame(5, f))
        assert r.error is None


def test_frame_phashes_error_row(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"GIF89a trash"))], "media_id long, blob binary"
    )
    [r] = frame_phashes(df, "media_id", "blob").collect()
    assert r.error is not None and r.phash is None


def test_temporal_grams_order_sensitive(spark):
    """Same frame multiset, different order => disjoint grams."""
    ph = spark.createDataFrame(
        [(1, 0, 111, None), (1, 1, 222, None), (1, 2, 333, None),
         (2, 0, 333, None), (2, 1, 222, None), (2, 2, 111, None)],
        "media_id long, frame_idx int, phash long, error string",
    )
    g = temporal_grams(ph, gram=3)
    rows = g.collect()
    assert len(rows) == 2  # one gram per doc
    assert rows[0].fp_hash != rows[1].fp_hash or (
        rows[0].media_id == rows[1].media_id
    )
    fp = {r.media_id: r.fp_hash for r in rows}
    assert fp[1] != fp[2]


def test_short_docs_contribute_no_grams(spark):
    ph = spark.createDataFrame(
        [(1, 0, 11, None), (1, 1, 22, None)],
        "media_id long, frame_idx int, phash long, error string",
    )
    assert temporal_grams(ph, gram=3).count() == 0


def test_planted_pairs_recovered_end_to_end(spark):
    """Docs 0..5, seed = doc % 3: within-seed GIFs byte-identical."""
    rows = [(d, bytearray(_gif_for_seed(d % 3))) for d in range(6)]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    ph = frame_phashes(df, "media_id", "blob")
    pairs = {
        (r.id_a, r.id_b): r.shared_grams
        for r in temporal_near_dup_pairs(
            temporal_grams(ph, gram=3), min_shared=3
        ).collect()
    }
    assert pairs == {(0, 3): 4, (1, 4): 4, (2, 5): 4}


def test_df_cap_drops_ubiquitous_gram(spark):
    ph = spark.createDataFrame(
        [(d, f, 999, None) for d in range(5) for f in range(3)],
        "media_id long, frame_idx int, phash long, error string",
    )
    g = temporal_grams(ph, gram=3)  # every doc: the same single gram
    assert temporal_near_dup_pairs(g, min_shared=1, max_df=4).count() == 0
    assert temporal_near_dup_pairs(g, min_shared=1, max_df=5).count() == 10


def test_planted_seed_phashes_pairwise_distinct():
    """Pins the q204 planting: all 43 seeds x 6 frames hash distinct,
    so cross-seed docs share zero grams and within-seed docs share
    exactly n_frames - gram + 1."""
    hs = [phash_gray(_noise_frame(s, f))
          for s in range(43) for f in range(6)]
    assert len(set(hs)) == len(hs)


def test_temporal_dedup_over_mjpeg_avi(spark):
    """Round 9: the temporal-dedup pipeline accepts REAL video
    containers — two MJPEG AVIs with the same frame sequence pair up
    through frame_phashes -> temporal_grams -> temporal_near_dup_pairs,
    a third with different content does not."""
    import numpy as np

    from atiesh_spark.operators.avi import encode_avi_mjpeg
    from atiesh_spark.operators.jpeg import encode_jpeg_baseline
    from atiesh_spark.operators.video import (
        frame_phashes,
        temporal_grams,
        temporal_near_dup_pairs,
    )

    def mk(seed: int) -> bytes:
        frames = []
        for f in range(4):
            y, x = np.mgrid[0:32, 0:48]
            px = ((x * (f + 2) + y * seed) % 256).astype(np.uint8)
            frames.append(encode_jpeg_baseline(px, quality=90))
        return encode_avi_mjpeg(frames, 48, 32, fps=10)

    df = spark.createDataFrame(
        [(1, bytearray(mk(3))), (2, bytearray(mk(3))),
         (3, bytearray(mk(17)))],
        "media_id long, blob binary",
    )
    ph = frame_phashes(df, "media_id", "blob")
    rows = ph.collect()
    assert all(r.error is None for r in rows)
    assert len(rows) == 12  # 3 videos x 4 frames
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.media_id, {})[r.frame_idx] = r.phash
    assert by_vid[1] == by_vid[2]  # identical content, identical hashes
    assert by_vid[1] != by_vid[3]  # guard: content actually differs
    pairs = temporal_near_dup_pairs(
        temporal_grams(ph, gram=3), min_shared=2
    ).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
