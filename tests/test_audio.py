"""Spectral-feature and audio-fingerprint tests: exact-bin tones land
their energy in ONE rfft bin (peak and centroid recover the planted
frequency), normalized RMS matches A/sqrt(2) through PCM16
quantization, landmark grams are bit-deterministic, the near-dup join
recovers exactly the planted duplicate pairs, and malformed blobs
become error rows."""

import numpy as np
import pytest

from atiesh_spark.operators.audio import (
    _window_spectra,
    _windows,
    audio_fingerprint,
    audio_near_dup_pairs,
    spectral_features,
)
from atiesh_spark.operators.multimodal import encode_wav

FRAME = 256


def _tone_pcm(bins, amp=0.5, frame=FRAME) -> bytes:
    """Concatenated windows, window w a pure sine at bin bins[w]; the
    half-sample phase offset keeps every sample strictly nonzero."""
    i = np.arange(frame)
    parts = [
        amp * np.sin(2 * np.pi * b * (i + 0.5) / frame) for b in bins
    ]
    x = np.concatenate(parts)
    return np.round(32767 * x).astype("<i2").tobytes()


def test_windows_shape_and_tail_drop():
    c0 = np.arange(1000, dtype=np.int16)
    w = _windows(c0, 256, 256)
    assert w.shape == (3, 256)  # 1000 // 256 = 3 full, tail dropped
    assert np.array_equal(w[2], c0[512:768])
    assert _windows(np.arange(100, dtype=np.int16), 256, 256).shape[0] == 0


def test_exact_bin_tone_peak_and_centroid():
    bins = [5, 40, 120]
    pcm = np.frombuffer(_tone_pcm(bins), dtype="<i2")
    peak, centroid = _window_spectra(_windows(pcm, FRAME, FRAME))
    assert list(peak) == bins
    assert np.allclose(centroid, bins, atol=1e-3)


def test_spectral_features_operator(spark):
    bins = [7, 23]
    amp = 0.625
    blob = encode_wav(8000, _tone_pcm(bins, amp=amp))
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"RIFFxxxxJUNK"))],
        "media_id long, blob binary",
    )
    rows = {
        (r.media_id, r.window_idx): r
        for r in spectral_features(df, "media_id", "blob").collect()
    }
    for w, b in enumerate(bins):
        r = rows[(1, w)]
        assert r.peak_bin == b
        assert r.centroid == pytest.approx(b, abs=1e-3)
        assert r.rms == pytest.approx(amp / np.sqrt(2), abs=1e-3)
        assert r.error is None
    assert rows[(2, None)].error is not None


def test_stereo_uses_channel_zero(spark):
    tone = np.frombuffer(_tone_pcm([11]), dtype="<i2")
    noise = np.full_like(tone, 12345)
    inter = np.empty(2 * tone.size, dtype="<i2")
    inter[0::2], inter[1::2] = tone, noise
    blob = encode_wav(8000, inter.tobytes(), channels=2)
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "media_id long, blob binary")
    [r] = spectral_features(df, "media_id", "blob").collect()
    assert r.peak_bin == 11


def test_fingerprint_packing_deterministic(spark):
    bins = [10, 20, 30, 40, 50]
    blob = encode_wav(8000, _tone_pcm(bins))
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "media_id long, blob binary")
    rows = sorted(
        audio_fingerprint(df, "media_id", "blob", gram=3).collect(),
        key=lambda r: r.gram_idx,
    )
    assert [r.gram_idx for r in rows] == [0, 1, 2]
    for r, g in zip(rows, range(3)):
        expect = bins[g] | bins[g + 1] << 8 | bins[g + 2] << 16
        assert r.fp_hash == expect


def test_fingerprint_too_short_is_error_row(spark):
    blob = encode_wav(8000, _tone_pcm([9]))  # one window < gram=3
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "media_id long, blob binary")
    [r] = audio_fingerprint(df, "media_id", "blob", gram=3).collect()
    assert r.error is not None and r.fp_hash is None


def test_near_dup_recovers_planted_pairs(spark):
    """Docs 0..5 with seed = doc % 3: within-seed pairs share all 8
    grams, cross-seed tone sequences differ everywhere."""
    def bins_for(seed):
        return [
            4 + (seed * seed * 29 + w * w * 43 + seed * w * 7
                 + seed * 13 + w * 19) % 97
            for w in range(10)
        ]

    rows = [
        (d, bytearray(encode_wav(8000, _tone_pcm(bins_for(d % 3)))))
        for d in range(6)
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    fp = audio_fingerprint(df, "media_id", "blob", gram=3)
    pairs = {
        (r.id_a, r.id_b): r.shared_grams
        for r in audio_near_dup_pairs(fp, min_shared=4).collect()
    }
    assert pairs == {(0, 3): 8, (1, 4): 8, (2, 5): 8}


def test_df_cap_drops_ubiquitous_gram(spark):
    """Every doc shares one constant-tone run; with max_df below the
    corpus size that gram cannot create pairs on its own."""
    rows = [
        (d, bytearray(encode_wav(8000, _tone_pcm([50, 50, 50] + [60 + d]))))
        for d in range(5)
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    fp = audio_fingerprint(df, "media_id", "blob", gram=3)
    assert audio_near_dup_pairs(fp, min_shared=1, max_df=4).count() == 0
    assert audio_near_dup_pairs(fp, min_shared=1, max_df=5).count() == 10


def test_planted_seed_grams_pairwise_distinct():
    """Pins the q202 planting: across all 53 seeds the sqmix bin
    formula gives >= 8 distinct grams each and at most 3 cross-seed
    shared grams — strictly below the min_shared=4 gate."""
    def grams(seed):
        bins = [
            4 + (seed * seed * 29 + w * w * 43 + seed * w * 7
                 + seed * 13 + w * 19) % 97
            for w in range(10)
        ]
        return {tuple(bins[i:i + 3]) for i in range(8)}

    gsets = [grams(s) for s in range(53)]
    assert all(len(g) == 8 for g in gsets)
    worst = max(
        len(gsets[a] & gsets[b])
        for a in range(53) for b in range(a + 1, 53)
    )
    assert worst <= 3
