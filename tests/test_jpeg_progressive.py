"""Progressive JPEG (operators/jpeg_progressive.py): differential
equality against the baseline codec — both encoders share the exact
quantization arithmetic, so decoding either stream of the same pixels
must be BIT-IDENTICAL — plus scan-script variants, malformed-input
rejection, and the mixed-format Spark decode path."""

import struct

import numpy as np
import pytest

from atiesh_spark.operators.jpeg import _parse_jpeg, encode_jpeg_baseline
from atiesh_spark.operators.jpeg_progressive import (
    encode_jpeg_progressive,
    parse_jpeg_progressive,
)

RNG = np.random.default_rng(7)

CASES = [
    ("gray_even_q90", RNG.integers(0, 256, (16, 24)).astype(np.uint8), 90, False),
    ("gray_odd_q75", RNG.integers(0, 256, (17, 23)).astype(np.uint8), 75, False),
    ("rgb_q90", RNG.integers(0, 256, (16, 16, 3)).astype(np.uint8), 90, False),
    ("rgb_420_q85", RNG.integers(0, 256, (20, 28, 3)).astype(np.uint8), 85, True),
    ("rgb_420_odd_q60", RNG.integers(0, 256, (19, 21, 3)).astype(np.uint8), 60, True),
    ("gradient_q50", (np.add.outer(np.arange(32), np.arange(40)) * 3 % 256).astype(np.uint8), 50, False),
    ("flat_q100", np.full((24, 24), 77, dtype=np.uint8), 100, False),
    # sparse blocks -> long EOB runs across blocks (EOBn > EOB0 path)
    ("sparse_q25", (RNG.integers(0, 2, (40, 40)) * 255).astype(np.uint8), 25, False),
]


@pytest.mark.parametrize("name,px,q,sub", CASES, ids=[c[0] for c in CASES])
def test_progressive_equals_baseline(name, px, q, sub):
    base = _parse_jpeg(encode_jpeg_baseline(px, quality=q, subsample=sub))
    blob = encode_jpeg_progressive(px, quality=q, subsample=sub)
    prog = parse_jpeg_progressive(blob)
    assert base[:3] == prog[:3]
    assert np.array_equal(base[3], prog[3])
    # the baseline entry point dispatches SOF2 transparently
    disp = _parse_jpeg(blob)
    assert np.array_equal(disp[3], prog[3])


def test_spectral_selection_only_script():
    """Al = 0 everywhere: pure spectral selection, no successive
    approximation — the other half of Annex G."""
    px = RNG.integers(0, 256, (24, 40)).astype(np.uint8)
    blob = encode_jpeg_progressive(
        px, quality=80,
        scans=[([0], 0, 0, 0, 0), ([0], 1, 9, 0, 0),
               ([0], 10, 35, 0, 0), ([0], 36, 63, 0, 0)],
    )
    base = _parse_jpeg(encode_jpeg_baseline(px, quality=80))
    prog = parse_jpeg_progressive(blob)
    assert np.array_equal(base[3], prog[3])


def test_color_spectral_selection_script():
    px = RNG.integers(0, 256, (18, 26, 3)).astype(np.uint8)
    blob = encode_jpeg_progressive(
        px, quality=70, subsample=True,
        scans=[([0, 1, 2], 0, 0, 0, 0),
               ([0], 1, 63, 0, 0), ([1], 1, 63, 0, 0),
               ([2], 1, 63, 0, 0)],
    )
    base = _parse_jpeg(
        encode_jpeg_baseline(px, quality=70, subsample=True)
    )
    prog = parse_jpeg_progressive(blob)
    assert np.array_equal(base[3], prog[3])


def test_deep_successive_approximation():
    """Three AC bit planes (Al=3 -> 2 -> 1 -> 0) over one band: every
    refinement pass must land exactly."""
    px = (np.add.outer(np.arange(16) * 7, np.arange(16) * 13) % 256).astype(np.uint8)
    blob = encode_jpeg_progressive(
        px, quality=40,
        scans=[([0], 0, 0, 0, 1), ([0], 0, 0, 1, 0),
               ([0], 1, 63, 0, 3), ([0], 1, 63, 3, 2),
               ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0)],
    )
    base = _parse_jpeg(encode_jpeg_baseline(px, quality=40))
    prog = parse_jpeg_progressive(blob)
    assert np.array_equal(base[3], prog[3])


class TestMalformed:
    def test_rejections(self):
        px = np.full((16, 16), 50, dtype=np.uint8)
        blob = encode_jpeg_progressive(px, quality=90)
        with pytest.raises(ValueError, match="missing SOI"):
            parse_jpeg_progressive(b"nope")
        with pytest.raises(ValueError):
            parse_jpeg_progressive(blob[:40])  # truncated in tables
        with pytest.raises(ValueError):
            parse_jpeg_progressive(blob[:-20])  # truncated entropy/EOI
        # a baseline stream is NOT a progressive frame
        bl = encode_jpeg_baseline(px, quality=90)
        with pytest.raises(ValueError, match="not a progressive"):
            parse_jpeg_progressive(bl)

    def test_dimension_budget(self):
        px = np.full((8, 8), 10, dtype=np.uint8)
        blob = bytearray(encode_jpeg_progressive(px, quality=90))
        i = blob.index(b"\xff\xc2")
        # SOF2 height/width fields sit at i+5 / i+7
        blob[i + 5 : i + 9] = struct.pack(">HH", 0xFFFF, 0xFFFF)
        with pytest.raises(ValueError, match="pixel budget"):
            parse_jpeg_progressive(bytes(blob))

    def test_bad_scan_params(self):
        px = np.full((8, 8), 10, dtype=np.uint8)
        blob = bytearray(encode_jpeg_progressive(
            px, quality=90, scans=[([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)]
        ))
        i = blob.index(b"\xff\xda")  # first SOS: Ss/Se/AhAl at i+6..8
        blob[i + 6 : i + 9] = bytes([40, 20, 0])  # Ss > Se
        with pytest.raises(ValueError, match="spectral"):
            parse_jpeg_progressive(bytes(blob))


def test_spark_decode_mixed_formats(spark):
    """decode_jpeg handles baseline and progressive blobs in one
    frame; garbage still rows out as an error."""
    from atiesh_spark.operators.jpeg import decode_jpeg

    px = np.full((16, 16), 99, dtype=np.uint8)
    rows = [
        (1, bytearray(encode_jpeg_baseline(px, quality=100))),
        (2, bytearray(encode_jpeg_progressive(px, quality=100))),
        (3, bytearray(b"\xff\xd8garbage")),
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    got = {r.media_id: r for r in decode_jpeg(df, "media_id", "blob").collect()}
    assert got[1].error is None and got[2].error is None
    # quality 100 constant block: DC-exact round trip on BOTH paths
    assert got[1].mean_r == 99.0 and got[2].mean_r == 99.0
    assert got[3].error is not None


def test_restart_intervals():
    """DRI + RSTn inside progressive scans: DC predictors and EOB runs
    reset at every boundary, in interleaved and single-component
    scans alike — decode must still equal baseline."""
    px_g = RNG.integers(0, 256, (40, 40)).astype(np.uint8)
    for ri in (1, 3, 7):
        blob = encode_jpeg_progressive(px_g, quality=75, restart_interval=ri)
        base = _parse_jpeg(encode_jpeg_baseline(px_g, quality=75))
        assert np.array_equal(base[3], parse_jpeg_progressive(blob)[3])
    px_c = RNG.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    blob = encode_jpeg_progressive(
        px_c, quality=80, subsample=True, restart_interval=2
    )
    base = _parse_jpeg(encode_jpeg_baseline(px_c, quality=80, subsample=True))
    assert np.array_equal(base[3], parse_jpeg_progressive(blob)[3])
