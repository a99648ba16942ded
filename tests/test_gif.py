"""GIF codec tests: variable-width LZW round trips across dictionary
growth, the KwKwK case, and the 12-bit clear-reset; multi-frame
container round trips (GIF is lossless, every pixel check is
array_equal); the stride-sampling SKIP path (non-sampled frames must
never be LZW-decoded — proven with a frame whose LZW stream is
corrupt); and the error-row behavior of sample_gif_frames."""

import struct

import numpy as np
import pytest

from atiesh_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    encode_gif,
    parse_gif_frames,
    sample_gif_frames,
)


def _pal(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.int64)
    return np.stack(
        [i % 256, (i + 85) % 256, (i + 170) % 256], axis=-1
    ).astype(np.uint8)


def _frame(h: int, w: int, n: int, seed: int = 0) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return ((3 * x + 7 * y + seed) % n).astype(np.uint8)


@pytest.mark.parametrize("min_code", [2, 4, 8])
def test_lzw_roundtrip_structured(min_code):
    n = 1 << min_code
    px = _frame(37, 29, n).flatten()
    dec = _lzw_decode(_lzw_encode(px, min_code), min_code, len(px))
    assert np.array_equal(dec, px)


def test_lzw_roundtrip_through_table_reset():
    """Enough high-entropy symbols that next_code hits 4096 and the
    encoder emits clear — the decoder must mirror the reset."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=120_000, dtype=np.uint8)
    dec = _lzw_decode(_lzw_encode(px, 8), 8, len(px))
    assert np.array_equal(dec, px)


def test_lzw_kwkwk_case():
    """abababab... forces the code == next_code branch immediately."""
    px = np.array([0, 1] * 50, dtype=np.uint8)
    dec = _lzw_decode(_lzw_encode(px, 2), 2, len(px))
    assert np.array_equal(dec, px)


def test_lzw_rejects_truncation_and_overrun():
    px = _frame(10, 10, 16).flatten()
    blob = _lzw_encode(px, 4)
    with pytest.raises(ValueError):
        _lzw_decode(blob[: len(blob) // 2], 4, len(px))
    with pytest.raises(ValueError):
        _lzw_decode(blob, 4, len(px) - 7)  # decodes past frame size


def test_container_multiframe_roundtrip():
    pal = _pal(64)
    frames = [_frame(11, 13, 64, seed=13 * k) for k in range(5)]
    out = parse_gif_frames(encode_gif(frames, pal))
    assert [f[0] for f in out] == [0, 1, 2, 3, 4]
    for k, (_, w, h, rgb) in enumerate(out):
        assert (w, h) == (13, 11)
        assert np.array_equal(rgb, pal[frames[k]])


def test_stride_samples_every_kth():
    pal = _pal(16)
    frames = [_frame(8, 9, 16, seed=k) for k in range(7)]
    out = parse_gif_frames(encode_gif(frames, pal), stride=3)
    assert [f[0] for f in out] == [0, 3, 6]
    for idx, _, _, rgb in out:
        assert np.array_equal(rgb, pal[frames[idx]])


def test_stride_skip_never_decodes():
    """Frame 1's payload is well-framed sub-blocks of LZW garbage;
    stride=2 must still decode frames 0 and 2 — proof the skip path
    walks sub-block lengths without touching the codes."""
    from atiesh_spark.operators.gif import _lzw_encode, _sub_blocks

    pal = _pal(16)
    frames = [_frame(8, 8, 16, seed=k) for k in range(3)]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", 8, 8)
    out += bytes([0x80 | 0x03, 0, 0])  # GCT of 16 entries
    out += pal.tobytes()
    for k, fr in enumerate(frames):
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, 8, 8) + b"\x00\x04"
        payload = (
            b"\xff" * 24 if k == 1 else _lzw_encode(fr.flatten(), 4)
        )
        out += _sub_blocks(payload)
    out += b"\x3b"
    with pytest.raises(ValueError):
        parse_gif_frames(bytes(out), stride=1)
    sampled = parse_gif_frames(bytes(out), stride=2)
    assert [f[0] for f in sampled] == [0, 2]
    for idx, _, _, rgb in sampled:
        assert np.array_equal(rgb, pal[frames[idx]])


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"PNG" + b[3:],                      # bad signature
        lambda b: b[:-1],                              # missing trailer
        lambda b: b[: len(b) // 2],                    # truncated
        lambda b: b[:-1] + b"\x99" + b[-1:],           # unknown block
    ],
)
def test_malformed_blobs_raise(mutate):
    pal = _pal(8)
    blob = encode_gif([_frame(6, 6, 8)], pal)
    with pytest.raises(ValueError):
        parse_gif_frames(mutate(blob))


def test_interlace_flag_reorders_rows():
    """Round 9: the interlace flag is honored, not rejected. Setting
    the flag on NON-interlaced data must deinterlace (i.e., scramble
    these rows), proving the flag actually drives the row map — the
    faithful round trip is test_interlaced_round_trip."""
    import numpy as np

    pal = _pal(8)
    fr = _frame(12, 6, 8)
    blob = bytearray(encode_gif([fr], pal))
    sep = next(i for i in range(13, len(blob)) if blob[i] == 0x2C)
    blob[sep + 9] |= 0x40
    got = parse_gif_frames(bytes(blob))[0][3]
    plain = parse_gif_frames(encode_gif([fr], pal))[0][3]
    assert got.shape == plain.shape
    assert not np.array_equal(got, plain)  # rows moved
    # same multiset of rows, just permuted by the 4-pass map
    assert sorted(r.tobytes() for r in got) == sorted(
        r.tobytes() for r in plain
    )


def test_pixel_budget_enforced():
    """A crafted descriptor claiming a huge frame errors BEFORE any
    allocation-scale decode work."""
    pal = _pal(8)
    blob = bytearray(encode_gif([_frame(6, 6, 8)], pal))
    sep = next(i for i in range(13, len(blob)) if blob[i] == 0x2C)
    blob[sep + 5 : sep + 9] = struct.pack("<HH", 65535, 65535)
    with pytest.raises(ValueError, match="pixel budget"):
        parse_gif_frames(bytes(blob))


def test_operator_error_rows_and_frame_rows(spark):
    pal = _pal(16)
    good = encode_gif([_frame(8, 9, 16, seed=k) for k in range(4)], pal)
    rows = [
        (1, bytearray(good)),
        (2, bytearray(b"not a gif at all")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    out = sample_gif_frames(df, "media_id", "blob", stride=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    assert [r.frame_idx for r in by_id[1]] == [0, 2]
    assert all(r.error is None for r in by_id[1])
    exp = float(np.round(pal[_frame(8, 9, 16, seed=0)][..., 0].mean(), 4))
    assert by_id[1][0].mean_r == pytest.approx(exp)
    assert len(by_id[2]) == 1 and by_id[2][0].error is not None
    assert by_id[2][0].frame_idx is None
    assert len(by_id[3]) == 1 and "NULL" in by_id[3][0].error


def test_interlaced_round_trip():
    """4-pass interlaced frames must decode to the same pixels as
    their non-interlaced twins (GIF89a Appendix E row order)."""
    import numpy as np

    from atiesh_spark.operators.gif import encode_gif, parse_gif_frames

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    for h, w in [(13, 9), (16, 8), (1, 5), (2, 5), (9, 4)]:
        fr = rng.integers(0, 8, (h, w)).astype(np.uint8)
        plain = parse_gif_frames(encode_gif([fr], pal))
        inter = parse_gif_frames(encode_gif([fr], pal, interlace=True))
        assert np.array_equal(plain[0][3], inter[0][3])
        assert np.array_equal(plain[0][3], pal[fr])
