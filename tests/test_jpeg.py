"""Baseline-JPEG codec tests: exact constant-block round trip (the
graded-query contract), differential encode/decode over the full
AC/huffman path, subsampling, restart markers, and the error-row
behavior of the decode_jpeg operator."""

import struct

import numpy as np
import pytest

from atiesh_spark.operators.jpeg import (
    _parse_jpeg,
    decode_jpeg,
    encode_jpeg_baseline,
)


def _const_block_gray(doc_id: int, w: int, h: int) -> tuple[np.ndarray, list[int]]:
    px = np.zeros((h, w), dtype=np.uint8)
    vals, b = [], 0
    for by in range(h // 8):
        for bx in range(w // 8):
            v = (doc_id * 7 + 13 * b) % 256
            px[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = v
            vals.append(v)
            b += 1
    return px, vals


def test_constant_blocks_roundtrip_exactly_at_q100():
    """Quality 100 -> all-ones quant tables -> a constant 8x8 block is
    DC-only and the DC round trip is bit-exact. This is the invariant
    the graded query's oracle computes arithmetically."""
    for did in (0, 1, 5, 17):
        px, vals = _const_block_gray(did, 24, 16)
        w, h, nc, dec = _parse_jpeg(encode_jpeg_baseline(px, quality=100))
        assert (w, h, nc) == (24, 16, 1)
        assert np.array_equal(dec, px)
        assert round(float(dec.mean()), 4) == round(sum(vals) / len(vals), 4)


def test_random_gray_q100_error_bounded():
    """Full AC path (every huffman category, ZRL, EOB): with all-ones
    quant tables the only loss is float DCT rounding, bounded at 1."""
    px = ((np.arange(64 * 56, dtype=np.int64) * 2654435761) % 256).reshape(
        56, 64
    ).astype(np.uint8)
    _, _, _, dec = _parse_jpeg(encode_jpeg_baseline(px, quality=100))
    assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 1


def test_rgb_444_roundtrip_close():
    px = np.stack(
        [((np.arange(40 * 32) * k) % 256).reshape(32, 40) for k in (3, 7, 11)],
        axis=-1,
    ).astype(np.uint8)
    w, h, nc, dec = _parse_jpeg(encode_jpeg_baseline(px, quality=100))
    assert (w, h, nc) == (40, 32, 3)
    # loss = DCT rounding + two YCbCr<->RGB integer round trips
    assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 4


def test_420_subsampled_constant_chroma_exact_odd_dims():
    px = np.zeros((19, 21, 3), dtype=np.uint8)
    px[:, :, 0], px[:, :, 1], px[:, :, 2] = 200, 100, 50
    w, h, nc, dec = _parse_jpeg(
        encode_jpeg_baseline(px, quality=100, subsample=True)
    )
    assert (w, h, nc) == (21, 19, 3)
    assert np.array_equal(dec, px)


def test_restart_markers_decode_identically():
    px = ((np.arange(64 * 24, dtype=np.int64) * 48271) % 256).reshape(
        24, 64
    ).astype(np.uint8)
    _, _, _, plain = _parse_jpeg(encode_jpeg_baseline(px, quality=85))
    _, _, _, rst = _parse_jpeg(
        encode_jpeg_baseline(px, quality=85, restart_interval=3)
    )
    assert np.array_equal(plain, rst)


def test_malformed_blobs_raise_value_error():
    px, _ = _const_block_gray(1, 16, 16)
    good = encode_jpeg_baseline(px, quality=90)
    progressive = good[:2] + b"\xff\xc2" + good[4:]
    for bad in (b"", b"\x89PNG\r\n", good[:40], progressive):
        with pytest.raises(ValueError):
            _parse_jpeg(bad)


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_jpeg_baseline(np.zeros((8, 8), dtype=np.float64))
    with pytest.raises(ValueError):
        encode_jpeg_baseline(np.zeros((8, 8), dtype=np.uint8), quality=0)


def test_decode_jpeg_operator_error_rows(spark):
    px, vals = _const_block_gray(3, 16, 8)
    good = encode_jpeg_baseline(px, quality=100)
    df = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(good[:30])),
            (3, bytearray(b"\x89PNG")),
            (4, None),
        ],
        "media_id long, blob binary",
    )
    got = {r["media_id"]: r for r in decode_jpeg(df, "media_id", "blob").collect()}
    r1 = got[1]
    assert (r1["format"], r1["width"], r1["height"], r1["n_components"]) == (
        "JFIF", 16, 8, 1,
    )
    exp = round(sum(vals) / len(vals), 4)
    assert abs(r1["mean_r"] - exp) < 1e-4
    assert r1["mean_r"] == r1["mean_g"] == r1["mean_b"]
    assert r1["error"] is None
    assert got[2]["error"] is not None and got[2]["width"] is None
    assert "not a JPEG" in got[3]["error"]
    assert got[4]["error"] == "NULL blob"


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _sof0(h: int, w: int, hv: int = 0x11) -> bytes:
    return _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, hv, 0]))


def test_hostile_segments_raise_value_error_not_task_killers():
    """ADVICE r7: malformed structure that used to escape as
    ZeroDivisionError / struct.error / IndexError (killing the whole
    Arrow batch) must surface as ValueError from the parser."""
    soi = b"\xff\xd8"
    cases = {
        "zero sampling factor": soi + _sof0(8, 8, hv=0x00),
        "short SOF0 segment": soi + _seg(0xC0, b"\x08\x00"),
        "short SOF0 component list": soi
        + _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 3) + bytes([1, 0x11, 0])),
        "short DRI segment": soi + _seg(0xDD, b"\x01"),
        "empty SOS segment": soi + _sof0(8, 8) + _seg(0xDA, b""),
        "short SOS component list": soi + _sof0(8, 8) + _seg(0xDA, b"\x02\x01\x00"),
        "zero frame dimension": soi + _sof0(0, 8),
        "pixel budget": soi + _sof0(65535, 65535),
    }
    for label, blob in cases.items():
        with pytest.raises(ValueError):
            _parse_jpeg(blob)


def test_hostile_segments_become_error_rows(spark):
    """The same hostile blobs through the operator: every one must be
    an error ROW, and the well-formed sibling in the same Arrow batch
    must still decode (the batch survives)."""
    px, _ = _const_block_gray(2, 8, 8)
    good = encode_jpeg_baseline(px, quality=100)
    soi = b"\xff\xd8"
    rows = [
        (1, bytearray(good)),
        (2, bytearray(soi + _sof0(8, 8, hv=0x00))),
        (3, bytearray(soi + _seg(0xC0, b"\x08\x00"))),
        (4, bytearray(soi + _sof0(8, 8) + _seg(0xDA, b""))),
        (5, bytearray(soi + _sof0(65535, 65535))),
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    got = {r["media_id"]: r for r in decode_jpeg(df, "media_id", "blob").collect()}
    assert got[1]["error"] is None and got[1]["width"] == 8
    for mid in (2, 3, 4, 5):
        assert got[mid]["error"] is not None and got[mid]["width"] is None
    assert "pixel budget" in got[5]["error"]
