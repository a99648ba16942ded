"""Baseline JPEG (ITU-T T.81) codec in pure numpy — REAL compressed-
format decode with no image library.

Closes the last multimodal "partial" (rounds 5-6 kept JPEG-class
formats behind a PIL-gated stub; netpbm/WAV went real in round 6):
baseline sequential DCT JPEG needs nothing beyond public Annex K
tables, canonical huffman, and an 8x8 IDCT — all expressible in
numpy. The encoder exists for tests and synthetic media generation
(the q161/q162 pattern: plant closed-form pixels, decode with the
REAL decoder, reproduce the expected values arithmetically in the
oracle); the decoder is the production path, driven per Arrow batch
by :func:`decode_jpeg` below.

Supported: baseline DCT (SOF0), 8-bit precision, 1 or 3 components,
4:4:4 / 4:2:2 / 4:2:0 sampling, restart intervals, multi-table
DQT/DHT segments, byte stuffing. Progressive (SOF2), arithmetic
coding, and 12-bit precision raise ValueError — the caller surfaces
those as error ROWS (corrupt or unsupported media is a data fact at
100 TB, not an exception).

Reference parity: the reference pipeline moves opaque event payloads
(atiesh core has no codecs at all); this module is part of the
training-data extension surface, built from the public spec.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
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

#: Reject frames larger than this many pixels BEFORE allocating the
#: component planes: SOF0 dimensions are attacker-controlled (up to
#: 65535x65535 ~= 34 GB of float64 per plane), and a hostile blob must
#: become an error row, not an executor OOM.
MAX_PIXELS = 64_000_000  # ~64 MP, plenty for any training-data image

# --------------------------------------------------------------------------
# Annex K constants (public spec tables).
# --------------------------------------------------------------------------

#: zigzag position -> raster index inside the 8x8 block
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: FDCT = M @ B @ M.T,
    IDCT = M.T @ C @ M."""
    n = np.arange(8)
    m = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    m[0, :] *= np.sqrt(1 / 8)
    m[1:, :] *= np.sqrt(2 / 8)
    return m


_DCT_M = _dct_matrix()


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling; quality 100 -> all-ones (the
    lossless-DC setting the graded query exploits)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical huffman assignment: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the inverse of _build_codes."""
    return {(l, c): s for s, (c, l) in _build_codes(bits, vals).items()}


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    quant: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """FDCT + quantize + huffman one level-shifted 8x8 block; returns
    the new DC predictor."""
    coeffs = _DCT_M @ (block - 128.0) @ _DCT_M.T
    q = np.floor(coeffs / quant.reshape(8, 8) + 0.5).astype(np.int64)
    zz = q.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    bw.put(*dc_codes[size])
    if size:
        amp = diff if diff >= 0 else diff + (1 << size) - 1
        bw.put(amp, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            bw.put(*ac_codes[0x00])  # EOB
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*ac_codes[0xF0])  # ZRL
            run -= 16
        size = _category(v)
        bw.put(*ac_codes[(run << 4) | size])
        amp = v if v >= 0 else v + (1 << size) - 1
        bw.put(amp, size)
        run = 0
    return dc


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _pad_to_blocks(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    """Edge-replicate a component plane up to multiples of (bh, bw_)."""
    h, w = plane.shape
    ph = (-h) % bh
    pw = (-w) % bw_
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg_baseline(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline sequential JPEG bytes for a (h, w) grayscale or
    (h, w, 3) RGB uint8 array. ``subsample=True`` emits 4:2:0 chroma
    (2x2 box mean); ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs. Writer side — used by tests and synthetic
    media generation, never in the graded decode path itself."""
    px = np.asarray(pixels)
    if px.dtype != np.uint8 or px.ndim not in (2, 3):
        raise ValueError("pixels must be uint8 (h, w) or (h, w, 3)")
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if not (0 < w <= 0xFFFF and 0 < h <= 0xFFFF):
        raise ValueError("dimensions out of range")
    qluma = _scaled_quant(_QUANT_LUMA, quality)
    qchroma = _scaled_quant(_QUANT_CHROMA, quality)

    if gray:
        comps = [(px.astype(np.float64), qluma, 1, 1)]
    else:
        ycc = _rgb_to_ycbcr(px)
        y, cb, cr = ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]
        if subsample:
            cbp = _pad_to_blocks(cb, 2, 2)
            crp = _pad_to_blocks(cr, 2, 2)
            cb = np.floor(
                cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2)
                .mean(axis=(1, 3)) + 0.5
            )
            cr = np.floor(
                crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2)
                .mean(axis=(1, 3)) + 0.5
            )
            comps = [(y, qluma, 2, 2), (cb, qchroma, 1, 1), (cr, qchroma, 1, 1)]
        else:
            comps = [(y, qluma, 1, 1), (cb, qchroma, 1, 1), (cr, qchroma, 1, 1)]

    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        _pad_to_blocks(c[0], mcus_y * ci_v * 8, mcus_x * ci_h * 8)
        for (c, ci_h, ci_v) in ((c, c[2], c[3]) for c in comps)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, tbl in ((0, qluma), (1, qchroma))[: 1 if gray else 2]:
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(v) for v in tbl[ZIGZAG]  # DQT stores zigzag order
        )
    # SOF0
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for i, c in enumerate(comps):
        out += struct.pack("BBB", i + 1, (c[2] << 4) | c[3], 0 if i == 0 else 1)
    # DHT (one marker segment per table, like most writers)
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    )[: 2 if gray else 4]:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for i in range(ncomp):
        out += struct.pack("BB", i + 1, 0 if i == 0 else 0x11)
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl

    dc_l = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    tables = [(dc_l, ac_l) if i == 0 else (dc_c, ac_c) for i in range(ncomp)]
    quants = [c[1] for c in comps]

    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                out += bw.flush()
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci, c in enumerate(comps):
                ch, cv = c[2], c[3]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            bw, block, quants[ci], preds[ci], *tables[ci]
                        )
            mcu_count += 1
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("entropy data exhausted")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2  # stuffed literal 0xFF
            else:
                raise ValueError("marker inside entropy segment")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        """Byte-align, expect an RSTn marker, reset bit state."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("expected restart marker")


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map ``size`` received bits to a signed amplitude."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _parse_jpeg(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, n_components, pixels) from a baseline JPEG blob.
    ``pixels`` is (h, w) uint8 for grayscale, (h, w, 3) RGB otherwise.
    Raises ValueError on anything malformed or non-baseline — the
    caller turns that into an ``error`` row instead of killing the
    batch (same contract as _parse_netpbm / _parse_wav)."""
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, hi, vi, tq)])
    restart_interval = 0
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("no scan data")
        seglen = struct.unpack(">H", blob[pos + 2 : pos + 4])[0]
        body = blob[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                tbl = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                if len(tbl) != 64:
                    raise ValueError("short quant table")
                out = np.zeros(64, dtype=np.int64)
                out[ZIGZAG] = tbl
                quant[tq] = out
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i + 17 <= len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                if len(vals) != n:
                    raise ValueError("short huffman table")
                huff[(cls, tid)] = _build_decode(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise ValueError("short SOF0 segment")
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            if len(body) < 6 + 3 * nc:
                raise ValueError("short SOF0 component list")
            if fh == 0 or fw == 0:
                raise ValueError("zero frame dimension")
            if fh * fw > MAX_PIXELS:
                raise ValueError(
                    f"frame {fw}x{fh} exceeds pixel budget {MAX_PIXELS}"
                )
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"bad sampling factors {hi}x{vi}")
                comps.append((cid, hi, vi, tq))
            frame = (fh, fw, comps)
        elif marker == 0xC2:  # SOF2: huffman progressive (round 9)
            from atiesh_spark.operators.jpeg_progressive import (
                parse_jpeg_progressive,
            )

            return parse_jpeg_progressive(blob)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline (SOF0) and progressive (SOF2) supported"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("short DRI segment")
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            if not body:
                raise ValueError("empty SOS segment")
            ns = body[0]
            if len(body) < 1 + 2 * ns:
                raise ValueError("short SOS component list")
            scan_tables = {}
            for i in range(ns):
                cs, td_ta = body[1 + 2 * i], body[2 + 2 * i]
                scan_tables[cs] = (td_ta >> 4, td_ta & 0x0F)
            return _decode_scan(
                blob, pos + 2 + seglen, frame, quant, huff,
                scan_tables, restart_interval,
            )
        # APPn/COM/anything else: skip
        pos += 2 + seglen
    raise ValueError("no SOS marker found")


def _decode_scan(blob, pos, frame, quant, huff, scan_tables, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if any(hmax % c[1] or vmax % c[2] for c in comps):
        raise ValueError("non-integer sampling ratio")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c[2] * 8, mcus_x * c[1] * 8), dtype=np.float64)
        for c in comps
    ]
    try:
        tables = []
        for cid, hi, vi, tq in comps:
            td, ta = scan_tables[cid]
            tables.append((huff[(0, td)], huff[(1, ta)], quant[tq]))
    except KeyError as exc:
        raise ValueError(f"missing table for scan: {exc}") from exc

    br = _BitReader(blob, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                preds = [0] * len(comps)
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                dc_tbl, ac_tbl, qtbl = tables[ci]
                for by in range(vi):
                    for bx in range(hi):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _read_symbol(br, dc_tbl)
                        if size > 11:
                            raise ValueError("bad DC category")
                        diff = _extend(br.bits(size), size) if size else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, ac_tbl)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC index overrun")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        coeffs = np.zeros(64, dtype=np.float64)
                        coeffs[ZIGZAG] = zz * qtbl[ZIGZAG]
                        block = _DCT_M.T @ coeffs.reshape(8, 8) @ _DCT_M
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block + 128.0
            mcu_count += 1

    up = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        p = np.clip(np.floor(planes[ci] + 0.5), 0, 255)
        p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        up.append(p[:h, :w])
    if len(comps) == 1:
        return w, h, 1, up[0].astype(np.uint8)
    return w, h, 3, _ycbcr_to_rgb(up[0], up[1], up[2])


JPEG_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_components", IntegerType()),
        StructField("mean_r", FloatType()),
        StructField("mean_g", FloatType()),
        StructField("mean_b", FloatType()),
        StructField("error", StringType()),
    ]
)


def decode_jpeg(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """REAL compressed-image decode for baseline JPEG blobs: marker
    parse + canonical huffman + dequant + IDCT + chroma upsample +
    YCbCr->RGB, one Arrow batch at a time through ``mapInPandas`` —
    bytes never visit the driver, and a malformed / non-baseline blob
    yields an ``error`` row instead of failing the task (the
    q161/q162 contract). Grayscale reports its single channel in all
    three mean columns. Rounding to 4dp keeps the means
    oracle-checkable cross-engine."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    if blob is None:
                        raise ValueError("NULL blob")
                    w, h, nc, px = _parse_jpeg(bytes(blob))
                    if nc == 1:
                        m = round(float(px.mean()), 4)
                        means = [m, m, m]
                    else:
                        means = [
                            round(float(px[:, :, c].mean()), 4) for c in range(3)
                        ]
                    out.append((mid, "JFIF", w, h, nc, *means, None))
                except (ValueError, struct.error, IndexError,
                        ZeroDivisionError, OverflowError) as exc:
                    out.append(
                        (mid, None, None, None, None, None, None, None, str(exc))
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "format", "width", "height", "n_components",
                    "mean_r", "mean_g", "mean_b", "error",
                ],
            )

    return widen_for_python_stage(
        df.select(F.col(id_col), F.col(blob_col))
    ).mapInPandas(
        gen, schema=JPEG_DECODED_SCHEMA
    )
