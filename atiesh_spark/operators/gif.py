"""GIF87a/89a codec in pure numpy/stdlib — REAL animated-image decode
with LZW, plus stride-based frame sampling.

This is the engine's video-shaped multimodal path: an animated GIF is
a container of independently-coded frames, and the pipeline operation
a training-data system needs — "sample every k-th frame and extract
features" — maps onto it exactly. The decoder walks the public GIF
grammar (logical screen descriptor, color tables, extension blocks,
image descriptors) and implements variable-width LZW from the spec
(Appendix F of GIF89a): clear/EOI codes, width growth at table
boundaries up to 12 bits, the KwKwK case, and clear-reset when the
table fills.

Frame SAMPLING is where the format pays off at scale: sub-block
lengths let a non-sampled frame's pixel data be SKIPPED without LZW
decoding it, so a stride-k sample does ~1/k of the decode work — the
operator's skip path is exercised by tests. Malformed blobs become
error ROWS (the q161/q194 contract), never task failures.

The encoder exists for tests and synthetic media (the planted-pixel
oracle pattern): real LZW compression with the mirrored width rule,
round-trip-tested against the decoder across dictionary growth and
clear-reset boundaries.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

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

#: pixel budget per frame, same rationale as jpeg.py/png.py
MAX_PIXELS = 64_000_000
_MAX_CODE_WIDTH = 12


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable width, LSB-first bit packing)
# ---------------------------------------------------------------------------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-LZW compress a flat array of color indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    next_code = eoi + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}

    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    buf: tuple[int, ...] = ()
    for px in map(int, indices):
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code == (1 << _MAX_CODE_WIDTH):
            # table full: reset (decoder mirrors on the clear code)
            emit(clear, width)
            width = min_code_size + 1
            next_code = eoi + 1
            table = {(i,): i for i in range(clear)}
        else:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
                width += 1
        buf = (px,)
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-LZW decompress to exactly ``n_pixels`` color indices."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    next_code = eoi + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]

    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated (no EOI)")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            width = min_code_size + 1
            next_code = eoi + 1
            table = table[: clear + 2]
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("first LZW code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"LZW code {code} out of range")
        out += entry
        if len(out) > n_pixels:
            raise ValueError("LZW output exceeds frame size")
        if prev is not None and next_code < (1 << _MAX_CODE_WIDTH):
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
    if len(out) != n_pixels:
        raise ValueError(
            f"LZW decoded {len(out)} pixels, frame needs {n_pixels}"
        )
    return np.frombuffer(bytes(out), dtype=np.uint8)


# ---------------------------------------------------------------------------
# Container: encoder (tests/synthesis) and decoder
# ---------------------------------------------------------------------------


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _interlace_rows(h: int) -> np.ndarray:
    """GIF 4-pass interlace row order (GIF89a spec Appendix E): the
    row index each delivered scanline lands on — passes start at rows
    0/4/2/1 with strides 8/8/4/2."""
    return np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delay_cs: int = 4,
    interlace: bool = False,
) -> bytes:
    """GIF89a encoder for tests/synthetic media: ``frames`` are (h, w)
    uint8 index arrays into ``palette`` ((n, 3) uint8, n a power of two
    >= 4); all frames full-size at origin. ``interlace=True`` writes
    each frame's rows in the 4-pass interlace order with the
    descriptor flag set (round 9, so the decoder's deinterlace path is
    differentially testable)."""
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("palette must be (n, 3) uint8")
    n = len(pal)
    if n < 4 or n & (n - 1):
        raise ValueError("palette size must be a power of two >= 4")
    if not frames:
        raise ValueError("need at least one frame")
    gct_bits = n.bit_length() - 1  # 2^(bits) entries
    h0, w0 = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w0, h0)
    out.append(0x80 | ((gct_bits - 1) & 0x07))  # GCT flag + size
    out.append(0)  # background color index
    out.append(0)  # pixel aspect ratio
    out += pal.tobytes()
    min_code = max(2, gct_bits)
    for fr in frames:
        fr = np.asarray(fr, dtype=np.uint8)
        if fr.ndim != 2:
            raise ValueError("frame must be 2-D indices")
        if int(fr.max(initial=0)) >= n:
            raise ValueError("frame index out of palette range")
        fh, fw = fr.shape
        # graphic control extension (89a): delay, no transparency
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, fw, fh)
        out.append(0x40 if interlace else 0)  # no LCT; interlace flag
        out.append(min_code)
        rows = fr[_interlace_rows(fh)] if interlace else fr
        out += _sub_blocks(_lzw_encode(rows.flatten(), min_code))
    out += b"\x3b"  # trailer
    return bytes(out)


def _read_sub_blocks(blob: bytes, pos: int, skip: bool) -> tuple[bytes, int]:
    """Concatenate (or skip) GIF data sub-blocks starting at ``pos``;
    returns (data, new_pos). Skipping never touches the payload — the
    frame-sampling fast path."""
    parts = [] if not skip else None
    while True:
        if pos >= len(blob):
            raise ValueError("sub-blocks truncated")
        ln = blob[pos]
        pos += 1
        if ln == 0:
            break
        if pos + ln > len(blob):
            raise ValueError("sub-block truncated")
        if parts is not None:
            parts.append(blob[pos : pos + ln])
        pos += ln
    return (b"" if parts is None else b"".join(parts)), pos


def parse_gif_frames(
    blob: bytes, stride: int = 1
) -> list[tuple[int, int, int, np.ndarray]]:
    """[(frame_idx, width, height, rgb (h, w, 3) uint8), ...] for
    frames with ``frame_idx % stride == 0``. Non-sampled frames are
    structurally skipped WITHOUT LZW decoding. Raises ValueError on
    malformed/unsupported blobs (missing color table); interlaced
    frames deinterlace via the 4-pass row map (round 9)."""
    if stride < 1:
        raise ValueError("stride must be >= 1")
    if len(blob) < 13 or blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh = struct.unpack("<HH", blob[6:10])
    packed = blob[10]
    pos = 13
    gct = None
    if packed & 0x80:
        gn = 2 << (packed & 0x07)
        if pos + 3 * gn > len(blob):
            raise ValueError("global color table truncated")
        gct = np.frombuffer(blob[pos : pos + 3 * gn], dtype=np.uint8).reshape(
            gn, 3
        )
        pos += 3 * gn
    frames: list[tuple[int, int, int, np.ndarray]] = []
    idx = 0
    while True:
        if pos >= len(blob):
            raise ValueError("missing trailer")
        b = blob[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks, skip
            if pos >= len(blob):
                raise ValueError("extension truncated")
            pos += 1
            _, pos = _read_sub_blocks(blob, pos, skip=True)
            continue
        if b != 0x2C:
            raise ValueError(f"unknown block 0x{b:02x}")
        if pos + 9 > len(blob):
            raise ValueError("image descriptor truncated")
        fx, fy, fw, fh = struct.unpack("<HHHH", blob[pos : pos + 8])
        fpacked = blob[pos + 8]
        pos += 9
        interlaced = bool(fpacked & 0x40)
        lct = gct
        if fpacked & 0x80:
            ln = 2 << (fpacked & 0x07)
            if pos + 3 * ln > len(blob):
                raise ValueError("local color table truncated")
            lct = np.frombuffer(
                blob[pos : pos + 3 * ln], dtype=np.uint8
            ).reshape(ln, 3)
            pos += 3 * ln
        if pos >= len(blob):
            raise ValueError("missing LZW min code size")
        min_code = blob[pos]
        pos += 1
        sampled = idx % stride == 0
        data, pos = _read_sub_blocks(blob, pos, skip=not sampled)
        if sampled:
            if lct is None:
                raise ValueError("frame without any color table")
            if fw == 0 or fh == 0:
                raise ValueError("zero frame dimension")
            if fw * fh > MAX_PIXELS:
                raise ValueError(
                    f"frame {fw}x{fh} exceeds pixel budget {MAX_PIXELS}"
                )
            ind = _lzw_decode(data, min_code, fw * fh)
            if int(ind.max(initial=0)) >= len(lct):
                raise ValueError("pixel index outside color table")
            grid = ind.reshape(fh, fw)
            if interlaced:
                # scanlines arrive in 4-pass order; scatter them back
                out = np.empty_like(grid)
                out[_interlace_rows(fh)] = grid
                grid = out
            frames.append((idx, fw, fh, lct[grid.reshape(-1)].reshape(fh, fw, 3)))
        idx += 1
    return frames


GIF_FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_r", FloatType()),
        StructField("mean_g", FloatType()),
        StructField("mean_b", FloatType()),
        StructField("error", StringType()),
    ]
)


def sample_gif_frames(
    df: DataFrame, id_col: str, blob_col: str, stride: int = 1
) -> DataFrame:
    """One row per SAMPLED frame (frame_idx % stride == 0) with per-
    channel means — the video-style "decode every k-th frame" operator,
    one Arrow batch at a time through ``mapInPandas``. Non-sampled
    frames are skipped at the container level (no LZW work). Malformed
    blobs yield a single error row keyed to the media id."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    if blob is None:
                        raise ValueError("NULL blob")
                    for idx, w, h, rgb in parse_gif_frames(
                        bytes(blob), stride
                    ):
                        out.append(
                            (
                                mid, idx, w, h,
                                round(float(rgb[..., 0].mean()), 4),
                                round(float(rgb[..., 1].mean()), 4),
                                round(float(rgb[..., 2].mean()), 4),
                                None,
                            )
                        )
                except (ValueError, struct.error, IndexError,
                        ZeroDivisionError, OverflowError) as exc:
                    out.append(
                        (mid, None, None, None, None, None, None, str(exc))
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "frame_idx", "width", "height",
                    "mean_r", "mean_g", "mean_b", "error",
                ],
            )

    return widen_for_python_stage(
        df.select(F.col(id_col), F.col(blob_col))
    ).mapInPandas(
        gen, schema=GIF_FRAMES_SCHEMA
    )
