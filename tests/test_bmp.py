"""BMP codec (operators/bmp.py): round-trips across layouts, row
orders and padding, malformed rejection, and the Spark decode/catalog
paths."""

import struct

import numpy as np
import pytest

from atiesh_spark.operators.bmp import (
    _parse_bmp,
    bmp_header,
    decode_bmp,
    encode_bmp,
)

RNG = np.random.default_rng(2)


class TestRoundTrip:
    @pytest.mark.parametrize("w", [1, 2, 3, 4, 5])  # every pad residue
    def test_24bit_padding_and_row_orders(self, w):
        px = RNG.integers(0, 256, (5, w, 3)).astype(np.uint8)
        for td in (False, True):
            got = _parse_bmp(encode_bmp(px, top_down=td))
            assert got[:3] == (w, 5, 3)
            assert np.array_equal(got[3], px)

    def test_palette(self):
        idx = RNG.integers(0, 7, (6, 5)).astype(np.uint8)
        pal = RNG.integers(0, 256, (7, 3)).astype(np.uint8)
        got = _parse_bmp(encode_bmp(idx, palette=pal))
        assert np.array_equal(got[3], pal[idx])

    def test_row_order_actually_matters(self):
        """Bottom-up vs top-down must differ BEFORE the flip: flipping
        the height sign on a bottom-up stream vertically mirrors the
        image — proves the sign drives reconstruction."""
        px = np.zeros((4, 2, 3), dtype=np.uint8)
        px[0] = 255  # top row white
        blob = bytearray(encode_bmp(px))  # bottom-up
        (h,) = struct.unpack("<i", blob[22:26])
        blob[22:26] = struct.pack("<i", -h)  # claim top-down
        flipped = _parse_bmp(bytes(blob))[3]
        assert np.array_equal(flipped, px[::-1])

    def test_32bit(self):
        """BGRX rows: synthesize by patching a 24-bit encode is messy;
        build the 32-bit body by hand instead."""
        px = RNG.integers(0, 256, (3, 3, 3)).astype(np.uint8)
        body = bytearray()
        for row in px[::-1]:
            for r, g, b in row:
                body += bytes([b, g, r, 0])
        info = struct.pack("<IiiHHIIiiII", 40, 3, 3, 1, 32, 0,
                           len(body), 0, 0, 0, 0)
        head = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        got = _parse_bmp(head + info + bytes(body))
        assert got[:3] == (3, 3, 3)
        assert np.array_equal(got[3], px)


class TestMalformed:
    def test_rejections(self):
        px = RNG.integers(0, 256, (4, 4, 3)).astype(np.uint8)
        good = encode_bmp(px)
        with pytest.raises(ValueError, match="signature"):
            _parse_bmp(b"nope")
        with pytest.raises(ValueError, match="truncated"):
            _parse_bmp(good[:-3])
        rle = bytearray(good)
        rle[30:34] = struct.pack("<I", 1)  # BI_RLE8
        with pytest.raises(ValueError, match="BI_RGB"):
            _parse_bmp(bytes(rle))
        huge = bytearray(good)
        huge[18:26] = struct.pack("<ii", 1 << 20, 1 << 20)
        with pytest.raises(ValueError, match="pixel budget"):
            _parse_bmp(bytes(huge))

    def test_header_triage(self):
        px = RNG.integers(0, 256, (4, 6, 3)).astype(np.uint8)
        assert bmp_header(encode_bmp(px)) == (6, 4)
        with pytest.raises(ValueError):
            bmp_header(b"BM\x00\x00")


def test_spark_decode_and_catalog(spark):
    from atiesh_spark.operators.media import catalog_media

    px = np.full((4, 5, 3), 200, dtype=np.uint8)
    px[:, :, 1] = 100  # distinct channel means survive BGR swizzle
    rows = [
        (1, bytearray(encode_bmp(px))),
        (2, bytearray(b"BMgarbage_that_fails_the_header")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    got = {r.media_id: r for r in decode_bmp(df, "media_id", "blob").collect()}
    assert (got[1].format, got[1].width, got[1].height) == ("BMP", 5, 4)
    assert (got[1].mean_r, got[1].mean_g, got[1].mean_b) == (200.0, 100.0, 200.0)
    assert got[2].error is not None and got[3].error is not None
    cat = {r.media_id: r for r in
           catalog_media(df, "media_id", "blob").collect()}
    assert (cat[1].format, cat[1].ok, cat[1].width, cat[1].height,
            cat[1].n_frames) == ("bmp", True, 5, 4, 1)
    assert (cat[2].format, cat[2].ok) == ("bmp", False)
