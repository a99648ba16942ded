"""Multimodal tests: schemas, Arrow batch shapes, fan-out, and (since
round 9) the REAL decode/resize paths — decode_any_image dispatches to
the repo's pure-numpy codecs; only unrecognized formats fall back to
the deterministic FAKE."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from atiesh_spark.operators.multimodal import (
    attach_media_metadata,
    byte_histogram_features,
    decode_media,
    resize_image,
    sample_frames,
)


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, b"\x89PNG-fake-bytes-1", 5000),
        (2, b"\x89PNG-other-bytes", 12000),
        (3, b"", 0),
    ]
    return spark.createDataFrame(rows, "media_id long, blob binary, dur long")


def test_attach_metadata_struct(media_df):
    out = attach_media_metadata(media_df, "blob", "image/png", duration_ms_col="dur")
    assert out.schema["media_meta"].dataType.simpleString() == (
        "struct<mime:string,width:int,height:int,duration_ms:bigint>"
    )
    r = out.filter("media_id = 1").collect()[0]["media_meta"]
    assert r["mime"] == "image/png" and r["duration_ms"] == 5000


def test_decode_media_stub_is_deterministic(media_df, spark):
    out1 = {r["media_id"]: r for r in decode_media(media_df, "media_id", "blob").collect()}
    out2 = {r["media_id"]: r for r in decode_media(media_df, "media_id", "blob").collect()}
    assert out1.keys() == {1, 2, 3}
    for k in out1:
        assert out1[k]["pixels_sample"] == out2[k]["pixels_sample"]
        assert out1[k]["mode"] == "FAKE"  # stub path marked
        assert len(out1[k]["pixels_sample"]) == 16
    assert out1[1]["pixels_sample"] != out1[2]["pixels_sample"]


def test_byte_histogram_features(media_df):
    out = media_df.select(
        "media_id", byte_histogram_features("blob").alias("feat")
    ).collect()
    feats = {r["media_id"]: r["feat"] for r in out}
    assert len(feats[1]) == 16
    assert abs(sum(feats[1]) - 1.0) < 1e-6  # normalized histogram
    assert sum(feats[3]) == 0.0  # empty blob -> zero vector (len guard)


def test_resize_real_for_decoded_formats(spark, media_df):
    """Round 9: resize_image is REAL for every repo-decoded format —
    decode, exact area resample, PNG re-encode; unrecognized blobs
    (the text-derived media fixture) become error rows, not task
    failures or NotImplementedError."""
    import numpy as np

    from atiesh_spark.operators.bmp import encode_bmp
    from atiesh_spark.operators.png import _parse_png, encode_png

    rows = resize_image(media_df, "media_id", "blob", 32, 32).collect()
    assert all(r.error is not None and r.resized_blob is None for r in rows)

    rgb = np.full((10, 14, 3), 0, dtype=np.uint8)
    rgb[:, :, 0] = 200
    rgb[:, :, 1] = 90
    rgb[:, :, 2] = 30
    gray = np.full((9, 7), 77, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(rgb))), (2, bytearray(encode_png(gray)))],
        "media_id long, blob binary",
    )
    got = {r.media_id: r for r in
           resize_image(df, "media_id", "blob", 5, 4).collect()}
    w, h, nc, px = _parse_png(bytes(got[1].resized_blob))
    assert (w, h, nc) == (5, 4, 3)
    # constant image: exact constant after area resample + re-encode
    assert (px[:, :, 0] == 200).all() and (px[:, :, 2] == 30).all()
    w, h, nc, px = _parse_png(bytes(got[2].resized_blob))
    assert (w, h, nc) == (5, 4, 1) and (px == 77).all()


def test_decode_media_real_path(spark):
    """decode_media now reports REAL dimensions/mode for recognized
    formats and keeps the deterministic FAKE only for unrecognized
    blobs (the q39 fixture contract)."""
    import hashlib

    import numpy as np

    from atiesh_spark.operators.multimodal import decode_media
    from atiesh_spark.operators.png import encode_png

    gray = np.full((6, 9), 42, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(gray))), (2, bytearray(b"just text"))],
        "media_id long, blob binary",
    )
    got = {r.media_id: r for r in
           decode_media(df, "media_id", "blob").collect()}
    assert (got[1].width, got[1].height, got[1].mode) == (9, 6, "L")
    assert got[1].pixels_sample == [42] * 16
    assert (got[2].width, got[2].height, got[2].mode) == (8, 8, "FAKE")
    assert got[2].pixels_sample == list(
        hashlib.sha256(b"just text").digest()[:16]
    )


def test_sample_frames_fanout(media_df):
    out = sample_frames(
        media_df, "media_id", "blob", "dur", every_ms=1000, max_frames=8
    ).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[1]) == 5      # 5000ms / 1000ms
    assert len(by_id[2]) == 8      # capped at max_frames
    assert len(by_id[3]) == 1      # zero duration -> at least one frame
    f = sorted(by_id[1], key=lambda r: r["frame_idx"])
    assert [x["ts_ms"] for x in f] == [0, 1000, 2000, 3000, 4000]
    assert f[0]["frame_blob"] != f[1]["frame_blob"]  # per-frame stub payloads


def test_ppm_decode_real_roundtrip(spark):
    # a REAL decode: bytes -> header parse -> numpy array -> channel
    # means; no stub, no PIL.
    import numpy as np

    from atiesh_spark.operators.multimodal import decode_ppm, encode_ppm

    rng = np.random.RandomState(7)
    w, h = 6, 4
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    blob = encode_ppm(w, h, px.tobytes())
    pgm = b"P5\n# comment\n3 2\n255\n" + bytes(range(6))
    bad = b"P6\n9 9\n255\nshort"
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(pgm)), (3, bytearray(bad)), (4, None)],
        "media_id long, blob binary",
    )
    got = {r["media_id"]: r for r in decode_ppm(df, "media_id", "blob").collect()}
    r1 = got[1]
    assert (r1["format"], r1["width"], r1["height"]) == ("P6", 6, 4)
    for i, c in enumerate("rgb"):
        assert abs(r1[f"mean_{c}"] - round(float(px[:, :, i].mean()), 4)) < 1e-4
    r2 = got[2]
    assert (r2["format"], r2["width"], r2["height"]) == ("P5", 3, 2)
    assert abs(r2["mean_r"] - 2.5) < 1e-6 and r2["mean_r"] == r2["mean_b"]
    assert "truncated" in got[3]["error"]
    assert got[4]["error"] == "NULL blob"


def test_ppm_resize_stride_slicing(spark):
    import numpy as np

    from atiesh_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_ppm,
    )

    w, h = 8, 8
    px = np.arange(w * h * 3, dtype=np.uint16).astype(np.uint8).reshape(h, w, 3)
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(w, h, px.tobytes())))],
        "media_id long, blob binary",
    )
    small = resize_ppm(df, "media_id", "blob", factor=2)
    dec = decode_ppm(small, "media_id", "blob").collect()[0]
    assert (dec["width"], dec["height"]) == (4, 4)
    want = px[::2, ::2, :]
    assert abs(dec["mean_r"] - round(float(want[:, :, 0].mean()), 4)) < 1e-4
    import pytest as _pt

    with _pt.raises(ValueError):
        resize_ppm(df, "media_id", "blob", factor=0)


def test_wav_decode_real_roundtrip(spark):
    import numpy as np

    from atiesh_spark.operators.multimodal import decode_wav, encode_wav

    s = ((np.arange(200, dtype=np.int64) * 7919) % 65536 - 32768).astype("<i2")
    mono = encode_wav(8000, s.tobytes())
    bad = mono[:30]  # truncated mid-fmt
    notwav = b"OggS" + mono[4:]
    zero_rate = encode_wav(1, s.tobytes())
    # sample_rate=0 parses cleanly but must become an error row, not a
    # ZeroDivisionError that kills the whole Arrow batch.
    zero_rate = zero_rate[:24] + b"\x00\x00\x00\x00" + zero_rate[28:]
    df = spark.createDataFrame(
        [(1, bytearray(mono)), (2, bytearray(bad)), (3, bytearray(notwav)),
         (4, None), (5, bytearray(zero_rate))],
        "media_id long, blob binary",
    )
    got = {r["media_id"]: r for r in decode_wav(df, "media_id", "blob").collect()}
    r1 = got[1]
    c0 = s.astype(np.int64)
    assert (r1["sample_rate"], r1["channels"], r1["n_frames"]) == (8000, 1, 200)
    assert r1["duration_ms"] == 200 * 1000 // 8000 == 25
    assert r1["peak"] == int(np.abs(c0).max())
    neg = c0 < 0
    assert r1["zero_crossings"] == int(np.count_nonzero(neg[1:] != neg[:-1]))
    assert r1["sum_sq"] == int((c0 * c0).sum())
    assert abs(r1["rms"] - (r1["sum_sq"] / 200) ** 0.5) < 1e-3
    assert r1["error"] is None
    assert got[2]["error"] is not None and got[2]["sample_rate"] is None
    assert "not a RIFF/WAVE" in got[3]["error"]
    assert got[4]["error"] == "NULL blob"
    assert "sample_rate" in got[5]["error"] and got[5]["duration_ms"] is None


def test_wav_stereo_features_use_channel_zero(spark):
    import numpy as np

    from atiesh_spark.operators.multimodal import decode_wav, encode_wav

    # channel 0 = ramp, channel 1 = loud noise: features must see only ch0
    c0 = np.arange(-50, 50, dtype=np.int64)
    c1 = np.full(100, 30000, dtype=np.int64)
    inter = np.empty(200, dtype="<i2")
    inter[0::2], inter[1::2] = c0.astype("<i2"), c1.astype("<i2")
    df = spark.createDataFrame(
        [(7, bytearray(encode_wav(16000, inter.tobytes(), channels=2)))],
        "media_id long, blob binary",
    )
    r = decode_wav(df, "media_id", "blob").collect()[0]
    assert (r["channels"], r["n_frames"]) == (2, 100)
    assert r["peak"] == 50  # not 30000 — channel 1 is excluded
    assert r["zero_crossings"] == 1  # single -1 -> 0 transition
    assert r["sum_sq"] == int((c0 * c0).sum())


def test_wav_parser_tolerates_extra_chunks():
    import struct

    import numpy as np

    from atiesh_spark.operators.multimodal import _parse_wav, encode_wav

    s = np.arange(10, dtype="<i2")
    blob = encode_wav(44100, s.tobytes())
    # splice an odd-sized LIST chunk (with pad byte) between fmt and data
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = blob[:36] + extra + blob[36:]
    sr, ch, arr = _parse_wav(spliced)
    assert sr == 44100 and ch == 1 and (arr == s).all()
    with pytest.raises(ValueError):
        _parse_wav(encode_wav(8000, s.tobytes())[:-1])  # truncated data
    with pytest.raises(ValueError):
        encode_wav(8000, b"\x01\x02\x03")  # not frame-aligned


class TestWavLayouts:
    """Round 9: the uncompressed layouts beyond PCM16 — PCM8, IEEE
    float32, G.711 A-law/mu-law, and WAVE_FORMAT_EXTENSIBLE."""

    def test_g711_table_knowns(self):
        """Pin the classic CCITT expansion anchors (G.711 / Sun audio
        tables, per g711.c): mu-law 0x00 -> -32124, 0xFF -> 0; A-law
        has no zero — 0x55 -> -8, 0xD5 -> +8 (sign bit set after the
        0x55 XOR means positive); both tables odd-symmetric."""
        import numpy as np

        from atiesh_spark.operators.multimodal import (
            _ALAW_TABLE,
            _ULAW_TABLE,
        )

        assert _ULAW_TABLE[0x00] == -32124
        assert _ULAW_TABLE[0x80] == 32124
        assert _ULAW_TABLE[0xFF] == 0
        assert _ALAW_TABLE[0x55] == -8
        assert _ALAW_TABLE[0xD5] == 8
        assert int(np.abs(_ALAW_TABLE).max()) == 32256
        # sign symmetry: byte with sign bit flipped negates the value
        for t, flip in ((_ULAW_TABLE, 0x80), (_ALAW_TABLE, 0x80)):
            for b in (3, 77, 120):
                assert t[b ^ flip] == -t[b]

    def test_decode_all_layouts(self, spark):
        import struct as st

        import numpy as np

        from atiesh_spark.operators.multimodal import (
            _ALAW_TABLE,
            _ULAW_TABLE,
            decode_wav,
            encode_wav,
        )

        pcm16 = np.array([0, 1000, -1000, 500], dtype="<i2")
        pcm8 = bytes([128, 138, 118, 200])
        flt = st.pack("<4f", 0.0, 0.5, -0.5, 1.0)
        g711 = bytes([0x00, 0x80, 0xFF, 0x55])
        rows = [
            (1, bytearray(encode_wav(8000, pcm16.tobytes()))),
            (2, bytearray(encode_wav(8000, pcm8, audio_format=1, bits=8))),
            (3, bytearray(encode_wav(8000, flt, audio_format=3, bits=32))),
            (4, bytearray(encode_wav(8000, g711, audio_format=6, bits=8))),
            (5, bytearray(encode_wav(8000, g711, audio_format=7, bits=8))),
        ]
        df = spark.createDataFrame(rows, "media_id long, blob binary")
        got = {r.media_id: r for r in
               decode_wav(df, "media_id", "blob").collect()}
        for mid in (1, 2, 3, 4, 5):
            assert got[mid].error is None, got[mid]
            assert got[mid].n_frames == 4
        assert got[1].peak == 1000
        assert got[2].peak == (200 - 128) << 8
        assert got[3].peak == 32767  # 1.0 scales to full int16
        assert got[4].peak == int(np.abs(_ALAW_TABLE[list(g711)]).max())
        assert got[5].peak == int(np.abs(_ULAW_TABLE[list(g711)]).max())

    def test_extensible_header_and_catalog(self, spark):
        """WAVE_FORMAT_EXTENSIBLE (0xFFFE): the real format leads the
        SubFormat GUID; both the decoder and the catalog honor it."""
        import struct as st

        import numpy as np

        from atiesh_spark.operators.media import catalog_media
        from atiesh_spark.operators.multimodal import _parse_wav

        samples = np.array([10, -10, 20, -20], dtype="<i2").tobytes()
        ext = st.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        ext += st.pack("<HHI", 22, 16, 1)  # cbSize, valid bits, mask
        # SubFormat GUID: format code 1 (PCM) + the fixed KSDATAFORMAT
        # suffix 00001000-8000-00AA-00389B71
        ext += (st.pack("<I", 1)
                + b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71")
        blob = (b"RIFF" + st.pack("<I", 4 + 8 + len(ext) + 8 + len(samples))
                + b"WAVEfmt " + st.pack("<I", len(ext)) + ext
                + b"data" + st.pack("<I", len(samples)) + samples)
        sr, ch, arr = _parse_wav(blob)
        assert (sr, ch) == (8000, 1)
        assert arr.tolist() == [10, -10, 20, -20]
        df = spark.createDataFrame([(1, bytearray(blob))],
                                   "media_id long, blob binary")
        cat = catalog_media(df, "media_id", "blob").collect()[0]
        assert (cat.format, cat.ok, cat.sample_rate, cat.n_frames) == (
            "wav", True, 8000, 4)

    def test_malformed_layouts_are_errors(self, spark):
        import struct as st

        from atiesh_spark.operators.multimodal import _parse_wav, encode_wav

        with pytest.raises(ValueError, match="unsupported"):
            encode_wav(8000, b"\x00\x00", audio_format=2, bits=16)
        # 24-bit PCM: honestly unsupported, must raise not misread
        blob = bytearray(encode_wav(8000, b"\x00" * 6))
        blob[34:36] = st.pack("<H", 24)
        with pytest.raises(ValueError, match="unsupported wav layout"):
            _parse_wav(bytes(blob))
        # non-finite float samples: NaN, and +/-inf which np.clip would
        # silently map to full scale if checked after clipping
        # (round-10 ADVICE — finiteness runs on the raw buffer)
        for v in (float("nan"), float("inf"), float("-inf")):
            bad = encode_wav(8000, st.pack("<2f", v, 0.0),
                             audio_format=3, bits=32)
            with pytest.raises(ValueError, match="non-finite"):
                _parse_wav(bad)


def test_decode_media_real_dims_cover_codec_lab():
    """Round-10 contract guard (r9 verdict item 8): ``_decode_blob``
    must report REAL dimensions (mode 'L' or 'RGB', never 'FAKE') for
    EVERY format the codec lab decodes — netpbm P5/P6, PNG (straight +
    Adam7 + palette), JPEG (baseline + progressive), GIF (incl.
    interlace), BMP (bottom-up + top-down + palette), TIFF (II/MM,
    PackBits, LZW, white-is-zero). If a new recognized magic ever
    falls through to the sha256 FAKE stub, this enumeration fails."""
    import numpy as np

    from atiesh_spark.operators.bmp import encode_bmp
    from atiesh_spark.operators.gif import encode_gif
    from atiesh_spark.operators.jpeg import encode_jpeg_baseline
    from atiesh_spark.operators.jpeg_progressive import (
        encode_jpeg_progressive,
    )
    from atiesh_spark.operators.multimodal import _decode_blob, encode_ppm
    from atiesh_spark.operators.png import encode_png
    from atiesh_spark.operators.tiff import encode_tiff

    h, w = 12, 17
    gray = (np.add.outer(np.arange(h), np.arange(w)) * 7 % 256).astype(
        np.uint8
    )
    rgb = np.stack([gray, gray[::-1], gray.T[:w, :h].T[:h, :w]], axis=-1)
    idx = (gray % 8).astype(np.uint8)
    pal = (np.arange(24).reshape(8, 3) * 9 % 256).astype(np.uint8)

    blobs = {
        "pgm": b"P5 %d %d 255\n" % (w, h) + gray.tobytes(),
        "ppm": encode_ppm(w, h, rgb.tobytes()),
        "png_gray": encode_png(gray),
        "png_rgb_adam7": encode_png(rgb, interlace=True),
        "png_palette": encode_png(idx, palette=pal),
        "jpeg_baseline": encode_jpeg_baseline(rgb),
        "jpeg_progressive": encode_jpeg_progressive(gray),
        "gif": encode_gif([idx], pal),
        "gif_interlace": encode_gif([idx], pal, interlace=True),
        "bmp": encode_bmp(rgb),
        "bmp_topdown_pal": encode_bmp(idx, palette=pal, top_down=True),
        "tiff_le": encode_tiff(gray),
        "tiff_be_packbits": encode_tiff(rgb, big_endian=True,
                                        packbits=True),
        "tiff_lzw_wiz": encode_tiff(gray, lzw=True, white_is_zero=True),
    }
    for name, blob in blobs.items():
        out = _decode_blob(blob)
        assert out["mode"] in ("L", "RGB"), (name, out["mode"])
        assert (out["width"], out["height"]) == (w, h), (name, out)
    # and the FAKE stub still exists, but ONLY for unrecognized bytes
    fake = _decode_blob(b"\x00\x01unrecognized-magic")
    assert fake["mode"] == "FAKE" and (fake["width"], fake["height"]) == (8, 8)
