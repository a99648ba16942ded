"""Media-catalog tests: header-only metadata across all five real
codecs, truncated blobs keeping their sniffed format, and the proof
that GIF cataloging never LZW-decodes (corrupt payload bytes with
valid sub-block framing still catalog fine)."""

import numpy as np
import pytest

from atiesh_spark.operators.gif import encode_gif
from atiesh_spark.operators.jpeg import encode_jpeg_baseline
from atiesh_spark.operators.media import (
    _gif_header,
    _jpeg_header,
    _png_header,
    _pnm_header,
    _wav_header,
    catalog_media,
    sniff_format,
)
from atiesh_spark.operators.multimodal import encode_ppm, encode_wav
from atiesh_spark.operators.png import encode_png


def _pal(n):
    i = np.arange(n, dtype=np.int64)
    return np.stack([i, (i + 85) % 256, (i + 170) % 256], -1).astype(np.uint8)


def _gradient(h, w, c=3):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [((3 * x + 7 * y + 41 * k) % 256) for k in range(c)], -1
    ).astype(np.uint8)


def _blobs():
    return {
        "png": encode_png(_gradient(12, 17)),
        "jpeg": encode_jpeg_baseline(_gradient(10, 15)),
        "gif": encode_gif(
            [(_gradient(7, 9)[:, :, 0] % 16) for _ in range(3)], _pal(16)
        ),
        "wav": encode_wav(11025, b"\x00\x00" * 500),
        "pnm": encode_ppm(6, 4, bytes(6 * 4 * 3)),
    }


def test_sniff_on_tiny_prefixes():
    for fmt, blob in _blobs().items():
        assert sniff_format(blob) == fmt
        assert sniff_format(blob[:4]) == fmt
    assert sniff_format(b"\x00\x01\x02\x03") == "unknown"


def test_headers_extract_without_decode():
    b = _blobs()
    assert _png_header(b["png"]) == (17, 12)
    assert _jpeg_header(b["jpeg"]) == (15, 10)
    assert _gif_header(b["gif"]) == (9, 7, 3)
    assert _wav_header(b["wav"]) == (11025, 500)
    assert _pnm_header(b["pnm"]) == (6, 4)


def test_gif_header_skips_lzw():
    """Valid sub-block framing around garbage codes must still
    catalog: header cost is structural, not decode."""
    import struct as st

    from atiesh_spark.operators.gif import _sub_blocks

    out = bytearray(b"GIF89a" + st.pack("<HH", 5, 5))
    out += bytes([0x80 | 0x01, 0, 0]) + _pal(4).tobytes()
    for _ in range(4):
        out += b"\x2c" + st.pack("<HHHH", 0, 0, 5, 5) + b"\x00\x02"
        out += _sub_blocks(b"\xff" * 9)
    out += b"\x3b"
    assert _gif_header(bytes(out)) == (5, 5, 4)


def test_truncated_headers_raise():
    for fmt, blob in _blobs().items():
        with pytest.raises(ValueError):
            {
                "png": _png_header,
                "jpeg": _jpeg_header,
                "gif": _gif_header,
                "wav": _wav_header,
                "pnm": _pnm_header,
            }[fmt](blob[:4])


def test_catalog_operator_mixed_column(spark):
    b = _blobs()
    rows = [
        (0, bytearray(b["png"])),
        (1, bytearray(b["jpeg"])),
        (2, bytearray(b["gif"])),
        (3, bytearray(b["wav"])),
        (4, bytearray(b["pnm"])),
        (5, bytearray(b["png"][:4])),   # truncated, magic survives
        (6, bytearray(b"garbage!")),    # unknown magic
        (7, None),                      # NULL blob
    ]
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    got = {r.media_id: r for r in catalog_media(df, "media_id", "blob").collect()}
    assert (got[0].format, got[0].ok, got[0].width, got[0].height,
            got[0].sample_rate, got[0].n_frames) == ("png", True, 17, 12, -1, 1)
    assert (got[2].format, got[2].n_frames) == ("gif", 3)
    assert (got[3].format, got[3].sample_rate, got[3].n_frames) == (
        "wav", 11025, 500)
    assert (got[5].format, got[5].ok, got[5].width) == ("png", False, -1)
    assert (got[6].format, got[6].ok) == ("unknown", False)
    assert (got[7].format, got[7].ok) == ("unknown", False)
    # NULL-free catalog: every cell materialized
    for r in got.values():
        assert None not in (r.format, r.ok, r.width, r.height,
                            r.sample_rate, r.n_frames)


def test_streaming_catalog_upsert_and_replay(spark, tmp_path):
    """Upsert semantics: a re-sent media_id's fresh row replaces the
    old one; replaying the last batch id converges to the same state
    (the VersionedStore contract)."""
    from atiesh_spark.operators.media import StreamingMediaCatalog

    b = _blobs()
    cat = StreamingMediaCatalog(str(tmp_path / "cat"), "media_id", "blob")
    df1 = spark.createDataFrame(
        [(1, bytearray(b["png"])), (2, bytearray(b["wav"]))],
        "media_id long, blob binary",
    )
    cat(df1, 1)
    # id 2 re-arrives as a gif, id 3 is new
    df2 = spark.createDataFrame(
        [(2, bytearray(b["gif"])), (3, bytearray(b["pnm"]))],
        "media_id long, blob binary",
    )
    cat(df2, 2)
    got = {r.media_id: r for r in cat.read(spark).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].format == "png"
    assert got[2].format == "gif" and got[2].n_frames == 3  # replaced
    assert got[3].format == "pnm"
    # replay batch 2: same pre-batch state re-read, same rows rewritten
    cat(df2, 2)
    again = {r.media_id: r for r in cat.read(spark).collect()}
    assert {(r.media_id, r.format, r.width) for r in again.values()} == {
        (r.media_id, r.format, r.width) for r in got.values()
    }


def test_media_gate_rule_order(spark):
    """First failing rule names the verdict: broken beats too_small,
    too_small beats no_motion."""
    from atiesh_spark.operators.media import media_gate

    rows = [
        (0, "png", False, 2, 2, -1, 1),      # broken wins over size
        (1, "jpeg", True, 10, 10, -1, 1),    # 100 < 144 -> too_small
        (2, "gif", True, 8, 8, -1, 2),       # size fails first
        (3, "gif", True, 20, 20, -1, 2),     # size ok -> no_motion
        (4, "wav", True, -1, -1, 8000, 100), # too_short
        (5, "wav", True, -1, -1, 8000, 500), # pass
        (6, "png", True, 32, 32, -1, 1),     # pass
    ]
    cat = spark.createDataFrame(
        rows,
        "media_id long, format string, ok boolean, width int, "
        "height int, sample_rate int, n_frames int",
    )
    got = {r.media_id: r.verdict for r in media_gate(cat).collect()}
    assert got == {0: "broken", 1: "too_small", 2: "too_small",
                   3: "no_motion", 4: "too_short", 5: "pass", 6: "pass"}


def test_streaming_catalog_collapses_in_batch_duplicates(spark, tmp_path):
    """Two sends of the same media_id inside ONE micro-batch must
    collapse to a single catalog row (the anti-join only clears
    HISTORY rows) — last-write-wins keyed state, the
    StreamingPositionalIndex discipline."""
    from atiesh_spark.operators.media import StreamingMediaCatalog

    b = _blobs()
    cat = StreamingMediaCatalog(str(tmp_path / "cat"), "media_id", "blob")
    dup = spark.createDataFrame(
        [(1, bytearray(b["png"])), (1, bytearray(b["gif"])),
         (2, bytearray(b["wav"]))],
        "media_id long, blob binary",
    )
    cat(dup, 1)
    rows = cat.read(spark).collect()
    assert len(rows) == 2  # one row per id, not three
    got = {r.media_id: r for r in rows}
    # deterministic winner: max_by(blob, md5(blob)) — recompute it
    import hashlib
    winner = max(
        [bytes(b["png"]), bytes(b["gif"])],
        key=lambda x: hashlib.md5(x).hexdigest(),
    )
    expect_fmt = "png" if winner == bytes(b["png"]) else "gif"
    assert got[1].format == expect_fmt
    assert got[2].format == "wav"


class TestMpegAudioCatalog:
    """Round 10: MPEG-1 audio streams in the triage catalog — sniffed
    from the 12-bit sync, metadata from header arithmetic alone."""

    def test_sniff_and_header_walk(self):
        from atiesh_spark.operators.media import sniff_format
        from atiesh_spark.operators.mpeg_audio import mpeg_audio_header
        from tests.test_mpeg_audio import _layer1_frame, _layer2_frame

        b1, _ = _layer1_frame()
        b2, _ = _layer2_frame(fs=44100)
        assert sniff_format(b1) == "mpeg_audio"
        assert sniff_format(b2) == "mpeg_audio"
        assert sniff_format(b"\xff\xd8rest") == "jpeg"  # no clash
        assert mpeg_audio_header(b1) == (48000, 384)
        assert mpeg_audio_header(b2 + b2 + b2) == (44100, 3 * 1152)
        import pytest as _pt

        with _pt.raises(ValueError):
            mpeg_audio_header(b2[:100])  # truncated frame

    def test_catalog_and_gate(self, spark):
        from atiesh_spark.operators.media import catalog_media, media_gate
        from tests.test_mpeg_audio import _layer2_frame

        blob, _ = _layer2_frame()
        rows = {r.media_id: r for r in catalog_media(
            spark.createDataFrame(
                [(1, bytearray(blob + blob)),
                 (2, bytearray(blob[:50]))],  # truncated: broken row
                "media_id long, blob binary",
            ), "media_id", "blob").collect()}
        assert (rows[1].format, rows[1].ok, rows[1].sample_rate,
                rows[1].n_frames) == ("mpeg_audio", True, 48000, 2304)
        assert (rows[2].format, rows[2].ok) == ("mpeg_audio", False)
        cat = catalog_media(
            spark.createDataFrame(
                [(1, bytearray(blob * 3)), (2, bytearray(blob))],
                "media_id long, blob binary",
            ), "media_id", "blob")
        verdicts = {r.media_id: r.verdict for r in
                    media_gate(cat, min_audio_frames=2000).collect()}
        assert verdicts == {1: "pass", 2: "too_short"}
