"""WARC record ingestion (sources/warc.py)."""

from __future__ import annotations

import hashlib

from atiesh_spark.sources.warc import (
    encode_warc_records,
    parse_warc_blob,
    parse_warc_records,
)


def test_roundtrip_multibyte_payloads():
    recs = [
        ("https://x/1", b"hello world"),
        ("https://x/2", "héllo 世界".encode("utf-8")),
        ("https://x/3", b""),  # zero-length payload is legal
    ]
    out = list(parse_warc_blob(encode_warc_records(recs)))
    assert [r["error"] for r in out] == [None, None, None]
    assert [r["target_uri"] for r in out] == [u for u, _ in recs]
    assert [r["body"] for r in out] == [p for _, p in recs]
    assert [r["content_length"] for r in out] == [len(p) for _, p in recs]
    assert [r["rec_index"] for r in out] == [0, 1, 2]


def test_error_rows_not_exceptions():
    good = encode_warc_records([("https://x/1", b"abcde")])
    cases = {
        b"HTTP/1.1 200\r\n\r\n": "bad magic",
        good[:-3]: "truncated",
        good.replace(b"Content-Length: 5", b"Content-Length: x"): "Content-Length",
        good.replace(b"\r\n\r\nabcde\r\n\r\n", b"\r\n\r\nabcde!!!!"): "separator",
    }
    for blob, frag in cases.items():
        rows = list(parse_warc_blob(blob))
        assert rows[-1]["error"] is not None and frag in rows[-1]["error"]


def test_parse_stops_after_structural_error():
    # a good record followed by garbage: the good one parses, then one
    # error row, then nothing (no resync guessing)
    blob = encode_warc_records([("https://x/1", b"ok")]) + b"garbage"
    rows = list(parse_warc_blob(blob))
    assert rows[0]["error"] is None and rows[1]["error"] is not None
    assert len(rows) == 2


def test_mapinpandas_explodes_blobs_and_carries_ids(spark):
    blob_a = encode_warc_records([("u/1", b"aa"), ("u/2", b"bbb")])
    blob_b = encode_warc_records([("u/3", b"cccc")])
    df = spark.createDataFrame(
        [(10, blob_a), (20, blob_b)], "file_id long, blob binary"
    )
    rows = sorted(
        parse_warc_records(df, "blob", id_cols=("file_id",)).collect(),
        key=lambda r: (r["file_id"], r["rec_index"]),
    )
    assert [(r["file_id"], r["rec_index"], r["target_uri"], bytes(r["body"]))
            for r in rows] == [
        (10, 0, "u/1", b"aa"),
        (10, 1, "u/2", b"bbb"),
        (20, 0, "u/3", b"cccc"),
    ]


def test_mapinpandas_error_row_for_corrupt_blob(spark):
    good = encode_warc_records([("u/1", b"aa")])
    df = spark.createDataFrame(
        [(1, good), (2, good[:-4])], "file_id long, blob binary"
    )
    rows = parse_warc_records(df, "blob", id_cols=("file_id",)).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r["file_id"], []).append(r)
    assert by_file[1][0]["error"] is None
    errs = [r for r in by_file[2] if r["error"]]
    assert errs, "corrupt blob must yield an error row, not kill the task"


def test_body_md5_matches_source_text():
    text = "payload ü"
    blob = encode_warc_records([("u", text.encode("utf-8"))])
    (rec,) = parse_warc_blob(blob)
    assert hashlib.md5(rec["body"]).hexdigest() == hashlib.md5(
        text.encode("utf-8")
    ).hexdigest()


class TestWarcGz:
    """Round 10: .warc.gz — one gzip member per record, the actual
    CommonCrawl layout; the inflate path must loop over members."""

    RECS = [("https://a/1", b"hello"), ("https://b/2", b"world " * 50),
            ("https://c/3", b"")]

    def test_round_trip_is_multi_member(self):
        import gzip

        from atiesh_spark.sources.warc import (
            encode_warc_records,
            parse_warc_blob,
        )

        gz = encode_warc_records(self.RECS, gzipped=True)
        # genuinely one member per record, and stdlib-gzip readable
        assert gz.count(b"\x1f\x8b\x08") == len(self.RECS)
        assert gzip.decompress(gz) == encode_warc_records(self.RECS)
        rows = list(parse_warc_blob(gz))
        assert [(r["target_uri"], r["body"]) for r in rows] == [
            (u, p) for u, p in self.RECS]
        assert all(r["error"] is None for r in rows)

    def test_single_member_pass_would_have_dropped_records(self):
        """Documents the bug class this path guards against: only the
        FIRST member survives a non-looping inflate."""
        import zlib

        from atiesh_spark.sources.warc import (
            encode_warc_records,
            parse_warc_blob,
        )

        gz = encode_warc_records(self.RECS, gzipped=True)
        d = zlib.decompressobj(16 + 15)
        first_only = d.decompress(gz)
        assert len(list(parse_warc_blob(first_only))) == 1
        assert len(list(parse_warc_blob(gz))) == len(self.RECS)

    def test_truncated_and_bomb_are_error_rows(self):
        from atiesh_spark.sources import tarsrc
        from atiesh_spark.sources.warc import (
            encode_warc_records,
            parse_warc_blob,
        )

        gz = encode_warc_records(self.RECS, gzipped=True)
        rows = list(parse_warc_blob(gz[: len(gz) // 2]))
        assert rows[-1]["error"] is not None
        old = tarsrc.MAX_ARCHIVE_BYTES
        tarsrc.MAX_ARCHIVE_BYTES = 16
        try:
            rows = list(parse_warc_blob(gz))
        finally:
            tarsrc.MAX_ARCHIVE_BYTES = old
        assert rows[0]["error"] is not None
        assert "budget" in rows[0]["error"]
