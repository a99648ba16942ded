"""ZIP member ingestion (sources/zipsrc.py): writer/parser round trip,
stdlib-zipfile interop BOTH ways, per-member error isolation, budgets,
and the Spark explode path."""

import io
import struct
import zipfile

import pytest

from atiesh_spark.sources.zipsrc import (
    encode_zip,
    parse_zip_blob,
    parse_zip_members,
)

MEMBERS = [
    ("a.txt", b"hello world " * 50),
    ("dir/b.bin", bytes(range(256))),
    ("empty", b""),
    ("unié.txt", "café €".encode()),
]


class TestRoundTrip:
    @pytest.mark.parametrize("compress", [True, False])
    def test_ours_to_ours(self, compress):
        rows = list(parse_zip_blob(encode_zip(MEMBERS, compress=compress)))
        assert [(r["name"], r["body"]) for r in rows] == MEMBERS
        assert all(r["error"] is None for r in rows)
        assert all(r["method"] == (8 if compress else 0) for r in rows
                   if r["size"] or not compress or True)

    @pytest.mark.parametrize("compress", [True, False])
    def test_stdlib_reads_ours(self, compress):
        zf = zipfile.ZipFile(io.BytesIO(encode_zip(MEMBERS, compress)))
        assert [(i.filename, zf.read(i)) for i in zf.infolist()] == MEMBERS

    def test_ours_reads_stdlib(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            for n, b in MEMBERS:
                z.writestr(n, b)
        rows = list(parse_zip_blob(buf.getvalue()))
        assert [(r["name"], r["body"]) for r in rows] == MEMBERS


class TestErrors:
    def test_structural_damage_is_one_row(self):
        rows = list(parse_zip_blob(b"not a zip at all"))
        assert len(rows) == 1 and "ZIP" in rows[0]["error"]
        blob = encode_zip(MEMBERS)
        rows = list(parse_zip_blob(blob[: len(blob) // 2]))
        assert len(rows) == 1 and rows[0]["error"]

    def test_member_crc_damage_is_isolated(self):
        blob = bytearray(encode_zip(MEMBERS, compress=False))
        blob[blob.index(b"hello")] ^= 0xFF
        rows = list(parse_zip_blob(bytes(blob)))
        assert "CRC" in rows[0]["error"]
        assert rows[1]["error"] is None and rows[1]["body"] == MEMBERS[1][1]

    def test_unsupported_method_is_isolated(self):
        blob = bytearray(encode_zip(MEMBERS, compress=False))
        i = blob.index(b"PK\x01\x02")  # first central entry: method at +10
        blob[i + 10 : i + 12] = struct.pack("<H", 12)  # bzip2
        rows = list(parse_zip_blob(bytes(blob)))
        assert "method 12" in rows[0]["error"]
        assert rows[1]["error"] is None

    def test_zip_bomb_budget(self):
        """A directory entry declaring a huge inflated size is refused
        BEFORE decompression; a member that actually inflates past its
        declared size errors too."""
        blob = bytearray(encode_zip([("x", b"a" * 100)]))
        i = blob.index(b"PK\x01\x02")
        blob[i + 24 : i + 28] = struct.pack("<I", 2 << 30)  # usize claim
        rows = list(parse_zip_blob(bytes(blob)))
        assert "budget" in rows[0]["error"]
        # understate the size: inflation past the claim must error, not
        # silently truncate
        blob = bytearray(encode_zip([("x", b"a" * 1000)]))
        i = blob.index(b"PK\x01\x02")
        blob[i + 24 : i + 28] = struct.pack("<I", 10)
        rows = list(parse_zip_blob(bytes(blob)))
        assert rows[0]["error"] is not None

    def test_zip_bomb_declared_zero_size(self):
        """usize=0 must not mean 'unlimited': zlib treats max_length=0
        as no limit, so a deflate member declaring zero inflated size
        could allocate its full expansion before the mismatch check
        (round-10 ADVICE). The bounded call errors after one byte."""
        blob = bytearray(encode_zip([("x", b"a" * 500_000)]))
        i = blob.index(b"PK\x01\x02")
        blob[i + 24 : i + 28] = struct.pack("<I", 0)  # declare usize=0
        rows = list(parse_zip_blob(bytes(blob)))
        assert rows[0]["error"] is not None
        assert rows[0].get("body") is None
        # a genuinely-empty deflate member with usize=0 still parses
        blob = encode_zip([("e", b"")])
        rows = list(parse_zip_blob(blob))
        assert rows[0]["error"] is None and rows[0]["body"] == b""


def test_spark_member_explode(spark):
    blob_ok = encode_zip(MEMBERS)
    df = spark.createDataFrame(
        [(1, bytearray(blob_ok)), (2, bytearray(b"junk")), (3, None)],
        "archive_id long, blob binary",
    )
    rows = parse_zip_members(df, "blob", id_cols=("archive_id",)).collect()
    by_arch: dict = {}
    for r in rows:
        by_arch.setdefault(r.archive_id, []).append(r)
    assert len(by_arch[1]) == 4
    assert [(r.name, bytes(r.body)) for r in
            sorted(by_arch[1], key=lambda r: r.member_index)] == MEMBERS
    assert len(by_arch[2]) == 1 and by_arch[2][0].error
    assert len(by_arch[3]) == 1 and "NULL" in by_arch[3][0].error


def test_empty_archive_is_zero_rows_not_error():
    assert list(parse_zip_blob(encode_zip([]))) == []


class TestZip64:
    """Round 10: the ZIP64 structures every >4 GiB / >65535-member
    archive carries, forced at fixture size so the 8-byte path is
    actually exercised."""

    def test_round_trip_and_stdlib_interop_both_ways(self):
        import io
        import zipfile

        blob = encode_zip(MEMBERS, zip64=True)
        rows = list(parse_zip_blob(blob))
        assert [(r["name"], r["body"]) for r in rows] == MEMBERS
        assert all(r["error"] is None for r in rows)
        zf = zipfile.ZipFile(io.BytesIO(blob))
        assert [(i.filename, zf.read(i)) for i in zf.infolist()] == MEMBERS
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as w:
            for name, payload in MEMBERS:
                with w.open(name, "w", force_zip64=True) as f:
                    f.write(payload)
        rows = list(parse_zip_blob(buf.getvalue()))
        assert [(r["name"], r["body"]) for r in rows] == MEMBERS

    def test_sentinels_and_locator_are_real(self):
        blob = encode_zip(MEMBERS, zip64=True)
        assert b"PK\x06\x06" in blob and b"PK\x06\x07" in blob
        # classic EOCD counts are maxed — a reader ignoring ZIP64
        # would see 0xFFFF members
        i = blob.rfind(b"PK\x05\x06")
        assert blob[i + 10 : i + 12] == b"\xff\xff"

    def test_damaged_locator_is_structural_error(self):
        blob = bytearray(encode_zip(MEMBERS, zip64=True))
        i = bytes(blob).rfind(b"PK\x06\x06")
        blob[i] ^= 0xFF
        rows = list(parse_zip_blob(bytes(blob)))
        assert rows[0]["error"] is not None
        assert "ZIP64" in rows[0]["error"]

    def test_maxed_field_without_extra_is_member_error(self):
        """A 0xFFFFFFFF sentinel whose ZIP64 extra is missing must be
        that member's typed error, not a misread."""
        blob = bytearray(encode_zip(MEMBERS))  # classic
        i = blob.index(b"PK\x01\x02")
        # max out the first entry's uncompressed size
        blob[i + 24 : i + 28] = b"\xff\xff\xff\xff"
        rows = list(parse_zip_blob(bytes(blob)))
        assert rows[0]["error"] is not None
        assert "ZIP64 extra" in rows[0]["error"]
        assert rows[1]["error"] is None  # sibling member unaffected
