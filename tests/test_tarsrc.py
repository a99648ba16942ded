"""tar / tar.gz ingestion (sources/tarsrc.py): writer/parser round
trip, stdlib-tarfile interop BOTH ways (including pax long paths),
checksum verification, budgets, and the Spark explode path."""

import io
import tarfile

import pytest

from atiesh_spark.sources.tarsrc import (
    encode_tar,
    parse_tar_blob,
    parse_tar_members,
)

MEMBERS = [
    ("a.txt", b"hello " * 100),
    ("d/b.bin", bytes(range(256))),
    ("empty", b""),
    ("unié.txt", "café €".encode()),
]


class TestRoundTrip:
    @pytest.mark.parametrize("gz", [False, True])
    def test_ours_to_ours_and_stdlib_reads_ours(self, gz):
        blob = encode_tar(MEMBERS, gzipped=gz)
        rows = list(parse_tar_blob(blob))
        assert [(r["name"], r["body"]) for r in rows] == MEMBERS
        assert all(r["error"] is None for r in rows)
        tf = tarfile.open(
            fileobj=io.BytesIO(blob), mode="r:gz" if gz else "r:"
        )
        assert [(m.name, tf.extractfile(m).read())
                for m in tf.getmembers()] == MEMBERS

    def test_ours_reads_stdlib_pax(self):
        """tarfile's default PAX format emits 'x' extended headers our
        parser must consume (and honor 'path' records)."""
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as t:
            for n, b in MEMBERS:
                ti = tarfile.TarInfo(n)
                ti.size = len(b)
                t.addfile(ti, io.BytesIO(b))
        rows = list(parse_tar_blob(buf.getvalue()))
        assert [(r["name"], r["body"]) for r in rows] == MEMBERS

    def test_pax_long_path(self):
        long = "very/" * 30 + "deep.txt"
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w",
                          format=tarfile.PAX_FORMAT) as t:
            ti = tarfile.TarInfo(long)
            ti.size = 3
            t.addfile(ti, io.BytesIO(b"abc"))
        rows = list(parse_tar_blob(buf.getvalue()))
        assert rows[0]["name"] == long and rows[0]["body"] == b"abc"

    def test_gnu_longname(self):
        long = "gnu/" * 40 + "name.bin"
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w",
                          format=tarfile.GNU_FORMAT) as t:
            ti = tarfile.TarInfo(long)
            ti.size = 2
            t.addfile(ti, io.BytesIO(b"ok"))
        rows = list(parse_tar_blob(buf.getvalue()))
        assert rows[0]["name"] == long and rows[0]["body"] == b"ok"

    def test_directories_are_typed_bodyless_rows(self):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w",
                          format=tarfile.USTAR_FORMAT) as t:
            ti = tarfile.TarInfo("adir/")
            ti.type = tarfile.DIRTYPE
            t.addfile(ti)
            fi = tarfile.TarInfo("adir/f")
            fi.size = 1
            t.addfile(fi, io.BytesIO(b"x"))
        rows = list(parse_tar_blob(buf.getvalue()))
        assert rows[0]["typeflag"] == "5" and rows[0]["body"] is None
        assert rows[1]["body"] == b"x"


class TestErrors:
    def test_checksum_damage(self):
        blob = bytearray(encode_tar(MEMBERS))
        blob[0] ^= 0xFF
        rows = list(parse_tar_blob(bytes(blob)))
        assert "checksum" in rows[0]["error"]

    def test_misaligned_and_truncated(self):
        assert "block-aligned" in list(parse_tar_blob(b"x" * 100))[0]["error"]
        blob = encode_tar(MEMBERS)
        rows = list(parse_tar_blob(blob[:1024]))
        assert any(r["error"] for r in rows)

    def test_gzip_bomb_budget(self):
        import zlib

        from atiesh_spark.sources import tarsrc

        co = zlib.compressobj(9, zlib.DEFLATED, 16 + 15)
        bomb = co.compress(b"\x00" * (1 << 20)) + co.flush()
        old = tarsrc.MAX_ARCHIVE_BYTES
        tarsrc.MAX_ARCHIVE_BYTES = 1 << 16
        try:
            rows = list(parse_tar_blob(bomb))
        finally:
            tarsrc.MAX_ARCHIVE_BYTES = old
        assert rows[0]["error"] is not None


def test_spark_member_explode(spark):
    df = spark.createDataFrame(
        [(1, bytearray(encode_tar(MEMBERS, gzipped=True))),
         (2, bytearray(b"not a tar, wrong size")),
         (3, None)],
        "archive_id long, blob binary",
    )
    rows = parse_tar_members(df, "blob", id_cols=("archive_id",)).collect()
    by_arch: dict = {}
    for r in rows:
        by_arch.setdefault(r.archive_id, []).append(r)
    assert [(r.name, bytes(r.body)) for r in
            sorted(by_arch[1], key=lambda r: r.member_index)] == MEMBERS
    assert len(by_arch[2]) == 1 and by_arch[2][0].error
    assert len(by_arch[3]) == 1 and "NULL" in by_arch[3][0].error


def test_empty_archive_is_zero_rows_not_error():
    assert list(parse_tar_blob(encode_tar([]))) == []
    assert list(parse_tar_blob(encode_tar([], gzipped=True))) == []


class TestXzBz2:
    """Round 10: the remaining stream compressors dataset dumps
    arrive under — .tar.xz and .tar.bz2 (stdlib lzma / bz2), same
    budget discipline as gzip."""

    @pytest.mark.parametrize("comp,mode", [("xz", "r:xz"),
                                           ("bz2", "r:bz2")])
    def test_round_trip_and_stdlib_interop(self, comp, mode):
        blob = encode_tar(MEMBERS, compression=comp)
        rows = list(parse_tar_blob(blob))
        assert [(r["name"], r["body"]) for r in rows] == MEMBERS
        assert all(r["error"] is None for r in rows)
        tf = tarfile.open(fileobj=io.BytesIO(blob), mode=mode)
        assert [(m.name, tf.extractfile(m).read())
                for m in tf.getmembers()] == MEMBERS
        # and stdlib-written archives read back through ours
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode=f"w:{comp}") as w:
            for name, payload in MEMBERS:
                info = tarfile.TarInfo(name)
                info.size = len(payload)
                w.addfile(info, io.BytesIO(payload))
        rows = list(parse_tar_blob(buf.getvalue()))
        assert [(r["name"], r["body"]) for r in rows] == MEMBERS

    @pytest.mark.parametrize("comp", ["xz", "bz2"])
    def test_bomb_budget(self, comp):
        import bz2 as _bz2
        import lzma as _lzma

        from atiesh_spark.sources import tarsrc

        raw = b"\x00" * (1 << 20)
        bomb = (_lzma.compress(raw) if comp == "xz"
                else _bz2.compress(raw))
        old = tarsrc.MAX_ARCHIVE_BYTES
        tarsrc.MAX_ARCHIVE_BYTES = 1 << 16
        try:
            rows = list(parse_tar_blob(bomb))
        finally:
            tarsrc.MAX_ARCHIVE_BYTES = old
        assert rows[0]["error"] is not None
        assert "budget" in rows[0]["error"]

    @pytest.mark.parametrize("comp", ["xz", "bz2"])
    def test_truncated_stream_is_error(self, comp):
        blob = encode_tar(MEMBERS, compression=comp)
        rows = list(parse_tar_blob(blob[: len(blob) // 2]))
        assert rows[0]["error"] is not None

    @pytest.mark.parametrize("comp", ["xz", "bz2"])
    def test_concatenated_streams_fully_decompress(self, comp):
        """pbzip2 / pixz / ``xz -T`` emit ONE STREAM PER BLOCK; a
        single-decompressor pass stops at the first stream's end and
        silently drops every member after it (round-11 fix, mirrors
        the round-10 gunzip_concat fix)."""
        import bz2 as _bz2
        import lzma as _lzma

        comp_fn = (
            (lambda b: _lzma.compress(b, format=_lzma.FORMAT_XZ))
            if comp == "xz" else _bz2.compress
        )
        raw = encode_tar(MEMBERS)
        # split the tar mid-archive across two independent streams,
        # like a parallel compressor's block boundary
        cut = 512 * 3
        blob = comp_fn(raw[:cut]) + comp_fn(raw[cut:])
        rows = list(parse_tar_blob(blob))
        assert [(r["name"], r["body"]) for r in rows] == MEMBERS
        assert all(r["error"] is None for r in rows)

    def test_xz_stream_padding_between_streams(self):
        """xz spec §2.1 allows NUL padding (multiple of 4) between
        and after streams — pixz writes it; tolerate it."""
        import lzma as _lzma

        raw = encode_tar(MEMBERS)
        one = _lzma.compress(raw[:512], format=_lzma.FORMAT_XZ)
        two = _lzma.compress(raw[512:], format=_lzma.FORMAT_XZ)
        blob = one + b"\x00" * 8 + two + b"\x00" * 4
        rows = list(parse_tar_blob(blob))
        assert [(r["name"], r["body"]) for r in rows] == MEMBERS

    @pytest.mark.parametrize("comp", ["xz", "bz2"])
    def test_trailing_garbage_after_streams_is_error(self, comp):
        """Non-stream bytes after the last stream must surface as an
        error row, never be silently dropped."""
        blob = encode_tar(MEMBERS, compression=comp) + b"garbage!"
        rows = list(parse_tar_blob(blob))
        assert rows[0]["error"] is not None
        assert "trailing garbage" in rows[0]["error"]

    def test_writer_arg_validation(self):
        with pytest.raises(ValueError, match="unknown compression"):
            encode_tar(MEMBERS, compression="zst")
        with pytest.raises(ValueError, match="conflicting"):
            encode_tar(MEMBERS, gzipped=True, compression="xz")
        # legacy spelling still equals the new one
        assert encode_tar(MEMBERS, gzipped=True) == encode_tar(
            MEMBERS, compression="gz")


class TestMultiMemberGzip:
    def test_concatenated_members_fully_inflate(self):
        """gzip/pigz emit concatenated members; the old single-pass
        inflate dropped everything after member 1 into unused_data
        (round-10 fix)."""
        import zlib

        from atiesh_spark.sources.tarsrc import gunzip_concat

        def gzm(b):
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + 15)
            return co.compress(b) + co.flush()

        t = encode_tar([("a", b"x" * 600)])
        half = len(t) // 2
        multi = gzm(t[:half]) + gzm(t[half:])
        rows = list(parse_tar_blob(multi))
        assert rows[0]["error"] is None and rows[0]["body"] == b"x" * 600
        assert gunzip_concat(multi, 1 << 20) == t
        with pytest.raises(ValueError, match="budget"):
            gunzip_concat(gzm(b"\x00" * 100000), 1000)
        with pytest.raises(ValueError, match="truncated"):
            gunzip_concat(gzm(b"data" * 100)[:20], 1 << 20)
        with pytest.raises(ValueError, match="garbage"):
            gunzip_concat(gzm(b"a") + b"JUNK", 1 << 20)
