"""tar / tar.gz / tar.xz / tar.bz2 archive ingestion: parse tarball
blobs into member rows — the third dataset-dump container beside WARC
(sources/warc.py) and ZIP (sources/zipsrc.py); most published corpora
ship as ``.tar.gz``, with ``.tar.xz``/``.tar.bz2`` (round 10, stdlib
lzma/bz2 under the same pre-allocation budget) covering the rest of
the stream-compressor set.

Format facts (public: POSIX.1-1988 ustar + the GNU/pax extensions a
parser must at least SKIP): 512-byte header blocks — name(100)
mode(8) uid(8) gid(8) size(12, octal, space/NUL terminated) mtime(12)
chksum(8) typeflag(1) linkname(100) magic(6 'ustar') ... prefix(155)
— followed by ceil(size/512) data blocks; two zero blocks end the
archive. The header checksum is the octal sum of the header bytes
with the checksum field read as spaces, VERIFIED here so bit rot
surfaces as that member's error row. Regular files ('0'/NUL) yield
body rows; directories/symlinks yield body-less typed rows; pax/GNU
longname headers ('x'/'g'/'L'/'K') are consumed as metadata for the
FOLLOWING member (longname applied, pax path honored). Gzip wrapping
is sniffed from the 1f 8b magic and inflated with a size budget
BEFORE parsing (a tiny .tar.gz bomb must not allocate gigabytes).

Spark-first shape: one ``mapInPandas`` pass over (id, blob) columns,
no shuffle, parallelism = archive files; the warc/zip error contract
(structural damage = one error row, per-member damage isolated).

No counterpart in the reference; ingestion-surface extension.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["encode_tar", "gunzip_concat", "parse_tar_members"]

MAX_MEMBERS = 100_000
MAX_MEMBER_BYTES = 1 << 30   # per-member budget
MAX_ARCHIVE_BYTES = 4 << 30  # inflated-archive budget (gzip bombs)

MEMBER_FIELDS = [
    StructField("member_index", IntegerType()),
    StructField("name", StringType()),
    StructField("typeflag", StringType()),
    StructField("size", LongType()),
    StructField("body", BinaryType()),
    StructField("error", StringType()),
]


def _octal(field: bytes) -> int:
    s = field.split(b"\x00")[0].strip(b" \x00")
    return int(s or b"0", 8)


def _header(name: str, size: int, typeflag: bytes = b"0") -> bytes:
    nb = name.encode("utf-8")
    if len(nb) > 100:
        raise ValueError("name longer than 100 bytes (use pax in tests)")
    h = bytearray(512)
    h[0 : len(nb)] = nb
    h[100:108] = b"0000644\x00"
    h[108:116] = b"0000000\x00"
    h[116:124] = b"0000000\x00"
    h[124:136] = f"{size:011o}\x00".encode()
    h[136:148] = b"00000000000\x00"  # mtime 0: deterministic archives
    h[148:156] = b" " * 8  # checksum placeholder
    h[156:157] = typeflag
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    chk = sum(h)
    h[148:156] = f"{chk:06o}\x00 ".encode()
    return bytes(h)


def encode_tar(
    members: list[tuple[str, bytes]],
    gzipped: bool = False,
    compression: str | None = None,
) -> bytes:
    """Serialize ``(name, payload)`` pairs as a POSIX ustar blob (the
    writer half of the round trip). ``compression`` wraps the result:
    ``"gz"`` (gzip, also reachable via the legacy ``gzipped=True``),
    ``"xz"`` (.tar.xz), or ``"bz2"`` (.tar.bz2) — the three stream
    compressors real dataset dumps arrive under, all stdlib."""
    if gzipped:
        if compression not in (None, "gz"):
            raise ValueError("conflicting compression arguments")
        compression = "gz"
    out = bytearray()
    for name, payload in members:
        out += _header(name, len(payload))
        out += payload
        pad = (-len(payload)) % 512
        out += b"\x00" * pad
    out += b"\x00" * 1024
    if compression == "gz":
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + 15)
        return co.compress(bytes(out)) + co.flush()
    if compression == "xz":
        import lzma

        return lzma.compress(bytes(out), format=lzma.FORMAT_XZ)
    if compression == "bz2":
        import bz2

        return bz2.compress(bytes(out))
    if compression is not None:
        raise ValueError(f"unknown compression {compression!r}")
    return bytes(out)


def gunzip_concat(blob: bytes, max_bytes: int) -> bytes:
    """Inflate a gzip stream of one or MORE members (gzip, pigz, and
    the CommonCrawl .warc.gz convention all emit concatenated
    members; a single decompressobj pass silently DROPS everything
    after the first member via ``unused_data`` — the round-10 fix).
    The budget is cumulative across members and enforced with
    max_length so output past it is never materialized."""
    out = bytearray()
    rest = blob
    while rest[:2] == b"\x1f\x8b":
        dobj = zlib.decompressobj(16 + 15)
        out += dobj.decompress(rest, max_bytes - len(out) + 1)
        if len(out) > max_bytes:
            raise ValueError("gzip payload exceeds archive budget")
        if not dobj.eof:
            raise ValueError("truncated gzip member")
        rest = dobj.unused_data
    if rest.strip(b"\x00"):
        raise ValueError("trailing garbage after gzip members")
    return bytes(out)


def _xz_concat(blob: bytes, max_bytes: int) -> bytes:
    """Decompress one or MORE concatenated xz streams (``xz -T``,
    ``pixz``, and plain ``cat a.xz b.xz`` all emit one stream per
    block/file; a single LZMADecompressor stops at the first stream's
    end and leaves the rest in ``unused_data`` — silently truncating
    the archive). The budget is cumulative across streams; xz stream
    padding (NUL bytes between/after streams, xz spec §2.1) is
    tolerated."""
    import lzma

    out = bytearray()
    rest = blob
    while rest[:6] == b"\xfd7zXZ\x00":
        d = lzma.LZMADecompressor(format=lzma.FORMAT_XZ)
        out += d.decompress(rest, max_bytes - len(out) + 1)
        if len(out) > max_bytes:
            raise ValueError("xz payload exceeds archive budget")
        if not d.eof:
            raise ValueError("truncated xz stream")
        rest = d.unused_data.lstrip(b"\x00")
    if rest:
        raise ValueError("trailing garbage after xz streams")
    return bytes(out)


def _bz2_concat(blob: bytes, max_bytes: int) -> bytes:
    """Decompress one or MORE concatenated bz2 streams (``pbzip2``
    emits one stream per block; ``cat a.bz2 b.bz2`` is valid input to
    ``bunzip2``). Same loop-over-``unused_data`` discipline as
    :func:`gunzip_concat`, cumulative budget."""
    import bz2

    out = bytearray()
    rest = blob
    while rest[:3] == b"BZh":
        d = bz2.BZ2Decompressor()
        out += d.decompress(rest, max_bytes - len(out) + 1)
        if len(out) > max_bytes:
            raise ValueError("bz2 payload exceeds archive budget")
        if not d.eof:
            raise ValueError("truncated bz2 stream")
        rest = d.unused_data.lstrip(b"\x00")
    if rest:
        raise ValueError("trailing garbage after bz2 streams")
    return bytes(out)


def _verify_checksum(block: bytes) -> None:
    stored = _octal(block[148:156])
    computed = sum(block) - sum(block[148:156]) + 8 * 0x20
    if stored != computed:
        raise ValueError(
            f"header checksum mismatch ({stored} != {computed})"
        )


def parse_tar_blob(blob: bytes) -> Iterator[dict]:
    """Yield one dict per member (MEMBER_FIELDS shape); gzip-wrapped
    archives are inflated (budgeted) first. Structural damage yields
    one error row; per-member damage is isolated."""

    def err(idx, msg):
        return {
            "member_index": idx, "name": None, "typeflag": None,
            "size": None, "body": None, "error": msg,
        }

    if blob[:2] == b"\x1f\x8b":
        try:
            blob = gunzip_concat(blob, MAX_ARCHIVE_BYTES)
        except (zlib.error, ValueError) as exc:
            yield err(None, f"gzip inflate failed: {exc}")
            return
    elif blob[:6] == b"\xfd7zXZ\x00":
        import lzma

        try:
            blob = _xz_concat(blob, MAX_ARCHIVE_BYTES)
        except (lzma.LZMAError, ValueError) as exc:
            yield err(None, f"xz decompress failed: {exc}")
            return
    elif blob[:3] == b"BZh":
        try:
            blob = _bz2_concat(blob, MAX_ARCHIVE_BYTES)
        except (OSError, ValueError) as exc:
            yield err(None, f"bz2 decompress failed: {exc}")
            return
    if len(blob) % 512:
        yield err(None, f"not block-aligned ({len(blob)} bytes)")
        return
    pos = 0
    idx = 0
    pending_name: str | None = None
    while pos + 512 <= len(blob):
        block = blob[pos : pos + 512]
        pos += 512
        if block == b"\x00" * 512:
            break  # end-of-archive marker
        if idx >= MAX_MEMBERS:
            yield err(idx, f"more than {MAX_MEMBERS} members")
            return
        try:
            size = _octal(block[124:136])
        except ValueError:
            yield err(idx, "unparseable size field")
            return
        n_data = -(-size // 512) * 512
        data = blob[pos : pos + size]
        typeflag = block[156:157] or b"0"
        try:
            _verify_checksum(block)
            if size > MAX_MEMBER_BYTES:
                raise ValueError("member exceeds size budget")
            if len(data) != size:
                raise ValueError("member payload truncated")
            if typeflag in (b"L",):  # GNU longname: applies to next
                pending_name = data.rstrip(b"\x00").decode(
                    "utf-8", errors="replace"
                )
                pos += n_data
                continue
            if typeflag in (b"x", b"g", b"K"):  # pax / GNU longlink
                if typeflag == b"x":
                    # pax: 'len key=value\n' records; honor 'path'
                    for rec in data.split(b"\n"):
                        if b"=" in rec:
                            k, _, v = rec.partition(b"=")
                            k = k.split(b" ", 1)[-1]
                            if k == b"path":
                                pending_name = v.decode(
                                    "utf-8", errors="replace"
                                )
                pos += n_data
                continue
            name = pending_name or (
                block[0:100].rstrip(b"\x00").decode("utf-8",
                                                    errors="replace")
            )
            prefix = block[345:500].rstrip(b"\x00")
            if prefix and not pending_name:
                name = prefix.decode("utf-8", errors="replace") + "/" + name
            pending_name = None
            body = bytes(data) if typeflag in (b"0", b"\x00") else None
            yield {
                "member_index": idx,
                "name": name,
                "typeflag": typeflag.decode("latin1"),
                "size": size,
                "body": body,
                "error": None,
            }
        except (ValueError, struct.error) as exc:
            yield err(idx, str(exc))
            return  # a bad header desyncs block framing: stop honestly
        idx += 1
        pos += n_data


def parse_tar_members(
    df: DataFrame,
    blob_col: str,
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Explode tar/tar.gz blobs into member rows: ``id_cols`` carried
    through, plus MEMBER_FIELDS. One mapInPandas pass, work
    proportional to blob bytes, parallelism = input partitions. A
    structurally VALID but EMPTY archive contributes zero rows (it
    has zero members — that is its content, not an error)."""
    import pandas as pd

    from atiesh_spark.session import widen_for_python_stage

    base = df.select(*id_cols, blob_col)
    schema = StructType(
        [base.schema[c] for c in id_cols] + MEMBER_FIELDS
    )

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                ids = tuple(r[c] for c in id_cols)
                blob = r[blob_col]
                if blob is None:
                    out.append(ids + (None, None, None, None, None,
                                      "NULL blob"))
                    continue
                for m in parse_tar_blob(bytes(blob)):
                    out.append(ids + (
                        m["member_index"], m["name"], m["typeflag"],
                        m["size"], m["body"], m["error"],
                    ))
            yield pd.DataFrame(out, columns=cols)

    return widen_for_python_stage(base).mapInPandas(gen, schema=schema)
