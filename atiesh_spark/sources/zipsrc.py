"""ZIP archive ingestion: parse archive blobs into member rows.

ZIP is the other arrival container of bulk training data (dataset
dumps, scraped-site exports, submission bundles — the WARC sibling
for non-crawl corpora). A ZIP file is a sequence of local-file
records followed by a CENTRAL DIRECTORY and an End-Of-Central-
Directory (EOCD) record — plus, for any archive over 4 GiB or 65535
members (i.e. every realistically-sized dump at 100 TB), the ZIP64
EOCD record + locator and 0x0001 extra fields whose 8-byte values
replace the maxed 0xFFFFFFFF sentinels (round 10; forced-ZIP64
writer + stdlib interop tested both ways); the central directory is
the authoritative member table (the PKWARE APPNOTE rule — local headers can lie, and
streaming writers leave sizes to data descriptors), so this parser
locates the EOCD from the tail, walks the central directory, and
reads each member's payload via its local-header offset. Stored (0)
and deflate (8) members decompress with ``zlib``; every member's
CRC-32 is VERIFIED against the directory entry, so silent corruption
becomes a per-member error instead of poisoned text.

Spark-first shape: one ``mapInPandas`` pass — blobs arrive as a
binary column (``spark.read.format("binaryFile")`` over a bucket),
each task walks its own archives and emits member rows; no shuffle,
no driver involvement, parallelism = archive files. Error contract
(the codec-family / warc.py discipline): a structurally-broken
archive yields ONE error row; a broken individual member (bad CRC,
truncated payload, unsupported compression method) yields ITS error
row while sibling members still extract — at 100 TB some archive IS
damaged. Budgets: member count and per-member inflated size are
capped from the directory before any decompression (a few-KB zip
bomb must not allocate gigabytes).

No counterpart in the reference (it transports events, it does not
parse archives); extends the ingestion surface beside sources/warc.py.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["encode_zip", "parse_zip_members"]

MAX_MEMBERS = 100_000
MAX_MEMBER_BYTES = 1 << 30  # 1 GiB inflated per member

MEMBER_FIELDS = [
    StructField("member_index", IntegerType()),
    StructField("name", StringType()),
    StructField("method", IntegerType()),
    StructField("compressed_size", LongType()),
    StructField("size", LongType()),
    StructField("crc32", LongType()),
    StructField("body", BinaryType()),
    StructField("error", StringType()),
]

_EOCD_SIG = b"PK\x05\x06"
_CDIR_SIG = b"PK\x01\x02"
_LOCAL_SIG = b"PK\x03\x04"


_EOCD64_SIG = b"PK\x06\x06"
_EOCD64_LOC_SIG = b"PK\x06\x07"


def encode_zip(
    members: list[tuple[str, bytes]],
    compress: bool = True,
    zip64: bool = False,
) -> bytes:
    """Serialize ``(name, payload)`` pairs as a ZIP blob — the writer
    half of the round trip (tests + graded synthesis), byte-exact
    PKWARE framing: local headers, central directory, EOCD. ``compress``
    deflates members (raw deflate, method 8); False stores them
    (method 0). Names are UTF-8 (the language-encoding flag is set).
    ``zip64=True`` forces the ZIP64 structures any >4 GiB / >65535-
    member archive carries (APPNOTE §4.5.3/4.3.14: 0xFFFFFFFF
    sentinels with the real values in the 0x0001 extra field, EOCD64
    record + locator, maxed classic EOCD) so the reader's 8-byte
    path is testable at fixture size."""
    out = bytearray()
    central = bytearray()
    for name, payload in members:
        nb = name.encode("utf-8")
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        if compress:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw deflate
            data = co.compress(payload) + co.flush()
            method = 8
        else:
            data = payload
            method = 0
        offset = len(out)
        version = 45 if zip64 else 20
        if zip64:
            l_extra = struct.pack("<HHQQ", 0x0001, 16,
                                  len(payload), len(data))
            l_csize = l_usize = 0xFFFFFFFF
        else:
            l_extra = b""
            l_csize, l_usize = len(data), len(payload)
        local = _LOCAL_SIG + struct.pack(
            "<HHHHHIIIHH",
            version,
            0x0800,      # general purpose: UTF-8 names
            method,
            0, 0,        # dos time/date (fixed: deterministic archives)
            crc,
            l_csize,
            l_usize,
            len(nb),
            len(l_extra),
        )
        out += local + nb + l_extra + data
        if zip64:
            c_extra = struct.pack("<HHQQQ", 0x0001, 24,
                                  len(payload), len(data), offset)
            c_csize = c_usize = c_off = 0xFFFFFFFF
        else:
            c_extra = b""
            c_csize, c_usize, c_off = len(data), len(payload), offset
        central += _CDIR_SIG + struct.pack(
            "<HHHHHHIIIHHHHHII",
            45 if zip64 else 20, version,
            0x0800,
            method,
            0, 0,        # time/date
            crc,
            c_csize,
            c_usize,
            len(nb),
            len(c_extra), 0,  # extra/comment length
            0,           # disk number start
            0,           # internal attrs
            0,           # external attrs
            c_off,
        ) + nb + c_extra
    cd_offset = len(out)
    out += central
    if zip64:
        eocd64_off = len(out)
        out += _EOCD64_SIG + struct.pack(
            "<QHHIIQQQQ",
            44,          # size of remainder
            45, 45,      # version made by / needed
            0, 0,        # disk numbers
            len(members), len(members),
            len(central), cd_offset,
        )
        out += _EOCD64_LOC_SIG + struct.pack("<IQI", 0, eocd64_off, 1)
        out += _EOCD_SIG + struct.pack(
            "<HHHHIIH",
            0, 0,
            0xFFFF, 0xFFFF,
            0xFFFFFFFF, 0xFFFFFFFF,
            0,
        )
    else:
        out += _EOCD_SIG + struct.pack(
            "<HHHHIIH",
            0, 0,
            len(members), len(members),
            len(central), cd_offset,
            0,
        )
    return bytes(out)


def _zip64_extra(
    extra: bytes, usize: int, csize: int, loc_off: int
) -> tuple[int, int, int]:
    """Resolve 0xFFFFFFFF central-directory sentinels from the ZIP64
    extra field (id 0x0001): the extra carries an 8-byte value for
    EACH maxed field, in uncompressed-size / compressed-size /
    local-offset order (APPNOTE §4.5.3)."""
    pos = 0
    while pos + 4 <= len(extra):
        fid, sz = struct.unpack("<HH", extra[pos : pos + 4])
        body = extra[pos + 4 : pos + 4 + sz]
        if fid == 0x0001:
            at = 0
            out = []
            for v in (usize, csize, loc_off):
                if v == 0xFFFFFFFF:
                    if at + 8 > len(body):
                        raise ValueError("ZIP64 extra field too short")
                    v = struct.unpack("<Q", body[at : at + 8])[0]
                    at += 8
                out.append(v)
            return out[0], out[1], out[2]
        pos += 4 + sz
    raise ValueError("maxed field without a ZIP64 extra")


def _find_eocd(blob: bytes) -> int:
    """Offset of the EOCD record, searched from the tail (the comment
    field makes the EOCD position variable; APPNOTE's prescribed
    scan)."""
    # EOCD is 22 bytes + comment (<= 65535)
    start = max(0, len(blob) - 22 - 0xFFFF)
    i = blob.rfind(_EOCD_SIG, start)
    if i < 0:
        raise ValueError("no end-of-central-directory record")
    return i


def parse_zip_blob(blob: bytes) -> Iterator[dict]:
    """Yield one dict per member (MEMBER_FIELDS shape). A structural
    defect yields a single error row; per-member damage yields that
    member's error row and continues."""
    try:
        if len(blob) < 22:
            raise ValueError("too short for a ZIP")
        eocd = _find_eocd(blob)
        # EOCD: sig(4) disk(2) cd_disk(2) n_disk(2) n_total(2)
        #       cd_size(4) cd_offset(4) comment_len(2)
        (n_members,) = struct.unpack("<H", blob[eocd + 10 : eocd + 12])
        cd_size, cd_offset = struct.unpack(
            "<II", blob[eocd + 12 : eocd + 20]
        )
        # ZIP64 (APPNOTE §4.3.15): a locator immediately precedes the
        # EOCD when any classic field is maxed; follow it to the
        # EOCD64 record for the 8-byte counts/offsets. Any archive
        # over 4 GiB or 65535 members arrives this way.
        loc = eocd - 20
        if loc >= 0 and blob[loc : loc + 4] == _EOCD64_LOC_SIG:
            (_disk, e64_off, _ndisks) = struct.unpack(
                "<IQI", blob[loc + 4 : loc + 20]
            )
            if e64_off + 56 > len(blob) or \
                    blob[e64_off : e64_off + 4] != _EOCD64_SIG:
                raise ValueError("bad ZIP64 EOCD locator")
            (_sz, _vm, _vn, _d1, _d2, _n_disk, n64,
             cd_size64, cd_off64) = struct.unpack(
                "<QHHIIQQQQ", blob[e64_off + 4 : e64_off + 56]
            )
            if n64 > MAX_MEMBERS:
                raise ValueError(f"more than {MAX_MEMBERS} members")
            n_members, cd_size, cd_offset = n64, cd_size64, cd_off64
        if n_members > MAX_MEMBERS:
            raise ValueError(f"more than {MAX_MEMBERS} members")
        if cd_offset + cd_size > len(blob):
            raise ValueError("central directory overruns blob")
    except ValueError as exc:
        yield {
            "member_index": None, "name": None, "method": None,
            "compressed_size": None, "size": None, "crc32": None,
            "body": None, "error": str(exc),
        }
        return
    pos = cd_offset
    for idx in range(n_members):
        row = {
            "member_index": idx, "name": None, "method": None,
            "compressed_size": None, "size": None, "crc32": None,
            "body": None, "error": None,
        }
        try:
            if blob[pos : pos + 4] != _CDIR_SIG:
                raise ValueError("central directory entry signature bad")
            (
                _vm, _vn, _flags, method, _t, _d, crc, csize, usize,
                nlen, xlen, clen, _disk, _iattr, _eattr, loc_off,
            ) = struct.unpack("<HHHHHHIIIHHHHHII", blob[pos + 4 : pos + 46])
            name = blob[pos + 46 : pos + 46 + nlen].decode(
                "utf-8", errors="replace"
            )
            extra = blob[pos + 46 + nlen : pos + 46 + nlen + xlen]
            # advance FIRST so a bad entry errors alone instead of
            # cascading to every following member
            pos += 46 + nlen + xlen + clen
            if 0xFFFFFFFF in (usize, csize, loc_off):
                # ZIP64 extra field 0x0001: 8-byte values for exactly
                # the maxed fields, in usize/csize/offset order
                usize, csize, loc_off = _zip64_extra(
                    extra, usize, csize, loc_off,
                )
            row.update(
                name=name, method=method, compressed_size=csize,
                size=usize, crc32=crc,
            )
            if method not in (0, 8):
                raise ValueError(f"unsupported compression method {method}")
            if usize > MAX_MEMBER_BYTES:
                raise ValueError("member exceeds inflated-size budget")
            if blob[loc_off : loc_off + 4] != _LOCAL_SIG:
                raise ValueError("local header signature bad")
            lnlen, lxlen = struct.unpack(
                "<HH", blob[loc_off + 26 : loc_off + 30]
            )
            dstart = loc_off + 30 + lnlen + lxlen
            if dstart + csize > len(blob):
                raise ValueError("member payload truncated")
            data = blob[dstart : dstart + csize]
            if method == 8:
                dobj = zlib.decompressobj(-15)
                # max_length=0 means UNLIMITED to zlib, so a member
                # declaring usize=0 would inflate fully before the
                # size-mismatch check — bound it at >=1 byte so a
                # zero-declared bomb trips the overrun check after one
                # byte instead of exhausting memory (round-10 ADVICE).
                body = dobj.decompress(data, max(usize, 1))
                if dobj.unconsumed_tail and dobj.decompress(
                    dobj.unconsumed_tail, 1
                ):
                    raise ValueError("member inflates past declared size")
                body += dobj.flush()
            else:
                body = data
            if len(body) != usize:
                raise ValueError(
                    f"member inflated to {len(body)}, declared {usize}"
                )
            if zlib.crc32(body) & 0xFFFFFFFF != crc:
                raise ValueError("member CRC-32 mismatch")
            row["body"] = body
        except (ValueError, zlib.error, struct.error, IndexError) as exc:
            row["error"] = str(exc)
        yield row


def parse_zip_members(
    df: DataFrame,
    blob_col: str,
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Explode ZIP blobs into member rows: ``id_cols`` carried
    through, plus MEMBER_FIELDS. One mapInPandas pass, work
    proportional to blob bytes, parallelism = input partitions. A
    structurally VALID but EMPTY archive contributes zero rows (it
    has zero members — that is its content, not an error)."""
    import pandas as pd

    from atiesh_spark.session import widen_for_python_stage

    base = df.select(*id_cols, blob_col)
    id_fields = [base.schema[c] for c in id_cols]
    schema = StructType(id_fields + MEMBER_FIELDS)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                ids = tuple(r[c] for c in id_cols)
                blob = r[blob_col]
                if blob is None:
                    out.append(ids + (None, None, None, None, None,
                                      None, None, "NULL blob"))
                    continue
                for m in parse_zip_blob(bytes(blob)):
                    out.append(ids + (
                        m["member_index"], m["name"], m["method"],
                        m["compressed_size"], m["size"], m["crc32"],
                        m["body"], m["error"],
                    ))
            yield pd.DataFrame(out, columns=cols)

    return widen_for_python_stage(base).mapInPandas(gen, schema=schema)
