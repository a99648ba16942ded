"""WARC record ingestion: parse crawl-archive blobs into record rows.

WARC (ISO 28500, the CommonCrawl container) is the arrival format of
web-scale training data: a ``.warc`` file is a concatenation of
records, each a version line + CRLF header block + ``Content-Length``
bytes of payload + a CRLF CRLF separator. The pipeline's first move is
splitting those blobs into per-record rows; everything downstream
(q211 HTML extraction, q144 URL canonicalization, dedup, quality) is
relational.

Spark-first shape: one ``mapInPandas`` pass — blobs arrive as a binary
column (e.g. from ``spark.read.format("binaryFile")``), each task
parses its own blobs sequentially and emits record rows; no shuffle,
no driver involvement, parallelism = input files. The parser follows
the codec-family contract (operators/jpeg.py): a malformed blob yields
an ERROR ROW naming the defect at the failing record index — never a
raised exception that would kill the task, because at 100 TB some
archive IS truncated.

Only the record-structure layer lives here (version line, header
block, Content-Length framing). Header field semantics beyond
``WARC-Type``/``WARC-Target-URI`` stay in the output map for callers.

No counterpart in the reference (it transports events, it does not
parse archives); extends the ingestion surface like ``sources/
http_push.py``.
"""

from __future__ import annotations

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

_CRLF2 = b"\r\n\r\n"

RECORD_FIELDS = [
    StructField("rec_index", IntegerType()),
    StructField("warc_type", StringType()),
    StructField("target_uri", StringType()),
    StructField("content_length", LongType()),
    StructField("body", BinaryType()),
    StructField("error", StringType()),
]


def encode_warc_records(
    records: list[tuple[str, bytes]], gzipped: bool = False
) -> bytes:
    """Serialize ``(target_uri, payload)`` pairs as a WARC/1.0 blob.

    The writer half of the round trip: tests and the graded query
    synthesize archives with it, and its output is byte-exact ISO
    28500 framing (version line, CRLF headers, Content-Length payload,
    CRLF CRLF separator) so ``parse_warc_blob`` is exercised on the
    real wire shape. ``gzipped=True`` writes the ``.warc.gz``
    convention CommonCrawl actually ships: each record is its OWN
    gzip member and the file is the member concatenation (record-
    granular range requests are why crawls store it this way).
    """
    import zlib

    out = bytearray()
    for uri, payload in records:
        header = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            f"\r\n"
        ).encode("utf-8")
        rec = header + payload + _CRLF2
        if gzipped:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + 15)
            out += co.compress(rec) + co.flush()
        else:
            out += rec
    return bytes(out)


def parse_warc_blob(blob: bytes) -> Iterator[dict]:
    """Yield one dict per record (RECORD_FIELDS shape). A structural
    defect yields a final error row and stops — offsets after a
    framing violation are garbage, resync is guesswork. ``.warc.gz``
    blobs (the 1f 8b magic) are inflated first via the multi-member
    loop in sources/tarsrc.gunzip_concat — CommonCrawl writes one
    gzip member PER RECORD, so a single-member inflate would silently
    drop every record after the first."""
    if blob[:2] == b"\x1f\x8b":
        import zlib

        from atiesh_spark.sources.tarsrc import (
            MAX_ARCHIVE_BYTES,
            gunzip_concat,
        )

        try:
            blob = gunzip_concat(blob, MAX_ARCHIVE_BYTES)
        except (zlib.error, ValueError) as exc:
            yield _err(0, f"gzip inflate failed: {exc}")
            return
    pos, idx, n = 0, 0, len(blob)
    while pos < n:
        if not blob.startswith(b"WARC/", pos):
            yield _err(idx, f"bad magic at offset {pos}")
            return
        hdr_end = blob.find(_CRLF2, pos)
        if hdr_end < 0:
            yield _err(idx, "unterminated header block")
            return
        headers: dict[str, str] = {}
        lines = blob[pos:hdr_end].split(b"\r\n")
        for line in lines[1:]:  # lines[0] is the version line
            key, sep, val = line.partition(b": ")
            if not sep:
                yield _err(idx, f"malformed header line {line[:40]!r}")
                return
            headers[key.decode("utf-8", "replace").lower()] = val.decode(
                "utf-8", "replace"
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            yield _err(idx, "missing or non-integer Content-Length")
            return
        if clen < 0:
            yield _err(idx, "negative Content-Length")
            return
        body_start = hdr_end + len(_CRLF2)
        body_end = body_start + clen
        if body_end + len(_CRLF2) > n:
            yield _err(idx, f"truncated record: need {clen} payload bytes")
            return
        if blob[body_end : body_end + len(_CRLF2)] != _CRLF2:
            yield _err(idx, "missing record separator after payload")
            return
        yield {
            "rec_index": idx,
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "content_length": clen,
            "body": blob[body_start:body_end],
            "error": None,
        }
        pos = body_end + len(_CRLF2)
        idx += 1


def _err(idx: int, msg: str) -> dict:
    return {
        "rec_index": idx,
        "warc_type": None,
        "target_uri": None,
        "content_length": None,
        "body": None,
        "error": msg,
    }


def parse_warc_records(
    df: DataFrame,
    blob_col: str,
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Explode WARC blobs into record rows: ``id_cols`` carried
    through, plus RECORD_FIELDS. One mapInPandas pass, work
    proportional to blob bytes, parallelism = input partitions."""
    import pandas as pd

    from atiesh_spark.session import widen_for_python_stage

    carried = widen_for_python_stage(
        df.select(*id_cols, F.col(blob_col).alias("_blob"))
    )
    schema = StructType(
        [carried.schema[c] for c in id_cols] + RECORD_FIELDS
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                ids = {c: pdf[c].iloc[i] for c in id_cols}
                blob = pdf["_blob"].iloc[i]
                if not isinstance(blob, bytes):
                    blob = bytes(blob)
                for parsed in parse_warc_blob(blob):
                    rows.append({**ids, **parsed})
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            ) if rows else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in schema.fields}
            )

    return carried.mapInPandas(gen, schema)
