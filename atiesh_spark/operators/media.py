"""Mixed-format media cataloging: magic-byte sniffing + header-only
metadata extraction over an opaque ``binary`` column.

The first pass any 100 TB multimodal ingest runs is not decode — it is
TRIAGE: what formats are in this column, what are their dimensions /
sample rates / frame counts, and which blobs are broken. This operator
answers that with HEADER walks only: PNG reads IHDR, JPEG scans
markers to SOF, GIF walks the container skipping every LZW payload at
the sub-block level, WAV and MJPEG-AVI walk RIFF chunks (AVI reads
avih only — no frame is decoded), netpbm parses the ASCII header. No pixel or sample is ever decoded, so per-blob cost is
O(header) (GIF: O(blob/255) length hops), not O(pixels) — the
difference between a metadata pass and a decode pass at scale.

Every parser raises ValueError on malformed input and the operator
converts that to ``ok = false`` with sentinel ``-1`` metadata — the
catalog is total over its input, never a task failure (the q161/q194/
q197/q200 contract). Columns are NULL-free by design: ``-1`` marks
not-applicable (images have no sample_rate), because a catalog gets
filtered and grouped and NULL-laden dimension columns poison both.

Reference parity: the reference engine treats event bodies as opaque
bytes end-to-end (its interceptors never sniff content); cataloging is
part of the beyond-reference training-data toolkit, the front door to
the real codecs in operators/{png,jpeg,gif,multimodal}.py.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from atiesh_spark.session import widen_for_python_stage
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CATALOG_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("ok", BooleanType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

_NA = -1


def sniff_format(blob: bytes) -> str:
    """Container format from the magic prefix alone (works on
    truncated blobs down to a handful of bytes): png / jpeg / gif /
    wav / avi / pnm / bmp / tiff / mpeg_audio / unknown. RIFF sub-types split on the form type
    at bytes 8:12; a RIFF blob too short to carry one sniffs as wav
    (the dominant RIFF in ingest, and what this sniffer returned
    before AVI support — q203's truncated-blob fixture relies on it)."""
    if blob.startswith(b"\x89PNG"):
        return "png"
    if blob.startswith(b"\xff\xd8"):
        return "jpeg"
    if blob.startswith(b"GIF8"):
        return "gif"
    if blob.startswith(b"RIFF"):
        return "avi" if blob[8:12] == b"AVI " else "wav"
    if blob[:2] in (b"P5", b"P6"):
        return "pnm"
    if blob.startswith(b"BM"):
        return "bmp"
    if blob[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if len(blob) >= 2 and blob[0] == 0xFF and blob[1] & 0xF0 == 0xF0:
        # 12-bit MPEG audio sync (after the JPEG \xff\xd8 branch, so
        # no clash); round 10, paired with operators/mpeg_audio.py
        return "mpeg_audio"
    return "unknown"


def _png_header(blob: bytes) -> tuple[int, int]:
    if len(blob) < 33 or blob[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("png header truncated")
    (ln,) = struct.unpack(">I", blob[8:12])
    if ln != 13 or blob[12:16] != b"IHDR":
        raise ValueError("first chunk not a 13-byte IHDR")
    w, h = struct.unpack(">II", blob[16:24])
    if not w or not h:
        raise ValueError("zero png dimension")
    return w, h


def _jpeg_header(blob: bytes) -> tuple[int, int]:
    """Walk markers to the first SOF0/SOF2 frame header."""
    if len(blob) < 4 or blob[:2] != b"\xff\xd8":
        raise ValueError("not a jpeg")
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("marker desync")
        marker = blob[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (size,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
        if size < 2 or pos + 2 + size > len(blob):
            raise ValueError("jpeg segment truncated")
        if marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if size < 7:
                raise ValueError("SOF too short")
            h, w = struct.unpack(">HH", blob[pos + 5 : pos + 9])
            if not w or not h:
                raise ValueError("zero jpeg dimension")
            return w, h
        if marker == 0xDA:  # SOS before any SOF: malformed
            break
        pos += 2 + size
    raise ValueError("no SOF marker before scan data")


def _gif_header(blob: bytes) -> tuple[int, int, int]:
    """(logical_w, logical_h, n_frames) by structural walk; LZW
    payloads are hopped via sub-block length bytes, never decoded."""
    if len(blob) < 13 or blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif header truncated")
    w, h = struct.unpack("<HH", blob[6:10])
    packed = blob[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    frames = 0
    while True:
        if pos >= len(blob):
            raise ValueError("gif missing trailer")
        b = blob[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:
            pos += 1
        elif b == 0x2C:
            if pos + 9 > len(blob):
                raise ValueError("gif descriptor truncated")
            fpacked = blob[pos + 8]
            pos += 9
            if fpacked & 0x80:
                pos += 3 * (2 << (fpacked & 0x07))
            pos += 1  # LZW min code size
            frames += 1
        else:
            raise ValueError(f"gif unknown block 0x{b:02x}")
        while True:  # hop sub-blocks (extension or image data)
            if pos >= len(blob):
                raise ValueError("gif sub-blocks truncated")
            ln = blob[pos]
            pos += 1
            if ln == 0:
                break
            pos += ln
    if not frames:
        raise ValueError("gif has no frames")
    return w, h, frames


def _wav_header(blob: bytes) -> tuple[int, int]:
    """(sample_rate, n_frames) from the RIFF chunk walk — the data
    payload's SIZE is read, its bytes are not touched."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        if pos + 8 + size > len(blob):
            raise ValueError(f"chunk {cid!r} truncated")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", blob[pos + 8 : pos + 24])
            if fmt[0] == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
                if size < 40:
                    raise ValueError("extensible fmt chunk too short")
                (sub,) = struct.unpack(
                    "<H", blob[pos + 32 : pos + 34]
                )
                fmt = (sub,) + fmt[1:]
        elif cid == b"data":
            data_size = size
            break
        pos += 8 + size + (size & 1)
    if fmt is None or data_size is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    # the uncompressed layouts decode_wav reads (round 9): PCM16,
    # PCM8, IEEE float32, G.711 A-law / mu-law
    if (audio_format, bits) not in (
        (1, 16), (1, 8), (3, 32), (6, 8), (7, 8)
    ):
        raise ValueError("unsupported wav format")
    if channels < 1 or sample_rate < 1:
        raise ValueError("unsupported wav format")
    bpf = channels * bits // 8
    if data_size % bpf:
        raise ValueError("data payload not frame-aligned")
    return sample_rate, data_size // bpf


def _pnm_header(blob: bytes) -> tuple[int, int]:
    head = blob[:64].split()
    if len(head) < 3 or head[0] not in (b"P5", b"P6"):
        raise ValueError("pnm header truncated")
    try:
        w, h = int(head[1]), int(head[2])
    except ValueError as exc:
        raise ValueError("pnm dims not numeric") from exc
    if w < 1 or h < 1:
        raise ValueError("zero pnm dimension")
    return w, h


def catalog_media(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """One catalog row per blob: sniffed format, header metadata, and
    an ``ok`` verdict. ``-1`` marks not-applicable or unparseable
    metadata; ``ok = false`` rows keep their sniffed format so triage
    can still group breakage by container type."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                fmt, ok = "unknown", False
                w = h = sr = nf = _NA
                try:
                    if blob is None:
                        raise ValueError("NULL blob")
                    b = bytes(blob)
                    fmt = sniff_format(b)
                    if fmt == "png":
                        w, h = _png_header(b)
                        nf = 1
                    elif fmt == "jpeg":
                        w, h = _jpeg_header(b)
                        nf = 1
                    elif fmt == "gif":
                        w, h, nf = _gif_header(b)
                    elif fmt == "wav":
                        sr, nf = _wav_header(b)
                    elif fmt == "mpeg_audio":
                        from atiesh_spark.operators.mpeg_audio import (
                            mpeg_audio_header,
                        )

                        sr, nf = mpeg_audio_header(b)
                    elif fmt == "bmp":
                        from atiesh_spark.operators.bmp import bmp_header

                        w, h = bmp_header(b)
                        nf = 1
                    elif fmt == "tiff":
                        from atiesh_spark.operators.tiff import tiff_header

                        w, h = tiff_header(b)
                        nf = 1
                    elif fmt == "avi":
                        from atiesh_spark.operators.avi import (
                            _avi_header,
                        )

                        _usec, nf, w, h = _avi_header(b)
                    elif fmt == "pnm":
                        w, h = _pnm_header(b)
                        nf = 1
                    else:
                        raise ValueError("unknown magic")
                    ok = True
                except (ValueError, struct.error, IndexError):
                    w = h = sr = nf = _NA
                out.append((mid, fmt, ok, w, h, sr, nf))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "format", "ok", "width", "height",
                    "sample_rate", "n_frames",
                ],
            )

    return widen_for_python_stage(
        df.select(F.col(id_col), F.col(blob_col))
    ).mapInPandas(
        gen, schema=CATALOG_SCHEMA
    )


def media_gate(
    catalog: DataFrame,
    min_pixels: int = 144,
    min_audio_frames: int = 320,
    min_anim_frames: int = 3,
) -> DataFrame:
    """Reason-coded admission verdict per catalog row — the media
    twin of the text pipeline's ordered-rule filters (q176): the
    FIRST failing rule names the verdict, so downstream triage can
    group drops by cause without re-deriving them. Rules, in order:

    1. ``broken``      — the catalog could not parse the blob;
    2. ``too_small``   — image area below ``min_pixels`` (tiny images
       are icons/trackers, not training signal);
    3. ``too_short``   — audio shorter than ``min_audio_frames``;
    4. ``no_motion``   — animation with fewer than ``min_anim_frames``
       frames (a 1-2 frame GIF is a still, not a clip);
    5. ``pass``.

    Pure column composition over the (already tiny) catalog — zero
    additional shuffles, codegen end-to-end; NULL-free like its
    input."""
    is_image = F.col("format").isin("png", "jpeg", "gif", "pnm")
    verdict = (
        F.when(~F.col("ok"), F.lit("broken"))
        .when(
            is_image & (F.col("width") * F.col("height") < min_pixels),
            F.lit("too_small"),
        )
        .when(
            F.col("format").isin("wav", "mpeg_audio")
            & (F.col("n_frames") < min_audio_frames),
            F.lit("too_short"),
        )
        .when(
            (F.col("format") == "gif")
            & (F.col("n_frames") < min_anim_frames),
            F.lit("no_motion"),
        )
        .otherwise(F.lit("pass"))
    )
    return catalog.select(
        "media_id", "format", verdict.alias("verdict")
    )


class StreamingMediaCatalog:
    """foreachBatch maintenance loop for the media catalog: each
    arriving micro-batch is sniffed/header-walked ONCE (only the new
    blobs — history is never re-cataloged), then upserted by media_id
    into a ``VersionedStore`` (last write wins, so a re-sent blob's
    fresh catalog row replaces its old one). Built on the versioned
    store's replay contract: a re-run batch id re-reads the same
    pre-batch state and rewrites the same output, so the loop is
    effectively-once on top of a checkpointed source.

    Per-batch work is ∝ batch size: the only touch of history is the
    media_id anti-join against a catalog whose rows are ~50 bytes —
    at 100 TB of media the catalog is GBs, and the blobs themselves
    never re-enter the pipeline.

    Usage: ``stream.writeStream.foreachBatch(cat)`` or the test
    harness's ``_replay_chunks``; read the current catalog back with
    ``cat.read(spark)``.
    """

    def __init__(self, path: str, id_col: str, blob_col: str,
                 keep_versions: int = 2) -> None:
        from atiesh_spark.sources.versioned import VersionedStore

        self.store = VersionedStore(path, keep_versions=keep_versions)
        self.id_col = id_col
        self.blob_col = blob_col

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # Within-batch dedup FIRST (the StreamingPositionalIndex /
        # StreamingBm25Index discipline): two sends of the same
        # media_id in one micro-batch would otherwise BOTH survive
        # cataloging — the anti-join only removes HISTORY rows — and
        # persist two catalog rows for one id, breaking the
        # last-write-wins keyed-state contract. One deterministic
        # blob per id survives (max by md5); a source with fetch
        # timestamps should pre-dedup on those instead.
        batch_df = batch_df.groupBy(self.id_col).agg(
            F.expr(
                f"max_by({self.blob_col}, md5({self.blob_col}))"
            ).alias(self.blob_col)
        )
        # materialize: the catalog row set is tiny and referenced twice
        # (anti-join keys + union); without this the blobs would be
        # re-sniffed once per reference
        fresh = catalog_media(
            batch_df, self.id_col, self.blob_col
        ).localCheckpoint()
        prev = self.store.read_before(spark, batch_id)
        if prev is not None:
            fresh = prev.join(
                fresh.select(F.col("media_id").alias("__mid")),
                F.col("media_id") == F.col("__mid"),
                "left_anti",
            ).unionByName(fresh)
        self.store.write(fresh, batch_id)

    def read(self, spark) -> DataFrame:
        return self.store.read(spark)
