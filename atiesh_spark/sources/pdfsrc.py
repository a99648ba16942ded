"""PDF text extraction: parse PDF blobs into per-page text rows.

The one bulk-ingestion container a training-data pipeline still
could not read here (r9 verdict item 4): papers, reports, and book
scans arrive as PDFs. This is a baseline parser of the PUBLIC PDF
file format (ISO 32000 / the classic Adobe PDF 1.x layout):

- **object layer** — a real tokenizer for the eight PDF object
  types (numbers, booleans, null, names, literal + hex strings,
  arrays, dictionaries) plus indirect references ``N G R`` and
  ``N G obj ... endobj`` bodies;
- **xref layer** — the cross-reference chain is walked from
  ``startxref`` through ``/Prev`` increments: classic tables AND
  PDF 1.5 cross-reference STREAMS (ISO 32000 §7.5.8: /W field
  widths, /Index subsections, type-1 offset and type-2
  in-object-stream rows, FlateDecode with the PNG row predictors
  real writers emit), plus hybrid-reference ``/XRefStm`` side
  tables; a damaged chain falls back to reconstructing offsets by
  scanning for ``N G obj`` headers — the same recovery real readers
  apply to damaged files (objects packed inside object streams are
  unreachable in fallback mode: their xref rows were the only
  pointer to them);
- **object streams** — ``/ObjStm`` containers (§7.5.7, the dominant
  modern layout) are decoded: the (objnum, offset) header pairs are
  lexed and every member parsed and cached in one pass; nesting
  (illegal per spec) is guarded as a cycle error;
- **stream layer** — ``/Length`` resolved (possibly indirect),
  ``/Filter /FlateDecode`` inflated with the zipsrc.py budget
  discipline (hard inflated-size cap BEFORE allocation, overrun =
  error), ``/DecodeParms`` PNG predictors (all five filter types)
  reversed; unfiltered streams pass through; any other filter is a
  typed per-document error;
- **document layer** — trailer ``/Root`` -> ``/Catalog`` ->
  ``/Pages`` tree walked recursively (cycle guard + depth cap),
  each ``/Page``'s ``/Contents`` (single stream or array)
  concatenated;
- **text layer** — content streams are tokenized with the same
  lexer and the text-showing operators ``Tj``, ``'``, ``"`` and
  ``TJ`` (string elements of the array) emit their strings in
  content order; literal-string escapes (``\\n \\r \\t \\b \\f \\(
  \\) \\\\``, octal ``\\ddd``, line continuations) and hex strings
  are decoded per spec; bytes are interpreted as Latin-1 (font
  encoding maps are out of baseline scope, stated here).

NOT parsed (typed error rows, never misreads): encrypted PDFs
(``/Encrypt`` in the trailer) and non-Flate filters
(DCT/LZW/ASCII85/...). Those are the same class of documented
closure as the codec lab's MP3/H.264 paragraph in COVERAGE.md.

Spark-first shape (the zipsrc/warc pattern): one ``mapInPandas``
pass, blobs never visit the driver, parallelism = PDF files; a
malformed document yields ONE error row while sibling documents in
the batch extract normally. No counterpart in the reference (it
transports events); extends the ingestion surface beside
sources/warc.py / zipsrc.py / tarsrc.py.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

__all__ = ["encode_pdf", "extract_pdf_pages", "parse_pdf_pages"]

MAX_STREAM_BYTES = 64 << 20  # inflated cap per stream
MAX_OBJECTS = 100_000
MAX_PAGES = 10_000
MAX_TREE_DEPTH = 64

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Name(str):
    """A PDF name object (/Foo) — distinct from strings."""


class _Ref(tuple):
    """An indirect reference (num, gen)."""


class _Lexer:
    """Tokenizer over PDF syntax; returns python values, _Name for
    names, _Ref for ``N G R``, and the marker strings 'obj',
    'endobj', 'stream', operators, etc. as _Op."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, i, n = self.data, self.pos, len(self.data)
        while i < n:
            c = d[i]
            if c in _WS:
                i += 1
            elif c == 0x25:  # '%' comment to end of line
                while i < n and d[i] not in b"\r\n":
                    i += 1
            else:
                break
        self.pos = i

    def next_token(self):
        """One lexical token: number, name, string, or a bareword /
        delimiter. Returns None at end of input."""
        self._skip_ws()
        d, i, n = self.data, self.pos, len(self.data)
        if i >= n:
            return None
        c = d[i]
        if c == 0x2F:  # '/'
            j = i + 1
            while j < n and d[j] not in _WS and d[j] not in _DELIM:
                j += 1
            raw = d[i + 1 : j]
            # #xx hex escapes in names
            name = re.sub(
                rb"#([0-9A-Fa-f]{2})",
                lambda m: bytes([int(m.group(1), 16)]),
                raw,
            )
            self.pos = j
            return _Name(name.decode("latin-1"))
        if c == 0x28:  # '(' literal string
            return self._lex_literal_string()
        if c == 0x3C:  # '<'
            if i + 1 < n and d[i + 1] == 0x3C:
                self.pos = i + 2
                return "<<"
            return self._lex_hex_string()
        if c == 0x3E and i + 1 < n and d[i + 1] == 0x3E:
            self.pos = i + 2
            return ">>"
        if c in b"[]":
            self.pos = i + 1
            return chr(c)
        if c in b"{}" or c == 0x29:
            raise ValueError(f"unexpected delimiter {chr(c)!r}")
        # number or bareword
        j = i
        while j < n and d[j] not in _WS and d[j] not in _DELIM:
            j += 1
        word = d[i:j]
        self.pos = j
        if not word:
            raise ValueError("empty token")
        if re.fullmatch(rb"[+-]?\d+", word):
            return int(word)
        if re.fullmatch(rb"[+-]?(\d+\.\d*|\.\d+|\d+)", word):
            return float(word)
        return _Op(word.decode("latin-1"))

    def _lex_literal_string(self) -> bytes:
        d, n = self.data, len(self.data)
        i = self.pos + 1
        depth = 1
        out = bytearray()
        while i < n:
            c = d[i]
            if c == 0x5C:  # backslash
                i += 1
                if i >= n:
                    break
                e = d[i]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                                0x62: 8, 0x66: 12}[e])
                    i += 1
                elif e in b"()\\":
                    out.append(e)
                    i += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    v, k = 0, 0
                    while k < 3 and i < n and 0x30 <= d[i] <= 0x37:
                        v = v * 8 + (d[i] - 0x30)
                        i += 1
                        k += 1
                    out.append(v & 0xFF)
                elif e in b"\r\n":  # line continuation
                    i += 1
                    if e == 0x0D and i < n and d[i] == 0x0A:
                        i += 1
                else:  # unknown escape: emit the char itself
                    out.append(e)
                    i += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos = i + 1
                    return bytes(out)
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        raise ValueError("unterminated literal string")

    def _lex_hex_string(self) -> bytes:
        d = self.data
        j = d.find(b">", self.pos + 1)
        if j < 0:
            raise ValueError("unterminated hex string")
        nibbles = re.sub(rb"[\x00\t\n\x0c\r ]", b"", d[self.pos + 1 : j])
        if not re.fullmatch(rb"[0-9A-Fa-f]*", nibbles):
            raise ValueError("bad hex string")
        if len(nibbles) % 2:
            nibbles += b"0"
        self.pos = j + 1
        return bytes.fromhex(nibbles.decode("ascii"))

    def next_object(self):
        """One full object (composing arrays/dicts/refs)."""
        tok = self.next_token()
        return self._compose(tok)

    def _compose(self, tok):
        if tok == "<<":
            d: dict[str, object] = {}
            while True:
                k = self.next_token()
                if k == ">>":
                    return d
                if not isinstance(k, _Name):
                    raise ValueError("dict key is not a name")
                d[str(k)] = self.next_object()
        if tok == "[":
            arr: list[object] = []
            while True:
                save = self.pos
                t = self.next_token()
                if t == "]":
                    return arr
                if t is None:
                    # EOF inside an array: next_token() returns None
                    # WITHOUT advancing, so falling through would
                    # append None forever (real hang, found by the
                    # round-11 fuzz run mid-suite)
                    raise ValueError("unterminated array")
                self.pos = save
                arr.append(self.next_object())
        if isinstance(tok, int):
            # maybe "N G R" (reference) — backtrack if not
            save = self.pos
            t2 = self.next_token()
            if isinstance(t2, int) and t2 >= 0 and tok >= 0:
                t3 = self.next_token()
                if isinstance(t3, _Op) and str(t3) == "R":
                    return _Ref((tok, t2))
            self.pos = save
            return tok
        if isinstance(tok, _Op):
            s = str(tok)
            if s == "true":
                return True
            if s == "false":
                return False
            if s == "null":
                return None
            return tok
        return tok


class _Op(str):
    """A content-stream / structural operator keyword."""


# ---------------------------------------------------------------------------
# document parse


def _scan_objects(blob: bytes) -> dict[int, int]:
    """Fallback xref reconstruction: offsets of every ``N G obj``."""
    offsets: dict[int, int] = {}
    for m in re.finditer(rb"(?m)(\d+)\s+(\d+)\s+obj\b", blob):
        offsets[int(m.group(1))] = m.start()
        if len(offsets) > MAX_OBJECTS:
            raise ValueError("object count exceeds budget")
    return offsets


def _flate(raw: bytes) -> bytes:
    """Budgeted inflate (the zipsrc discipline: cap BEFORE
    allocation). zlib errors surface as ValueError so a corrupted
    stream is a per-document error row, not a task-killing exception
    (found by the round-10 fuzz suite)."""
    try:
        dobj = zlib.decompressobj()
        data = dobj.decompress(raw, MAX_STREAM_BYTES)
        if dobj.unconsumed_tail and dobj.decompress(
            dobj.unconsumed_tail, 1
        ):
            raise ValueError("stream inflates past budget")
        return data + dobj.flush()
    except zlib.error as exc:
        raise ValueError(f"flate stream corrupt: {exc}") from exc


def _png_unpredict(data: bytes, columns: int) -> bytes:
    """Reverse PNG row predictors (Predictor >= 10) on a byte matrix
    — all five filter types, bpp = 1 byte (the /Colors 1
    /BitsPerComponent 8 case xref streams use)."""
    rowlen = columns + 1
    if columns < 1 or len(data) % rowlen:
        raise ValueError("bad predictor row length")
    out = bytearray()
    prev = bytes(columns)
    for r in range(0, len(data), rowlen):
        ft = data[r]
        row = bytearray(data[r + 1 : r + rowlen])
        for i in range(columns):
            a = row[i - 1] if i else 0
            b = prev[i]
            c = prev[i - 1] if i else 0
            if ft == 0:
                v = row[i]
            elif ft == 1:
                v = row[i] + a
            elif ft == 2:
                v = row[i] + b
            elif ft == 3:
                v = row[i] + (a + b) // 2
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                v = row[i] + pr
            else:
                raise ValueError(f"bad PNG filter type {ft}")
            row[i] = v & 0xFF
        out += row
        prev = row
    return bytes(out)


def _apply_filters(sdict: dict, raw: bytes, resolve) -> bytes:
    """Decode a stream body per /Filter (+ /DecodeParms): FlateDecode
    with optional PNG predictors; anything else is a typed error."""
    filt = resolve(sdict.get("Filter"))
    if filt is None:
        return raw
    parms = resolve(sdict.get("DecodeParms"))
    filters = filt if isinstance(filt, list) else [filt]
    parms_list = parms if isinstance(parms, list) else [parms]
    data = raw
    for i, f in enumerate(filters):
        f = str(resolve(f))
        p = resolve(parms_list[i]) if i < len(parms_list) else None
        if f != "FlateDecode":
            raise ValueError(f"unsupported stream filter {f}")
        data = _flate(data)
        if isinstance(p, dict):
            pred = resolve(p.get("Predictor", 1))
            if isinstance(pred, int) and pred >= 10:
                cols = resolve(p.get("Columns", 1))
                if not isinstance(cols, int):
                    raise ValueError("bad /Columns")
                data = _png_unpredict(data, cols)
            elif pred not in (None, 1):
                raise ValueError(f"unsupported predictor {pred}")
    return data


def _xref_stream_entries(
    d: dict, data: bytes,
    offsets: dict[int, int], compressed: dict[int, tuple[int, int]],
) -> None:
    """Apply one decoded cross-reference STREAM's rows (ISO 32000
    §7.5.8): /W field widths, /Index subsections; type 1 = offset,
    type 2 = (object-stream number, index within it); first section
    seen wins (the chain is walked newest-first)."""
    w = d.get("W")
    size = d.get("Size")
    if not (isinstance(w, list) and len(w) == 3
            and all(isinstance(x, int) and 0 <= x <= 8 for x in w)):
        raise ValueError("bad xref stream /W")
    if not isinstance(size, int) or size < 0:
        raise ValueError("bad xref stream /Size")
    index = d.get("Index", [0, size])
    if (not isinstance(index, list) or len(index) % 2
            or not all(isinstance(x, int) and x >= 0 for x in index)):
        raise ValueError("bad xref stream /Index")
    rw = sum(w)
    if rw == 0:
        raise ValueError("zero-width xref stream rows")
    pos = 0
    for s, c in zip(index[::2], index[1::2]):
        if len(offsets) + len(compressed) + c > MAX_OBJECTS:
            raise ValueError("object count exceeds budget")
        for k in range(c):
            if pos + rw > len(data):
                raise ValueError("xref stream data truncated")
            fields = []
            for width in w:
                fields.append(
                    int.from_bytes(data[pos : pos + width], "big")
                    if width else None
                )
                pos += width
            t = fields[0] if w[0] else 1
            num = s + k
            if num in offsets or num in compressed:
                continue
            if t == 1:
                if fields[1] is None:
                    raise ValueError("xref stream type-1 row missing offset")
                offsets[num] = fields[1]
            elif t == 2:
                if fields[1] is None or fields[2] is None:
                    raise ValueError("xref stream type-2 row incomplete")
                compressed[num] = (fields[1], fields[2])
            # type 0 (free) and unknown types: no entry


def _read_xref_at(
    blob: bytes, off: int,
    offsets: dict[int, int], compressed: dict[int, tuple[int, int]],
) -> dict:
    """Parse ONE cross-reference section at ``off`` — classic table
    OR xref stream — into the maps; returns its trailer dict."""
    lex = _Lexer(blob, off)
    tok = lex.next_token()
    if isinstance(tok, _Op) and str(tok) == "xref":
        while True:
            t = lex.next_token()
            if isinstance(t, _Op) and str(t) == "trailer":
                break
            if not isinstance(t, int):
                raise ValueError("bad xref subsection")
            start = t
            count = lex.next_token()
            if not isinstance(count, int) or count < 0:
                raise ValueError("bad xref count")
            if len(offsets) + count > MAX_OBJECTS:
                raise ValueError("object count exceeds budget")
            lex._skip_ws()
            pos = lex.pos
            # Entry stride: the spec says exactly 20 bytes (18 data +
            # 2-byte EOL: "SP CR", "SP LF", or "CR LF"), but some real
            # writers emit 19-byte entries with a single-byte EOL —
            # assuming 20 misaligns the whole walk. Detect from the
            # first entry's line ending.
            stride = 20
            if count > 0:
                e18 = blob[pos + 18 : pos + 19]
                e19 = blob[pos + 19 : pos + 20]
                if e18 not in (b" ",) and not (e18 == b"\r"
                                               and e19 == b"\n"):
                    stride = 19
            for k in range(count):
                ent = blob[pos + stride * k : pos + stride * k + 18]
                if len(ent) < 18:
                    raise ValueError("truncated xref entry")
                kind = ent[17:18]
                num = start + k
                if kind == b"n" and num not in offsets \
                        and num not in compressed:
                    offsets[num] = int(ent[:10])
            lex.pos = pos + stride * count
        t = lex.next_object()
        if not isinstance(t, dict):
            raise ValueError("bad trailer")
        return t
    if isinstance(tok, int):
        # "N G obj << /Type /XRef ... >> stream": PDF 1.5 xref stream.
        # Spec requires every entry in its dictionary to be DIRECT.
        g = lex.next_token()
        kw = lex.next_token()
        if not (isinstance(g, int) and isinstance(kw, _Op)
                and str(kw) == "obj"):
            raise ValueError("damaged xref section header")
        d = lex.next_object()
        st = lex.next_token()
        if not (isinstance(d, dict) and isinstance(st, _Op)
                and str(st) == "stream" and d.get("Type") == "XRef"):
            raise ValueError("object at startxref is not an XRef stream")
        length = d.get("Length")
        if not isinstance(length, int) or length < 0:
            raise ValueError("xref stream /Length must be direct")
        p = lex.pos
        if blob[p : p + 2] == b"\r\n":
            p += 2
        elif blob[p : p + 1] == b"\n":
            p += 1
        raw = blob[p : p + length]
        if len(raw) != length:
            raise ValueError("xref stream truncated")
        data = _apply_filters(d, raw, lambda v: v)
        _xref_stream_entries(d, data, offsets, compressed)
        return d
    raise ValueError("damaged xref table")


def _parse_xref(
    blob: bytes,
) -> tuple[dict[int, int], dict[int, tuple[int, int]], dict]:
    """(object offsets, compressed-object map, merged trailer) via
    the cross-reference chain from ``startxref`` — classic tables,
    xref streams, /Prev incremental chains, and hybrid-reference
    /XRefStm side tables; raises to trigger the scan fallback."""
    # ISO 32000 readers tolerate ~1 KiB of junk/comments after %%EOF;
    # a 256-byte window misses such files and they degrade to the scan
    # fallback, where ObjStm-packed objects are unreachable.
    tail = blob[-2048:]
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", tail):
        pass
    if m is None:
        raise ValueError("no startxref")
    off = m.group(1)
    offsets: dict[int, int] = {}
    compressed: dict[int, tuple[int, int]] = {}
    trailer: dict = {}
    seen: set[int] = set()
    off = int(off)
    while off is not None:
        if off in seen or off >= len(blob):
            raise ValueError("bad xref chain")
        if len(seen) > 1000:
            raise ValueError("xref chain exceeds budget")
        seen.add(off)
        t = _read_xref_at(blob, off, offsets, compressed)
        for k, v in t.items():
            trailer.setdefault(k, v)
        # hybrid-reference file: the classic section's /XRefStm points
        # at the xref STREAM carrying the compressed-object entries
        xs = t.get("XRefStm")
        if isinstance(xs, int) and xs not in seen and xs < len(blob):
            seen.add(xs)
            st = _read_xref_at(blob, xs, offsets, compressed)
            for k, v in st.items():
                trailer.setdefault(k, v)
        off = t.get("Prev") if isinstance(t.get("Prev"), int) else None
    return offsets, compressed, trailer


class _Doc:
    def __init__(self, blob: bytes):
        if not blob.lstrip()[:5].startswith(b"%PDF-"):
            raise ValueError("not a PDF (missing %PDF- header)")
        self.blob = blob
        self._cache: dict[int, object] = {}
        self.compressed: dict[int, tuple[int, int]] = {}
        self._objstm_loading: set[int] = set()
        try:
            self.offsets, self.compressed, self.trailer = _parse_xref(blob)
            if "Root" not in self.trailer:
                raise ValueError("trailer missing /Root")
        except ValueError:
            # damaged/absent xref: reconstruct by scanning (objects
            # packed inside object streams are unreachable this way —
            # their xref rows were the only pointer to them)
            self.offsets = _scan_objects(blob)
            self.compressed = {}
            self.trailer = self._scan_trailer()
        if "Encrypt" in self.trailer:
            raise ValueError("encrypted PDF unsupported")

    def _scan_trailer(self) -> dict:
        """Trailer (or root-bearing dict) when the xref is unusable:
        last ``trailer`` keyword wins; else find the Catalog."""
        idx = self.blob.rfind(b"trailer")
        if idx >= 0:
            lex = _Lexer(self.blob, idx + 7)
            t = lex.next_object()
            if isinstance(t, dict) and "Root" in t:
                return t
        for num in self.offsets:
            obj = self.get(num)
            if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                return {"Root": _Ref((num, 0))}
        raise ValueError("no document catalog found")

    def resolve(self, v):
        if isinstance(v, _Ref):
            return self.get(v[0])
        return v

    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        off = self.offsets.get(num)
        if off is None:
            cm = self.compressed.get(num)
            if cm is not None:
                return self._get_from_objstm(num, cm[0])
            raise ValueError(f"object {num} missing from xref")
        lex = _Lexer(self.blob, off)
        n = lex.next_token()
        g = lex.next_token()
        kw = lex.next_token()
        if not (isinstance(n, int) and isinstance(g, int)
                and isinstance(kw, _Op) and str(kw) == "obj"):
            raise ValueError(f"object {num}: bad header at {off}")
        body = lex.next_object()
        save = lex.pos
        t = lex.next_token()
        if isinstance(t, _Op) and str(t) == "stream":
            if not isinstance(body, dict):
                raise ValueError("stream without dictionary")
            # EOL after 'stream': CRLF or LF
            p = lex.pos
            if self.blob[p : p + 2] == b"\r\n":
                p += 2
            elif self.blob[p : p + 1] == b"\n":
                p += 1
            length = self.resolve(body.get("Length"))
            if not isinstance(length, int) or length < 0:
                raise ValueError("stream /Length missing or invalid")
            raw = self.blob[p : p + length]
            if len(raw) != length:
                raise ValueError("stream truncated")
            body = dict(body)
            body["__stream__"] = self._defilter(body, raw)
        else:
            lex.pos = save
        self._cache[num] = body
        return body

    def _defilter(self, sdict: dict, raw: bytes) -> bytes:
        return _apply_filters(sdict, raw, self.resolve)

    def _get_from_objstm(self, num: int, container: int):
        """Load an object stored inside an object stream (ISO 32000
        §7.5.7): the container's stream body starts with /N
        (objnum, offset) integer pairs; object i's body begins at
        /First + offset_i, with no obj/endobj wrapper. All members
        are parsed and cached in one pass (a later get() for a
        sibling is free). Containers must not nest (spec rule) —
        the loading guard turns a crafted cycle into an error."""
        if container in self._objstm_loading:
            raise ValueError("object stream cycle")
        self._objstm_loading.add(container)
        try:
            cont = self.get(container)
            if not (isinstance(cont, dict) and "__stream__" in cont
                    and cont.get("Type") == "ObjStm"):
                raise ValueError(f"object {num}: container {container} "
                                 "is not an object stream")
            n = self.resolve(cont.get("N"))
            first = self.resolve(cont.get("First"))
            if not (isinstance(n, int) and 0 <= n <= MAX_OBJECTS
                    and isinstance(first, int) and first >= 0):
                raise ValueError("bad object stream /N or /First")
            data = cont["__stream__"]
            lex = _Lexer(data)
            pairs = []
            for _ in range(n):
                onum = lex.next_token()
                ooff = lex.next_token()
                if not (isinstance(onum, int) and isinstance(ooff, int)):
                    raise ValueError("bad object stream header pair")
                pairs.append((onum, ooff))
            for onum, ooff in pairs:
                if onum in self._cache:
                    continue
                if first + ooff > len(data):
                    raise ValueError("object stream member offset "
                                     "out of range")
                self._cache[onum] = _Lexer(data, first + ooff).next_object()
        finally:
            self._objstm_loading.discard(container)
        if num not in self._cache:
            raise ValueError(f"object {num} not present in its "
                             f"object stream {container}")
        return self._cache[num]

    # -- page tree ---------------------------------------------------

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer["Root"])
        if not isinstance(root, dict):
            raise ValueError("catalog is not a dictionary")
        top = self.resolve(root.get("Pages"))
        out: list[dict] = []
        self._walk(top, out, 0, set())
        if not out:
            raise ValueError("document has no pages")
        return out

    def _walk(self, node, out: list, depth: int, seen: set) -> None:
        if depth > MAX_TREE_DEPTH:
            raise ValueError("page tree too deep")
        if not isinstance(node, dict):
            raise ValueError("page tree node is not a dictionary")
        ident = id(node)
        if ident in seen:
            raise ValueError("page tree cycle")
        seen.add(ident)
        t = node.get("Type")
        if t == "Page":
            if len(out) >= MAX_PAGES:
                raise ValueError("page count exceeds budget")
            out.append(node)
            return
        kids = self.resolve(node.get("Kids"))
        if not isinstance(kids, list):
            raise ValueError("Pages node without /Kids")
        for kid in kids:
            self._walk(self.resolve(kid), out, depth + 1, seen)

    def page_content(self, page: dict) -> bytes:
        c = self.resolve(page.get("Contents"))
        if c is None:
            return b""
        parts = c if isinstance(c, list) else [c]
        out = []
        for p in parts:
            p = self.resolve(p)
            if not (isinstance(p, dict) and "__stream__" in p):
                raise ValueError("page /Contents is not a stream")
            out.append(p["__stream__"])
        return b"\n".join(out)


def _extract_text(content: bytes) -> str:
    """Text-showing operators in content order: Tj, ' and " emit
    their operand; TJ emits its array's string elements. Operand
    stack semantics: operands accumulate until an operator consumes
    them (PDF content streams are postfix)."""
    lex = _Lexer(content)
    stack: list = []
    out: list[str] = []
    while True:
        try:
            tok = lex.next_token()
        except ValueError:
            break  # inline images / binary junk end the usable prefix
        if tok is None:
            break
        if isinstance(tok, _Op):
            op = str(tok)
            if op == "Tj" or op == "'":
                if stack and isinstance(stack[-1], bytes):
                    out.append(stack[-1].decode("latin-1"))
            elif op == '"':
                if stack and isinstance(stack[-1], bytes):
                    out.append(stack[-1].decode("latin-1"))
            elif op == "TJ":
                if stack and isinstance(stack[-1], list):
                    for el in stack[-1]:
                        if isinstance(el, bytes):
                            out.append(el.decode("latin-1"))
            stack.clear()
        elif tok in ("<<", "[", ">>", "]"):
            # re-enter composition for dict/array operands
            # (stray closers are ignored)
            if tok in ("<<", "["):
                stack.append(lex._compose(tok))
        else:
            stack.append(tok)
    return "".join(out)


def extract_pdf_pages(blob: bytes) -> list[str]:
    """Per-page extracted text for one PDF blob (raises ValueError
    on malformed/unsupported documents — the DataFrame operator
    turns that into an error row)."""
    doc = _Doc(blob)
    return [_extract_text(doc.page_content(p)) for p in doc.pages()]


# ---------------------------------------------------------------------------
# writer (tests + synthetic fixtures, the encode_zip pattern)


def _pdf_escape(s: bytes) -> bytes:
    return (s.replace(b"\\", b"\\\\")
             .replace(b"(", b"\\(")
             .replace(b")", b"\\)"))


def encode_pdf(
    pages: list[bytes],
    compress: bool = True,
    xref_stream: bool = False,
    objstm: bool = False,
    predictor: bool = False,
) -> bytes:
    """A PDF whose page i's content stream is ``pages[i]`` (raw
    content-stream bytes, e.g. ``BT ... ET``). ``compress``
    FlateDecodes every content stream. ``xref_stream=True`` writes
    the PDF 1.5 layout (cross-reference STREAM instead of the
    classic table); ``objstm=True`` additionally packs every
    non-stream object (catalog, pages node, page dicts, font) into
    one object stream — the dominant modern layout (requires
    ``xref_stream``); ``predictor=True`` PNG-up-predicts the xref
    stream rows (/DecodeParms /Predictor 12), as most real writers
    do."""
    if objstm and not xref_stream:
        raise ValueError("object streams require an xref stream")
    dict_objs: dict[int, bytes] = {}
    stream_objs: dict[int, bytes] = {}
    n_pages = len(pages)
    page_ids = [3 + 2 * i for i in range(n_pages)]
    font_id = 3 + 2 * n_pages
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    dict_objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    dict_objs[2] = (b"<< /Type /Pages /Kids [ " + kids
                    + b" ] /Count %d >>" % n_pages)
    for i, content in enumerate(pages):
        pid, cid = page_ids[i], page_ids[i] + 1
        dict_objs[pid] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> "
            b"/Contents %d 0 R >>" % (font_id, cid)
        )
        if compress:
            data = zlib.compress(content)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            data = content
            head = b"<< /Length %d >>" % len(data)
        stream_objs[cid] = head + b"\nstream\n" + data + b"\nendstream"
    dict_objs[font_id] = (b"<< /Type /Font /Subtype /Type1 "
                          b"/BaseFont /Helvetica >>")

    if not xref_stream:
        objs = {**dict_objs, **stream_objs}
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets: dict[int, int] = {}
        for num in sorted(objs):
            offsets[num] = len(out)
            out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
        xref_off = len(out)
        size = max(objs) + 1
        out += b"xref\n0 %d\n" % size
        out += b"0000000000 65535 f \n"
        for num in range(1, size):
            out += b"%010d 00000 n \n" % offsets[num]
        out += (b"trailer\n<< /Size %d /Root 1 0 R >>\n"
                b"startxref\n%d\n%%%%EOF\n" % (size, xref_off))
        return bytes(out)

    # ---- PDF 1.5 layout: xref stream (+ optional object stream) ----
    objstm_id = font_id + 1
    xref_id = font_id + 2 if objstm else font_id + 1
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    in_stm: dict[int, int] = {}  # objnum -> index within the ObjStm
    if objstm:
        members = sorted(dict_objs)
        bodies, offs, pos = [], [], 0
        for num in members:
            offs.append(pos)
            body = dict_objs[num] + b"\n"
            bodies.append(body)
            pos += len(body)
        header = b" ".join(
            b"%d %d" % (num, off) for num, off in zip(members, offs)
        ) + b"\n"
        payload = header + b"".join(bodies)
        data = zlib.compress(payload)
        offsets[objstm_id] = len(out)
        out += (b"%d 0 obj\n<< /Type /ObjStm /N %d /First %d "
                b"/Length %d /Filter /FlateDecode >>\nstream\n"
                % (objstm_id, len(members), len(header), len(data)))
        out += data + b"\nendstream\nendobj\n"
        for idx, num in enumerate(members):
            in_stm[num] = idx
        regular = stream_objs
    else:
        regular = {**dict_objs, **stream_objs}
    for num in sorted(regular):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + regular[num] + b"\nendobj\n"

    xref_off = len(out)
    size = xref_id + 1
    rows = bytearray()
    w = (1, 4, 2)
    for num in range(size):
        if num == 0:
            t, f2, f3 = 0, 0, 65535
        elif num in in_stm:
            t, f2, f3 = 2, objstm_id, in_stm[num]
        elif num == xref_id:
            t, f2, f3 = 1, xref_off, 0
        else:
            t, f2, f3 = 1, offsets[num], 0
        rows += bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
    rw = sum(w)
    parms = b""
    if predictor:
        # PNG "up" filter (type 2) per row, as real writers emit
        filtered = bytearray()
        prev = bytes(rw)
        for r in range(0, len(rows), rw):
            row = rows[r : r + rw]
            filtered += b"\x02" + bytes(
                (row[i] - prev[i]) & 0xFF for i in range(rw)
            )
            prev = row
        rows = filtered
        parms = b" /DecodeParms << /Predictor 12 /Columns %d >>" % rw
    data = zlib.compress(bytes(rows))
    out += (b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] "
            b"/Root 1 0 R /Filter /FlateDecode%s /Length %d >>\nstream\n"
            % (xref_id, size, parms, len(data)))
    out += data + b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


def text_page(text: bytes) -> bytes:
    """Content-stream bytes showing ``text`` with one Tj."""
    return (b"BT /F1 12 Tf 72 720 Td (" + _pdf_escape(text)
            + b") Tj ET")


# ---------------------------------------------------------------------------
# DataFrame operator


PAGE_FIELDS = "page_index int, text string, n_chars int, error string"


def parse_pdf_pages(
    df: DataFrame,
    blob_col: str,
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Explode PDF blobs into per-page text rows: ``id_cols``
    carried through plus (page_index, text, n_chars, error). One
    mapInPandas pass, work proportional to blob bytes, parallelism
    = input files; a malformed document contributes one error row
    (page_index NULL) — corrupt documents are a data fact at
    100 TB, not an exception."""
    import pandas as pd

    from atiesh_spark.session import widen_for_python_stage

    base = df.select(*id_cols, blob_col)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for tup in pdf.itertuples(index=False):
                ids = {c: getattr(tup, c) for c in id_cols}
                blob = getattr(tup, blob_col)
                try:
                    if blob is None:
                        raise ValueError("NULL blob")
                    texts = extract_pdf_pages(bytes(blob))
                    for i, t in enumerate(texts):
                        rows.append({**ids, "page_index": i, "text": t,
                                     "n_chars": len(t), "error": None})
                except (ValueError, RecursionError) as exc:
                    rows.append({**ids, "page_index": None, "text": None,
                                 "n_chars": None, "error": str(exc)})
            yield pd.DataFrame(
                rows, columns=[*id_cols, "page_index", "text",
                               "n_chars", "error"],
            )

    id_schema = ", ".join(
        f"{c} {base.schema[c].dataType.simpleString()}" for c in id_cols
    )
    schema = (id_schema + ", " if id_schema else "") + PAGE_FIELDS
    return widen_for_python_stage(base).mapInPandas(gen, schema=schema)
