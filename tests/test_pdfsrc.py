"""PDF ingestion (sources/pdfsrc.py): object lexer, classic-xref
walk + /Prev chains + scan fallback, budgeted FlateDecode, page-tree
walk, text-showing operators, and the Spark explode operator's
error-row contract."""

from __future__ import annotations

import zlib

import pytest

from atiesh_spark.sources.pdfsrc import (
    MAX_STREAM_BYTES,
    _Lexer,
    encode_pdf,
    extract_pdf_pages,
    parse_pdf_pages,
    text_page,
)


class TestLexer:
    def test_object_types(self):
        lex = _Lexer(
            b"<< /Name /Va#6Cue /N 42 /F 3.14 /Neg -7 /T true /Z null "
            b"/Arr [1 (two) <333435>] /Ref 9 0 R >>"
        )
        d = lex.next_object()
        assert d["Name"] == "Value"  # #6C hex escape in names
        assert d["N"] == 42 and abs(d["F"] - 3.14) < 1e-12
        assert d["Neg"] == -7 and d["T"] is True and d["Z"] is None
        assert d["Arr"] == [1, b"two", b"345"]
        assert tuple(d["Ref"]) == (9, 0)

    def test_string_escapes(self):
        lex = _Lexer(rb"(a\(b\)c \\ \n\t \101 \53 nested (p) q)")
        s = lex.next_object()
        assert s == b"a(b)c \\ \n\t A + nested (p) q"

    def test_line_continuation_and_comment(self):
        lex = _Lexer(b"% comment line\n(ab\\\ncd)")
        assert lex.next_object() == b"abcd"

    def test_hex_string_odd_padding(self):
        lex = _Lexer(b"<48656C6C6F2>")
        assert lex.next_object() == b"Hello "


class TestRoundTrip:
    def test_basic_pages_compressed_and_plain(self):
        pages = [text_page(b"hello (world) \\ one"),
                 text_page(b"page two")]
        assert extract_pdf_pages(encode_pdf(pages)) == [
            "hello (world) \\ one", "page two"]
        assert extract_pdf_pages(
            encode_pdf([text_page(b"plain")], compress=False)
        ) == ["plain"]

    def test_show_operators(self):
        content = (b"BT /F1 12 Tf 72 720 Td "
                   b"[(ab) -120 (cd)] TJ "
                   b"<48656C6C6F> Tj "
                   b"(line\\nbreak \\101\\102) Tj "
                   b"(quoted) ' 1 2 (dq) \" ET")
        assert extract_pdf_pages(encode_pdf([content])) == [
            "abcdHelloline\nbreak ABquoteddq"]

    def test_many_pages_order(self):
        many = encode_pdf([text_page(b"pg %d" % i) for i in range(25)])
        assert extract_pdf_pages(many) == [f"pg {i}" for i in range(25)]

    def test_incremental_update_prev_chain(self):
        """An appended revision whose xref /Prev points at the
        original table: the NEWEST offset for an object wins, older
        sections fill the gaps."""
        base = encode_pdf([text_page(b"original")])
        old_xref = base.rindex(b"xref\n")
        # replace page 3's content (object 4) with a new revision
        new_content = text_page(b"revised")
        data = zlib.compress(new_content)
        obj = (b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>"
               b"\nstream\n" % len(data)) + data + b"\nendstream\nendobj\n"
        upd = bytearray(base)
        obj_off = len(upd)
        upd += obj
        xref_off = len(upd)
        upd += b"xref\n4 1\n%010d 00000 n \n" % obj_off
        upd += (b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\n"
                b"startxref\n%d\n%%%%EOF\n" % (old_xref, xref_off))
        assert extract_pdf_pages(bytes(upd)) == ["revised"]


class TestWriterQuirks:
    """Real-world deviations from the letter of ISO 32000 that a
    reader must tolerate (round 11)."""

    def test_19_byte_xref_entries(self):
        """Some writers end classic xref entries with a SINGLE EOL
        byte (19-byte entries); a fixed 20-byte stride misaligns the
        walk and degrades readable files to the scan fallback."""
        import re

        blob = encode_pdf([text_page(b"nineteen"), text_page(b"bytes")])
        for eol in (b"\n", b"\r"):
            quirky = re.sub(rb"(\d{10} \d{5} [nf]) \n",
                            rb"\1" + eol, blob)
            assert quirky != blob
            assert extract_pdf_pages(quirky) == ["nineteen", "bytes"]

    def test_trailing_junk_after_eof_keeps_xref_chain(self):
        """ISO 32000 readers tolerate ~1 KiB of junk after %%EOF.
        The ObjStm layout proves the xref CHAIN (not the scan
        fallback, which cannot reach object-stream members) survived
        the junk."""
        blob = encode_pdf([text_page(b"tolerant")],
                          xref_stream=True, objstm=True)
        junk = b"\n% trailing viewer cruft " + b"#" * 640 + b"\n"
        assert extract_pdf_pages(blob + junk) == ["tolerant"]


class TestLexerTermination:
    """Round-11 fuzz regression: next_token() returns None at EOF
    WITHOUT advancing, so an unterminated array made _compose append
    None forever — a real hang (one malformed PDF would wedge an
    executor task for good). Every open collection must raise at
    EOF instead."""

    def test_unterminated_array_raises(self):
        for src in (b"[1 2 3", b"[[1 2", b"<< /K [1 2 >>", b"[(s) /N"):
            with pytest.raises(ValueError):
                _Lexer(src).next_object()

    def test_unterminated_dict_raises(self):
        with pytest.raises(ValueError):
            _Lexer(b"<< /A 1 /B 2").next_object()

    @pytest.mark.parametrize("edits", [
        [(20, 64), (61, 249), (722, 88), (787, 197)],
        [(85, 22), (180, 14), (188, 97), (261, 118), (603, 52),
         (685, 209), (737, 234)],
    ])
    def test_captured_hang_inputs_raise_promptly(self, edits):
        """The two EXACT mutated documents the round-11 fuzz session
        captured looping forever (byte edits replayed against the
        same deterministic fixture): must now raise, fast."""
        base = bytearray(encode_pdf(
            [text_page(b"alpha"), text_page(b"beta (x)")],
            xref_stream=True,
        ))
        for pos, val in edits:
            base[pos] = val
        with pytest.raises(ValueError):
            extract_pdf_pages(bytes(base))


class TestRecoveryAndErrors:
    def test_scan_fallback_on_damaged_xref(self):
        b = bytearray(encode_pdf([text_page(b"rescue me")]))
        i = b.rfind(b"startxref")
        b[i : i + 9] = b"startxrEF"
        assert extract_pdf_pages(bytes(b)) == ["rescue me"]
        b2 = bytearray(encode_pdf([text_page(b"fallback2")]))
        i = b2.find(b"xref")
        b2[i : i + 4] = b"xrqf"
        assert extract_pdf_pages(bytes(b2)) == ["fallback2"]

    def test_typed_errors(self):
        enc = encode_pdf([text_page(b"x")]).replace(
            b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
        with pytest.raises(ValueError, match="encrypted"):
            extract_pdf_pages(enc)
        with pytest.raises(ValueError, match="PDF"):
            extract_pdf_pages(b"plain text file")
        t = encode_pdf([text_page(b"abcdef" * 50)])
        with pytest.raises(ValueError):
            extract_pdf_pages(t[: len(t) // 2])
        dct = encode_pdf([text_page(b"x")]).replace(
            b"/Filter /FlateDecode", b"/Filter /DCTDecode")
        with pytest.raises(ValueError, match="unsupported stream filter"):
            extract_pdf_pages(dct)

    def test_flate_bomb_budget(self):
        """A content stream declaring a small /Length but inflating
        past MAX_STREAM_BYTES must error BEFORE unbounded
        allocation (the zipsrc discipline)."""
        bomb = zlib.compress(b"\x00" * (MAX_STREAM_BYTES + (1 << 20)), 9)
        blob = encode_pdf([b"BT ET"])  # placeholder, then splice
        # build directly: one page whose content stream is the bomb
        page = (b"BT /F1 12 Tf (x) Tj ET")
        pdf = encode_pdf([page])
        packed = zlib.compress(page)
        assert packed in pdf
        swapped = pdf.replace(packed, bomb).replace(
            b"/Length %d" % len(packed), b"/Length %d" % len(bomb))
        with pytest.raises(ValueError, match="budget"):
            extract_pdf_pages(swapped)

    def test_page_tree_cycle_guard(self):
        pdf = encode_pdf([text_page(b"x")])
        # make the Pages node its own kid
        looped = pdf.replace(b"/Kids [ 3 0 R ]", b"/Kids [ 2 0 R ]")
        with pytest.raises(ValueError):
            extract_pdf_pages(looped)


def test_spark_page_explode(spark):
    ok = encode_pdf([text_page(b"alpha"), text_page(b"beta")])
    df = spark.createDataFrame(
        [(1, bytearray(ok)), (2, bytearray(b"junk")), (3, None)],
        "pdf_id long, blob binary",
    )
    rows = parse_pdf_pages(df, "blob", id_cols=("pdf_id",)).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r.pdf_id, []).append(r)
    good = sorted(by_id[1], key=lambda r: r.page_index)
    assert [(r.page_index, r.text, r.n_chars, r.error) for r in good] == [
        (0, "alpha", 5, None), (1, "beta", 4, None)]
    assert len(by_id[2]) == 1 and by_id[2][0].error is not None
    assert by_id[3][0].error == "NULL blob"
    assert by_id[2][0].page_index is None


class TestModernLayouts:
    """PDF 1.5 cross-reference streams + object streams (round 10)."""

    PAGES = [text_page(b"alpha (x)"), text_page(b"beta"),
             text_page(b"gamma")]
    WANT = ["alpha (x)", "beta", "gamma"]

    @pytest.mark.parametrize("kw", [
        {"xref_stream": True},
        {"xref_stream": True, "predictor": True},
        {"xref_stream": True, "objstm": True},
        {"xref_stream": True, "objstm": True, "predictor": True},
        {"xref_stream": True, "objstm": True, "compress": False},
    ])
    def test_round_trips(self, kw):
        assert extract_pdf_pages(encode_pdf(self.PAGES, **kw)) == self.WANT

    def test_objstm_requires_xref_stream(self):
        with pytest.raises(ValueError, match="xref stream"):
            encode_pdf(self.PAGES, objstm=True)

    def test_many_pages_modern(self):
        many = [text_page(b"pg %d" % i) for i in range(40)]
        blob = encode_pdf(many, xref_stream=True, objstm=True,
                          predictor=True)
        assert extract_pdf_pages(blob) == [f"pg {i}" for i in range(40)]

    def test_png_unpredict_all_filters(self):
        """The predictor reversal handles every PNG filter type, not
        just the 'up' rows this repo's writer emits."""
        from atiesh_spark.sources.pdfsrc import _png_unpredict

        cols = 5
        plain = [bytes((r * 7 + c * 13) % 256 for c in range(cols))
                 for r in range(6)]
        # forward-filter each row with a different type (0..4, then 2)
        data = bytearray()
        prev = bytes(cols)
        for r, row in enumerate(plain):
            ft = [0, 1, 2, 3, 4, 2][r]
            enc = bytearray()
            for i in range(cols):
                a = row[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                if ft == 0:
                    v = row[i]
                elif ft == 1:
                    v = row[i] - a
                elif ft == 2:
                    v = row[i] - b
                elif ft == 3:
                    v = row[i] - (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c)
                    v = row[i] - pr
                enc.append(v & 0xFF)
            data += bytes([ft]) + enc
            prev = row
        assert _png_unpredict(bytes(data), cols) == b"".join(plain)
        with pytest.raises(ValueError, match="filter type"):
            _png_unpredict(b"\x07" + b"\x00" * cols, cols)
        with pytest.raises(ValueError, match="row length"):
            _png_unpredict(b"\x00\x01", 5)

    def test_objstm_cycle_and_missing_member_are_errors(self):
        blob = encode_pdf(self.PAGES, xref_stream=True, objstm=True)
        # point a type-2 row's container at ITSELF via a crafted doc:
        # simpler — corrupt the ObjStm /N so a member is missing
        bad = blob.replace(b"/Type /ObjStm /N 6", b"/Type /ObjStm /N 2")
        with pytest.raises(ValueError):
            extract_pdf_pages(bad)

    def test_scan_fallback_documented_objstm_gap(self):
        """With a destroyed startxref, an ObjStm-packed PDF cannot be
        recovered by scanning (the members' only pointers were the
        xref rows) — must be a typed error, not a misread."""
        blob = bytearray(encode_pdf(self.PAGES, xref_stream=True,
                                    objstm=True))
        i = bytes(blob).rfind(b"startxref")
        blob[i : i + 9] = b"startxrEF"
        with pytest.raises(ValueError):
            extract_pdf_pages(bytes(blob))
        # but a NON-objstm xref-stream PDF recovers fine by scanning
        blob2 = bytearray(encode_pdf(self.PAGES, xref_stream=True))
        i = bytes(blob2).rfind(b"startxref")
        blob2[i : i + 9] = b"startxrEF"
        assert extract_pdf_pages(bytes(blob2)) == self.WANT

    def test_hybrid_reference_xrefstm(self):
        """A classic table whose trailer carries /XRefStm (the hybrid
        layout Acrobat emits): the side xref stream supplies the
        compressed-object rows."""
        modern = encode_pdf(self.PAGES, xref_stream=True, objstm=True)
        # find the xref stream object's offset from startxref
        import re as _re

        m = list(_re.finditer(rb"startxref\s+(\d+)", modern))[-1]
        xs_off = int(m.group(1))
        body = modern[: m.start()]  # drop startxref/%%EOF
        out = bytearray(body)
        xref_off = len(out)
        # minimal classic section: only the free-list head, with
        # /XRefStm pointing at the existing xref stream
        out += (b"xref\n0 1\n0000000000 65535 f \n"
                b"trailer\n<< /Size 9 /Root 1 0 R /XRefStm %d >>\n"
                b"startxref\n%d\n%%%%EOF\n" % (xs_off, xref_off))
        assert extract_pdf_pages(bytes(out)) == self.WANT
