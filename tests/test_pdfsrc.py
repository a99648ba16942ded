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
