"""Body text transforms.

Reference behaviors covered:
- split a request body into N events on a single-char delimiter
  (HttpSource.scala:60-72,116-117) -> explode(split(...)).
- long-line policy: truncate at a byte/char cap, or drop the line
  (DirectoryWatchSourceSemantics.scala:224-245).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_body(df: DataFrame, body_col: str, delimiter: str = "\n",
               out_col: str = "value", pos_col: str | None = None) -> DataFrame:
    """Explode ``body_col`` into one row per delimited segment.

    ``delimiter`` is a LITERAL string (the reference's single delimiter
    char, HttpSource.scala:60-72) — it is regex-escaped before reaching
    F.split, so '|', '.', '+' etc. split on the character itself.
    ``pos_col`` adds a 0-based segment ordinal (the reference keeps
    arrival order implicitly; an explicit ordinal is the set-oriented
    equivalent).
    """
    parts = F.split(F.col(body_col), F.lit(re.escape(delimiter)), -1)
    other = [c for c in df.columns if c != body_col]
    if pos_col is None:
        return df.select(*other, F.explode(parts).alias(out_col))
    return df.select(*other, F.posexplode(parts).alias(pos_col, out_col))


def truncate_lines(col: Column | str, max_len: int) -> Column:
    """Truncate-at-cap policy (max-line-truncate=true)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, max_len)


def drop_long_lines(df: DataFrame, col: str, max_len: int) -> DataFrame:
    """Drop-over-cap policy (max-line-truncate=false, the default)."""
    return df.filter(F.length(F.col(col)) <= max_len)


def normalize_text(
    col: Column | str,
    form: str = "NFC",
    lowercase: bool = True,
    strip_accents: bool = False,
    collapse_whitespace: bool = True,
) -> Column:
    """Unicode text normalization — the C4/CCNet preprocessing step
    (canonical composition so visually-identical strings hash/dedup/
    tokenize identically, case folding, optional accent stripping,
    whitespace collapse).

    Spark has no Unicode-normalization builtin, so the NFC/NFKC core
    is an Arrow-batched pandas UDF (the documented non-JVM seam, like
    the gzip codec); case folding and whitespace collapse stay in
    codegen around it. ``strip_accents`` decomposes (NFD) and drops
    combining marks before recomposing — the fastText/CLD-style
    aggressive fold for language-ID features; leave it off for corpus
    text that will be shown to a model (accents carry meaning).

    Order of operations: normalize(form) [-> strip accents] ->
    lowercase -> collapse whitespace runs to single spaces + trim.
    NULL passes through as NULL.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    do_strip = strip_accents

    @pandas_udf("string")
    def _norm(texts: pd.Series) -> pd.Series:
        def one(t: str | None) -> str | None:
            if t is None:
                return None
            out = unicodedata.normalize(form, t)
            if do_strip:
                out = unicodedata.normalize(
                    "NFC",
                    "".join(
                        ch
                        for ch in unicodedata.normalize("NFD", out)
                        if not unicodedata.combining(ch)
                    ),
                )
            return out

        return texts.map(one)

    c = F.col(col) if isinstance(col, str) else col
    out = _norm(c)
    if lowercase:
        out = F.lower(out)
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out


def ws_tokens(col: Column | str) -> Column:
    """THE engine-wide whitespace tokenizer: split on runs of (Java
    ASCII-class) ``\\s``, drop empty tokens. BM25 scoring, Naive Bayes
    features, BPE word tables, token counts and the inverted index all
    contractually share this tokenization — import this helper instead
    of restating the split so they cannot silently diverge."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


_BLOCK_TAG_RE = r"(?i)<\s*(?:br\s*/?|/(?:p|div|li|h[1-6]|tr|table|ul|ol|blockquote))\s*>"
_DROP_BLOCK_RE = r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"<[^>]+>"

#: decode order matters: &amp; LAST, so "&amp;lt;" ends as "&lt;" (the
#: text the author wrote), never a second-round "<".
_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


def strip_markup(col: Column | str) -> Column:
    """Plain text from HTML-ish markup — the extraction step between a
    crawl snapshot and every text operator in this repo. Row-local
    codegen (chained regexp_replace, no UDF): riding the scan at any
    scale. Deliberately a TAG STRIPPER, not a DOM parser (no
    readability scoring, no boilerplate heuristics — line_dedup does
    cross-document boilerplate properly):

    1. drop <script>/<style> elements wholesale (content is code);
    2. drop <!-- comments -->;
    3. block-level closers and <br> become newlines (so paragraphs
       survive as line structure for line_dedup/chunking);
    4. every remaining tag is removed;
    5. the six ubiquitous entities are decoded (&amp; last, so
       double-escaped text decodes one level, never two);
    6. spaces/tabs collapse, 3+ newlines collapse to the paragraph
       break, result trimmed.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _DROP_BLOCK_RE, "")
    c = F.regexp_replace(c, _COMMENT_RE, "")
    c = F.regexp_replace(c, _BLOCK_TAG_RE, "\n")
    c = F.regexp_replace(c, _TAG_RE, "")
    for ent, ch in _ENTITIES:
        c = F.regexp_replace(c, re.escape(ent), ch)
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    return F.trim(c)


# ---------------------------------------------------------------------------
# Mojibake repair (the ftfy core trick, expressed in pure codegen)
# ---------------------------------------------------------------------------

#: The characters cp1252 shows for bytes 0x80-0x9F (the slots Windows
#: maps to printables; undefined slots 81/8D/8F/90/9D stay as C1
#: controls and need no translation). A UTF-8 document misread as
#: cp1252 shows these characters where continuation bytes were.
_CP1252_HIGH = (
    "€‚ƒ„…†‡ˆ‰Š"
    "‹ŒŽ‘’“”•–—"
    "˜™š›œžŸ"
)
_C1_BYTES = (
    "\x80\x82\x83\x84\x85\x86\x87\x88\x89\x8a"
    "\x8b\x8c\x8e\x91\x92\x93\x94\x95\x96\x97"
    "\x98\x99\x9a\x9b\x9c\x9e\x9f"
)

#: A UTF-8 sequence misread as latin1/cp1252: a lead byte (0xC2-0xDF
#: two-byte, 0xE0-0xEF three-byte, 0xF0-0xF4 four-byte — as latin1
#: chars) followed by a continuation byte shown as latin1 0x80-0xBF
#: or one of cp1252's printable stand-ins.
_MOJIBAKE_HINT = (
    "[\u00c2-\u00f4]"
    "[\u0080-\u00bf" + _CP1252_HIGH + "]"
)


def to_mojibake(col: Column | str) -> Column:
    """The BREAKAGE direction, for tests and planted oracles: render
    ``col``'s UTF-8 bytes as a cp1252 reader would mislabel them.
    Pure codegen: encode to UTF-8 bytes, decode the bytes as latin1
    (byte == codepoint), then show the C1 range the way cp1252 does."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(
        F.decode(F.encode(c, "UTF-8"), "ISO-8859-1"),
        _C1_BYTES, _CP1252_HIGH,
    )


def fix_mojibake(col: Column | str) -> Column:
    """Repair UTF-8-read-as-cp1252 mojibake ('cafÃ©' -> 'café') — the
    core of ftfy's fixer as ONE codegen expression, no Python in the
    plan: map cp1252's printable stand-ins back to raw C1 bytes
    (translate), reinterpret the latin1 codepoints as bytes (encode),
    and read those bytes back as a string. The candidate replaces the
    input only when (a) every input char was latin1-representable (a
    per-row lazy ``when`` guard — Spark 4's ``encode`` RAISES on
    unmappable chars instead of substituting, so CJK/Cyrillic text
    must never reach it), (b) the input shows a mojibake
    lead+continuation pattern (a clean accented capital before a
    space fails this), (c) the reinterpreted bytes are valid UTF-8
    (``is_valid_utf8`` — the bytes-to-string cast is deliberately the
    LENIENT path), and (d) something actually changed. Idempotent on
    already-clean text by construction."""
    c = F.col(col) if isinstance(col, str) else col
    translated = F.translate(c, _CP1252_HIGH, _C1_BYTES)
    # latin1-representability is checked AFTER the translate: the
    # cp1252 stand-ins a broken document legitimately contains are
    # themselves above U+00FF and map down to C1 first
    latin1_ok = ~translated.rlike("[^\\u0000-\\u00ff]")
    candidate = F.encode(
        F.when(latin1_ok, translated).otherwise(F.lit("")),
        "ISO-8859-1",
    ).cast("string")
    looks_broken = c.rlike(_MOJIBAKE_HINT)
    return F.when(
        latin1_ok
        & looks_broken
        & F.is_valid_utf8(candidate)
        & (candidate != c),
        candidate,
    ).otherwise(c)
