"""PDF text extraction: writer conformance (xref offsets, stream
lengths), escape/TJ decoding, quarantine paths, bomb guard, and the
Spark operator round trip."""

from __future__ import annotations

import math
import re
import zlib

from vacancy_gpt_etl_pipeline_spark.operators.pdf import (
    LINES_PER_PAGE,
    WORDS_PER_LINE,
    _extract_stream_text,
    _unescape_pdf_string,
    build_pdf,
    extract_pdf_text,
    parse_pdf,
    synthesize_pdf_payload,
)


def test_xref_offsets_are_exact():
    """Every xref entry must point at the 'N 0 obj' header byte — the
    writer is only conformant if offsets survive content-size changes."""
    b = build_pdf(12, "one two three four five six seven eight nine")
    m = re.search(rb"xref\n0 (\d+)\n", b)
    n_objs = int(m.group(1))
    table = b[m.end():]
    entries = [table[i * 20 : (i + 1) * 20] for i in range(n_objs)]
    assert entries[0].startswith(b"0000000000 65535 f")
    for num, e in enumerate(entries[1:], start=1):
        off = int(e[:10])
        assert b[off:].startswith(f"{num} 0 obj".encode()), num
    # startxref points at the xref keyword
    sx = int(re.search(rb"startxref\n(\d+)\n", b).group(1))
    assert b[sx:].startswith(b"xref")


def test_stream_length_headers_match_payload():
    b = build_pdf(1, "w " * 20)
    for m in re.finditer(
        rb"/Length (\d+) /Filter /FlateDecode >>\nstream\n(.*?)\nendstream",
        b,
        re.DOTALL,
    ):
        assert int(m.group(1)) == len(m.group(2))
        zlib.decompress(m.group(2))  # must inflate cleanly


def test_roundtrip_text_pages_and_counts():
    words = [f"w{i}" for i in range(70)]
    text = " ".join(words)
    n_pages, n_streams, out = parse_pdf(build_pdf(7, text))
    n_lines = 1 + math.ceil(len(words) / WORDS_PER_LINE)
    want_pages = math.ceil(n_lines / LINES_PER_PAGE)
    assert (n_pages, n_streams) == (want_pages, want_pages)
    assert out == "doc (7) \\mark " + text


def test_escape_decoding():
    assert _unescape_pdf_string(rb"a\(b\)c\\d") == "a(b)c\\d"
    assert _unescape_pdf_string(rb"x\ny") == "x\ny"
    assert _unescape_pdf_string(rb"\101\102") == "AB"  # octal
    assert _unescape_pdf_string(b"plain") == "plain"


def test_tj_array_concatenates_without_kerning_gaps():
    raw = b"BT ( He ) Tj T* [(llo) -120 ( wo)] TJ T* (rld) Tj ET"
    assert _extract_stream_text(raw) == [" He ", "llo wo", "rld"]


def test_balanced_unescaped_parens_nest():
    """7.3.4.3: balanced parens inside a literal need no escaping."""
    raw = b"BT (a (nested (deep)) tail) Tj ET"
    assert _extract_stream_text(raw) == ["a (nested (deep)) tail"]
    # unterminated literal: trailing text drops, no exception
    assert _extract_stream_text(b"BT (open Tj ET") == []


def test_quarantine_paths():
    assert parse_pdf(b"not a pdf") is None
    # corrupt ONE stream: other pages' text still extracted
    b = bytearray(build_pdf(3, "x " * 200))  # several pages
    m = re.search(rb"stream\n", bytes(b))
    b[m.end() + 4] ^= 0xFF
    parsed = parse_pdf(bytes(b))
    assert parsed is not None
    n_pages, n_streams, text = parsed
    assert n_streams == n_pages - 1  # the corrupted one skipped
    assert "x" in text


def test_bomb_guard():
    from vacancy_gpt_etl_pipeline_spark.operators import pdf as P

    old = P._MAX_INFLATED_BYTES
    P._MAX_INFLATED_BYTES = 64
    try:
        # every page's content stream inflates past 64 bytes
        big = build_pdf(1, ("x" * 60 + " ") * 64)
        n_pages, n_streams, text = parse_pdf(big)
        assert n_pages > 1 and n_streams == 0 and text == ""
    finally:
        P._MAX_INFLATED_BYTES = old


def test_spark_operator_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "x " * 100)],
        "doc_id bigint, text string",
    )
    out = {
        r["asset_id"]: r
        for r in extract_pdf_text(synthesize_pdf_payload(docs)).collect()
    }
    assert out[1]["text"] == "doc (1) \\mark alpha beta gamma"
    assert out[2]["text"] == "doc (2) \\mark" and out[2]["n_pages"] == 1
    assert out[3]["n_pages"] == math.ceil(
        (1 + math.ceil(100 / WORDS_PER_LINE)) / LINES_PER_PAGE
    )


def test_non_octal_backslash_digit_is_ignored_backslash():
    """7.3.4.2: a backslash before a non-octal digit drops the
    backslash — it must never reach int(..., 8) and raise."""
    assert _unescape_pdf_string(rb"\8hello") == "8hello"
    assert _unescape_pdf_string(rb"\9\77x") == "9?x"
    assert _extract_stream_text(rb"BT (\8ok) Tj ET") == ["8ok"]


def test_line_continuation_all_eol_forms():
    """7.3.4.2: backslash + ANY EOL (LF, CR, CRLF) is a continuation —
    a \\<CR><LF> must not leak a stray carriage return (r10 ADVICE)."""
    assert _unescape_pdf_string(b"a\\\nb") == "ab"
    assert _unescape_pdf_string(b"a\\\rb") == "ab"
    assert _unescape_pdf_string(b"a\\\r\nb") == "ab"
    # trailing continuation at end of body
    assert _unescape_pdf_string(b"a\\\r") == "a"
    # an UNESCAPED EOL inside a literal is a single 0x0A (7.3.4.2:
    # CR, LF, and CRLF all normalize to one newline)
    assert _unescape_pdf_string(b"a\rb") == "a\nb"
    assert _unescape_pdf_string(b"a\r\nb") == "a\nb"
    assert _unescape_pdf_string(b"a\nb") == "a\nb"
