"""Minimal PDF text layer (sources/pdf.py): writer validity, parser
round trips incl. escapes/multi-page/TJ arrays, error paths, and the
Spark round-trip operator."""

import re
import zlib

import pytest

from ocr_pytorch_spark.sources.pdf import (encode_pdf,
                                           extract_pdf_text,
                                           pdf_roundtrip_extract)


def test_roundtrip_simple():
    assert extract_pdf_text(encode_pdf(["hello world"])) \
        == ["hello world"]


def test_roundtrip_escapes_and_multipage():
    pages = ["parens (nested) and \\ backslash",
             "newline\nand\ttab",
             "",
             "third page"]
    assert extract_pdf_text(encode_pdf(pages)) == pages


def test_octal_escape_unescaped():
    from ocr_pytorch_spark.sources.pdf import _unescape

    assert _unescape(r"\101\102\103") == "ABC"
    assert _unescape(r"a\(b\)c") == "a(b)c"


def test_tj_array_strings_parsed():
    """Kerned text written as a [(a) -3 (b)] TJ array (the other
    common text op) is extracted too."""
    blob = encode_pdf(["placeholder"])
    stream = b"BT /F1 12 Tf 72 720 Td [(ker) -3 (ned)] TJ ET"
    z = zlib.compress(stream)
    # splice the new stream into object 4 (the content stream)
    pat = re.compile(rb"4 0 obj\n.*?endobj\n", re.S)
    repl = (b"4 0 obj\n<< /Length " + str(len(z)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + z
            + b"\nendstream\nendobj\n")
    blob2 = pat.sub(repl.replace(b"\\", b"\\\\"), blob, count=1)
    assert extract_pdf_text(blob2) == ["kerned"]


def test_xref_offsets_are_correct():
    """The xref table must point at the actual 'N 0 obj' byte offsets
    (what makes the writer spec-valid, not just parser-compatible)."""
    blob = encode_pdf(["abc", "def"])
    xref_at = int(re.search(rb"startxref\n(\d+)\n", blob).group(1))
    assert blob[xref_at:xref_at + 4] == b"xref"
    entries = re.findall(rb"(\d{10}) 00000 n", blob)
    for num, off in enumerate(entries, start=1):
        at = int(off)
        assert blob[at:].startswith(f"{num} 0 obj".encode()), num


def test_non_pdf_rejected():
    with pytest.raises(ValueError):
        extract_pdf_text(b"%JPG nope")
    with pytest.raises(ValueError):
        extract_pdf_text(b"%PDF-1.4\nno catalog here")


def test_unsupported_filter_rejected():
    blob = encode_pdf(["x"])
    bad = blob.replace(b"/FlateDecode", b"/LZWDecode")
    with pytest.raises(Exception):
        extract_pdf_text(bad)


def test_spark_roundtrip_operator(spark):
    docs = spark.createDataFrame(
        [("a", "alpha (beta) gamma"), ("b", "just text")],
        "doc_id string, text string")
    rows = {r["doc_id"]: r["extracted_text"]
            for r in pdf_roundtrip_extract(docs).collect()}
    assert rows == {"a": "alpha (beta) gamma", "b": "just text"}
