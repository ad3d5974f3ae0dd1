"""Minimal PDF text layer (north_rule surface: "PDF/layout parse").

Pure stdlib (zlib) + regex, built from the public PDF 1.4 spec — the
same writer/parser pairing pattern as the JPEG codec: a small writer
synthesizes real PDFs so the parser can be round-trip-verified without
external files, and the parser handles the common text-extraction
subset any simple generated PDF uses:

* writer ``encode_pdf(pages)``: catalog -> page tree -> one page per
  input string, Helvetica font, FlateDecode-compressed content
  streams (``BT .. (text) Tj .. ET``), xref table with correct
  offsets — valid per the spec, byte-parseable by any PDF reader.
* parser ``extract_pdf_text(data)``: object scan, page-tree walk
  (/Catalog -> /Pages -> /Kids -> /Contents), stream extraction with
  /FlateDecode support, text-op extraction (``(..) Tj`` and
  ``[(..) -3 (..)] TJ`` arrays), PDF string unescaping (\\\\, \\(,
  \\), \\n, \\r, \\t, octal) — returns one string per page in page
  order.

Spark surface: ``pdf_roundtrip_extract`` maps (doc_id, text) rows
through synth->parse in one Arrow-batched UDF; extraction is lossless
for the subset, so the DuckDB oracle is simply ``SELECT doc_id, text``
— the entire codec is value-hash-checked per document.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_ESC = {"\\": "\\\\", "(": "\\(", ")": "\\)", "\n": "\\n",
        "\r": "\\r", "\t": "\\t"}
_UNESC = {"\\": "\\", "(": "(", ")": ")", "n": "\n", "r": "\r",
          "t": "\t", "b": "\b", "f": "\f"}


def _escape(s: str) -> str:
    return "".join(_ESC.get(c, c) for c in s)


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt in _UNESC:
                out.append(_UNESC[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal escape, 1-3 digits
                j = i + 1
                while j < len(s) and j < i + 4 and s[j].isdigit():
                    j += 1
                out.append(chr(int(s[i + 1:j], 8)))
                i = j
                continue
        out.append(c)
        i += 1
    return "".join(out)


def encode_pdf(pages: list[str]) -> bytes:
    """One page per string; Flate-compressed single-Tj content."""
    objs: list[bytes] = []  # 1-indexed object bodies (without header)
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                .encode())
    font_obj = 3 + 2 * n_pages
    for i, text in enumerate(pages):
        content_obj = 4 + 2 * i
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_obj} 0 R >> >> "
            f"/Contents {content_obj} 0 R >>".encode())
        stream = (f"BT /F1 12 Tf 72 720 Td ({_escape(text)}) Tj ET"
                  .encode("latin-1"))
        z = zlib.compress(stream)
        objs.append(
            f"<< /Length {len(z)} /Filter /FlateDecode >>\nstream\n"
            .encode() + z + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 "
                b"/BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_TEXT_OP_RE = re.compile(
    r"\((?P<s>(?:[^()\\]|\\.)*)\)\s*Tj"
    r"|\[(?P<arr>(?:[^][\\]|\\.)*)\]\s*TJ")
_ARR_STR_RE = re.compile(r"\(((?:[^()\\]|\\.)*)\)")


def extract_pdf_text(data: bytes) -> list[str]:
    """-> one string per page, page-tree order.  Raises ValueError on
    non-PDF input; unsupported filters raise too (loud, not lossy)."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    objs: dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}

    def _stream_text(body: bytes) -> str:
        sm = re.search(rb"stream\r?\n", body)
        if not sm:
            return ""
        head = body[:sm.start()]
        lm = re.search(rb"/Length\s+(\d+)", head)
        if lm:
            # authoritative byte count — binary streams may legally
            # end in \r or contain 'endstream', which delimiter
            # regexes would truncate
            raw = body[sm.end():sm.end() + int(lm.group(1))]
        else:
            m = _STREAM_RE.search(body)
            if not m:
                return ""
            raw = m.group(1)
        if b"/FlateDecode" in head:
            raw = zlib.decompress(raw)
        elif b"/Filter" in head:
            raise ValueError("unsupported PDF stream filter")
        content = raw.decode("latin-1")
        parts = []
        for tm in _TEXT_OP_RE.finditer(content):
            if tm.group("s") is not None:
                parts.append(_unescape(tm.group("s")))
            else:
                for sm in _ARR_STR_RE.finditer(tm.group("arr")):
                    parts.append(_unescape(sm.group(1)))
        return "".join(parts)

    # walk the page tree: catalog -> pages -> kids -> contents
    root = next((b for b in objs.values() if b"/Type /Catalog" in b
                 or b"/Type/Catalog" in b), None)
    if root is None:
        raise ValueError("no /Catalog object")
    pages_ref = re.search(rb"/Pages\s+(\d+)\s+0\s+R", root)
    pages_obj = objs[int(pages_ref.group(1))]
    kids = re.search(rb"/Kids\s*\[(.*?)\]", pages_obj, re.S)
    page_nums = [int(n) for n in
                 re.findall(rb"(\d+)\s+0\s+R", kids.group(1))]
    out = []
    for pn in page_nums:
        page = objs[pn]
        cref = re.search(rb"/Contents\s+(\d+)\s+0\s+R", page)
        out.append(_stream_text(objs[int(cref.group(1))])
                   if cref else "")
    return out


PDF_EXTRACT_SCHEMA = "doc_id string, extracted_text string"


def pdf_roundtrip_extract(documents: DataFrame) -> DataFrame:
    """(doc_id, text) -> synthesize a real 1-page PDF per document in
    the executor, parse its text layer back out.  Lossless for this
    subset, so the oracle is the identity projection — the whole
    writer+parser is hash-checked per document."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, texts = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                blob = encode_pdf([str(text)])
                ids.append(str(doc_id))
                texts.append(extract_pdf_text(blob)[0])
            yield pd.DataFrame({"doc_id": ids, "extracted_text": texts})

    # fan_out (r9): the per-document encode+parse is pure Python —
    # worker parallelism equals input splits, and a small local
    # parquet arrives as ~4 splits on a 32-core box; fan_out is a
    # no-op at real scale (see functions.fan_out)
    from ocr_pytorch_spark.functions import fan_out

    return (fan_out(documents.select("doc_id", "text"))
            .mapInPandas(run, schema=PDF_EXTRACT_SCHEMA))
