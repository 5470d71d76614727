#!/usr/bin/env python
"""Regenerate the PDF text-extraction fixture — the regenerated-
ground-truth discipline (gen_avi_fixture pattern): payloads come from
the SHARED writer definition (operators/pdf.py encode_pdf_text over
the sf0.01 corpus plant), but the expected texts are produced by an
INDEPENDENT extractor that shares no machinery with the engine's
strict parser — no xref walk, no object graph: it scans ``N 0 obj``
regions by regex, inflates streams whose header names FlateDecode,
and collects every escaped string literal in stream order. A
writer+parser pair that co-drifted off spec would still have to agree
with this third implementation to stay green.

Writes fixtures/pdf_text_sf001.sql (literal expected
``(doc_id, page_idx, text)`` rows — the pdf_text_extract oracle).

Usage: python tools/gen_pdf_fixture.py
Freshness test in tests/test_queries_oracle.py re-runs these
functions and fails if the committed fixture drifts.
"""

from __future__ import annotations

import os
import re
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from google_sheets_etl_spark.operators.pdf import (  # noqa: E402
    encode_pdf_text,
)

SF_DIR = "/root/testdata/sf0.01"
FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "pdf_text_sf001.sql",
)

_STR_RE = re.compile(rb"\((?:\\.|[^\\()])*\)", re.S)
_OBJ_RE = re.compile(rb"(\d+) 0 obj(.*?)endobj", re.S)
_LEN_RE = re.compile(rb"/Length\s+(\d+)")


def pdf_pages_for_doc(doc_id: int, text: str) -> list[str]:
    """The SHARED plant definition: two pages per document, page 2
    carrying parens/backslash (the escape path) and a TJ split for
    every third document."""
    return [
        f"Doc {doc_id}: {text[:60]}",
        f"page2 (q) \\ of {doc_id}: {text[60:140]}",
    ]


def pdf_payload_for_doc(doc_id: int, text: str) -> bytes:
    return encode_pdf_text(
        pdf_pages_for_doc(doc_id, text),
        compress=doc_id % 2 == 0,
        use_tj_array=doc_id % 3 == 0,
    )


FIXTURE_15 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "pdf15_text_sf001.sql",
)


def pdf15_payload_for_doc(doc_id: int, text: str) -> bytes:
    """The PDF 1.5 plant: same pages as the classic plant, laid out
    with a cross-reference STREAM; odd ids pack the non-stream
    objects into an ObjStm (type-2 entries), ids ≡ 1 (mod 3) add the
    PNG-Up predictor to the xref stream."""
    return encode_pdf_text(
        pdf_pages_for_doc(doc_id, text),
        compress=doc_id % 2 == 0,
        use_tj_array=doc_id % 3 == 0,
        xref_stream=True,
        objstm=doc_id % 2 == 1,
        predictor=doc_id % 3 == 1,
    )


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i = 1  # skip '('
    end = len(raw) - 1
    while i < end:
        c = raw[i]
        if c == 0x5C and i + 1 < end:
            out.append(raw[i + 1])
            i += 2
        else:
            out.append(c)
            i += 1
    return out.decode("latin-1")


def independent_extract(data: bytes) -> list[str]:
    """Text per page WITHOUT the engine's xref/object-graph walk:
    content streams found by object-region scan (object numbers
    ascend with page order in these payloads), strings collected in
    stream order. Handles the 1.5 layouts by the same xref-free
    principle — content streams remain regular objects there (only
    NON-stream objects move into an ObjStm), so the scan simply
    skips the /XRef and /ObjStm bookkeeping streams by header name
    and never touches a cross-reference."""
    pages: list[tuple[int, bytes]] = []
    for m in _OBJ_RE.finditer(data):
        body = m.group(2)
        sm = re.search(rb"stream\r?\n", body)
        if not sm:
            continue
        head = body[: sm.start()]
        if b"/XRef" in head or b"/ObjStm" in head:
            continue
        lm = _LEN_RE.search(head)
        raw = body[sm.end() : sm.end() + int(lm.group(1))]
        if b"/FlateDecode" in head:
            raw = zlib.decompress(raw)
        pages.append((int(m.group(1)), raw))
    return [
        "".join(_unescape(s.group(0)) for s in _STR_RE.finditer(raw))
        for _, raw in sorted(pages)
    ]


def corpus_rows(
    sf_dir: str, payload_fn=None
) -> list[tuple[int, int, str]]:
    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    payload_fn = payload_fn or pdf_payload_for_doc
    out: list[tuple[int, int, str]] = []
    for doc_id, text in docs:
        got = independent_extract(payload_fn(int(doc_id), text))
        for i, t in enumerate(got):
            out.append((int(doc_id), i + 1, t))
    return out


def fixture_sql(rows: list[tuple[int, int, str]]) -> str:
    def esc(s: str) -> str:
        return s.replace("'", "''")

    values = ",\n  ".join(
        f"({d}, {p}, '{esc(t)}')" for d, p, t in rows
    )
    return (
        "-- GENERATED by tools/gen_pdf_fixture.py from "
        f"{SF_DIR}/documents.parquet; do not hand-edit\n"
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(page_idx AS BIGINT) AS page_idx, text\n"
        "FROM (VALUES\n  " + values + "\n) AS t(doc_id, page_idx, text)"
    )


def main() -> None:
    rows = corpus_rows(SF_DIR)
    with open(FIXTURE, "w") as f:
        f.write(fixture_sql(rows) + "\n")
    print(f"wrote {len(rows)} page rows to {FIXTURE}")
    rows15 = corpus_rows(SF_DIR, pdf15_payload_for_doc)
    with open(FIXTURE_15, "w") as f:
        f.write(fixture_sql(rows15) + "\n")
    print(f"wrote {len(rows15)} page rows to {FIXTURE_15}")


if __name__ == "__main__":
    main()
