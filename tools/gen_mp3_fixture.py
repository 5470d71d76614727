#!/usr/bin/env python
"""Regenerate the MP3 frame-stats fixture — the regenerated-ground-
truth discipline (JPEG / ADPCM / PDF): the payload definition is
shared verbatim with the package (``operators/mp3.py``'s
``mp3_payload_for_doc``), and an INDEPENDENT header walker here —
its own bit extraction, its own tables transcribed separately from
the spec, no code shared with ``parse_mp3_stream`` — recomputes the
expected stats row for every sf0.01 document. A frame-length bug in
either walker desynchronizes this one's walk and the fixture (or the
freshness test) fails.

Usage: python tools/gen_mp3_fixture.py   (rewrites the fixture)
The freshness test (tests/test_queries_oracle.py) re-runs this walker
and fails on drift.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "mp3_stats_sf001.sql",
)

# independently transcribed from ISO 11172-3 table B.2 / 13818-3 —
# rows are (V1L1, V1L2, V1L3, V2L1, V2L2+3) columns per index
_BR_COLUMNS = [
    (32, 32, 32, 32, 8), (64, 48, 40, 48, 16), (96, 56, 48, 56, 24),
    (128, 64, 56, 64, 32), (160, 80, 64, 80, 40), (192, 96, 80, 96, 48),
    (224, 112, 96, 112, 56), (256, 128, 112, 128, 64),
    (288, 160, 128, 144, 80), (320, 192, 160, 160, 96),
    (352, 224, 192, 176, 112), (384, 256, 224, 192, 128),
    (416, 320, 256, 224, 144), (448, 384, 320, 256, 160),
]
_SR_ROWS = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
            0: (11025, 12000, 8000)}


def _bitrate(vbits: int, lbits: int, idx: int) -> int:
    col = {(3, 3): 0, (3, 2): 1, (3, 1): 2}.get((vbits, lbits))
    if col is None:
        col = 3 if lbits == 3 else 4
    return _BR_COLUMNS[idx - 1][col]


def independent_walk(payload: bytes) -> dict:
    """Second-implementation strict walk: returns the same stats
    contract as the package walker, raising plain ValueError on any
    malformation (messages unpinned — this walker only certifies the
    VALID path; the audit classes are closed-form in the oracle)."""
    pos = 0
    if payload[:3] == b"ID3":
        size = 0
        for b in payload[6:10]:
            if b >= 0x80:
                raise ValueError("id3v2")
            size = size * 128 + b
        pos = 10 + size
    end = len(payload)
    if end - pos >= 128 and payload[end - 128:end - 125] == b"TAG":
        end -= 128
    first = None
    n = 0
    bmin = bmax = None
    nbr = set()
    xing = False
    start = pos
    while pos < end:
        b0, b1, b2, b3 = payload[pos:pos + 4]
        if b0 != 0xFF or (b1 >> 5) != 0b111:
            raise ValueError("sync")
        vbits = (b1 >> 3) & 3
        lbits = (b1 >> 1) & 3
        if vbits == 1 or lbits == 0:
            raise ValueError("header")
        idx = b2 >> 4
        sri = (b2 >> 2) & 3
        pad = (b2 >> 1) & 1
        if idx in (0, 15) or sri == 3 or (b3 & 3) == 2:
            raise ValueError("header")
        sr = _SR_ROWS[vbits][sri]
        br = _bitrate(vbits, lbits, idx)
        layer = 4 - lbits
        if layer == 1:
            ln = (12 * br * 1000 // sr + pad) * 4
        elif layer == 3 and vbits != 3:
            ln = 72 * br * 1000 // sr + pad
        else:
            ln = 144 * br * 1000 // sr + pad
        if pos + ln > end:
            raise ValueError("truncated")
        key = (vbits, lbits, sr)
        if first is None:
            first = key
            if layer == 3:
                mono = (b3 >> 6) == 3
                crc = (b1 & 1) == 0
                side = (17 if mono else 32) if vbits == 3 else (
                    9 if mono else 17)
                off = pos + 4 + (2 if crc else 0) + side
                if payload[off:off + 4] in (b"Xing", b"Info"):
                    xing = True
                elif payload[pos + 36:pos + 40] == b"VBRI":
                    xing = True
        elif key != first:
            raise ValueError("param change")
        nbr.add(idx)
        bmin = br if bmin is None else min(bmin, br)
        bmax = br if bmax is None else max(bmax, br)
        n += 1
        pos += ln
    vbits, lbits, sr = first
    layer = 4 - lbits
    if layer == 1:
        spf = 384
    elif layer == 2:
        spf = 1152
    else:
        spf = 1152 if vbits == 3 else 576
    return {
        "n_frames": n,
        "mpeg_version": {3: "1", 2: "2", 0: "2.5"}[vbits],
        "layer": layer,
        "sample_rate": sr,
        "bitrate_min_kbps": bmin,
        "bitrate_max_kbps": bmax,
        "stream_bytes": end - start,
        "duration_us": n * spf * 10**6 // sr,
        "is_vbr": len(nbr) > 1,
        "has_xing": xing,
    }


def expected_rows(sf_dir: str):
    import duckdb

    from google_sheets_etl_spark.operators.mp3 import mp3_payload_for_doc

    con = duckdb.connect()
    ids = [
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM "
            f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        ).fetchall()
    ]
    con.close()
    return [
        (doc_id, independent_walk(mp3_payload_for_doc(int(doc_id))))
        for doc_id in ids
    ]


def rows_to_sql(rows) -> str:
    vals = ",\n    ".join(
        "({}, {}, '{}', {}, {}, {}, {}, {}, {}, {}, {})".format(
            doc_id, st["n_frames"], st["mpeg_version"], st["layer"],
            st["sample_rate"], st["bitrate_min_kbps"],
            st["bitrate_max_kbps"], st["stream_bytes"],
            st["duration_us"], str(st["is_vbr"]).upper(),
            str(st["has_xing"]).upper(),
        )
        for doc_id, st in rows
    )
    return (
        "mp3s(media_id, n_frames, mpeg_version, layer, sample_rate,\n"
        "     bitrate_min_kbps, bitrate_max_kbps, stream_bytes,\n"
        "     duration_us, is_vbr, has_xing) AS (VALUES\n    "
        + vals + ")"
    )


def main() -> None:
    rows = expected_rows(SF_DIR)
    with open(FIXTURE, "w") as f:
        f.write(
            "-- GENERATED by tools/gen_mp3_fixture.py from "
            f"{SF_DIR}/documents.parquet; do not hand-edit\n"
            + rows_to_sql(rows) + "\n"
        )
    print(f"wrote {len(rows)} rows to {FIXTURE}")


if __name__ == "__main__":
    main()
