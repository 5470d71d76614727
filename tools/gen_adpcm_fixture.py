#!/usr/bin/env python
"""Regenerate the literal-expected IMA-ADPCM fixture — the
regenerated-ground-truth discipline (JPEG / AVI fixtures): an
INDEPENDENT decoder implementation (table-driven: per-(index, code)
magnitude and next-index lookup tables built once from the published
step table, then a plain loop — no shared code with the package's
inline bit-test decoder in ``operators/multimodal.py``) decodes the
SAME ADPCM payloads the ``wav_adpcm_*`` queries assemble, and
per-64-sample-window RMS rows are written as a literal VALUES oracle.

The payload DEFINITION is shared with the queries (formula samples →
package ``encode_wav_ima_adpcm``); ground truth certifies the DECODE
path — the RIFF walk, the block state machine, and the windowed-RMS
composition. ADPCM is lossy, so ground truth is the second decoder,
not the input samples (the JPEG discipline on the audio axis).

Usage: python tools/gen_adpcm_fixture.py   (rewrites the fixture)
The freshness test (tests/test_queries_oracle.py) re-runs this decoder
and fails on drift.
"""

from __future__ import annotations

import math
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "wav_adpcm_sf001.sql",
)

_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)

# table-driven formulation: magnitude and next-index fully precomputed
# per (index, 3-bit code) — structurally unlike the package decoder's
# inline bit tests, same spec arithmetic
_MAG = [
    [
        (s >> 3)
        + (s if c & 4 else 0)
        + ((s >> 1) if c & 2 else 0)
        + ((s >> 2) if c & 1 else 0)
        for c in range(8)
    ]
    for s in _STEPS
]
_NEXT = [
    [
        min(88, max(0, i + (-1, -1, -1, -1, 2, 4, 6, 8)[c]))
        for c in range(8)
    ]
    for i in range(89)
]


def reference_decode_adpcm(payload: bytes) -> tuple[int, list[int]]:
    """Independent IMA-ADPCM WAV decode: minimal chunk scan (the
    fixture payloads are writer-canonical; strictness is the package
    parser's job), then table lookups per nibble."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    tag, ch, rate, _, block_align, bits = struct.unpack("<HHIIHH", fmt[:16])
    assert (tag, ch, bits) == (0x11, 1, 4)
    out: list[int] = []
    for b0 in range(0, len(data), block_align):
        pred, index, _ = struct.unpack("<hBB", data[b0 : b0 + 4])
        out.append(pred)
        for byte in data[b0 + 4 : b0 + block_align]:
            for code in (byte & 0x0F, byte >> 4):
                mag = _MAG[index][code & 7]
                pred = pred - mag if code & 8 else pred + mag
                pred = max(-32768, min(32767, pred))
                index = _NEXT[index][code & 7]
                out.append(pred)
    return rate, out


def adpcm_samples(doc_id: int) -> list[int]:
    """The per-payload sample DEFINITION shared with the wav_adpcm_*
    queries: nblocks = 2 + doc_id % 3 blocks of 129 samples, sample k
    = ((doc_id*7 + k*13) % 16384) - 8192 (mod-wrap jumps exercise the
    step adaptation hard)."""
    n = 129 * (2 + doc_id % 3)
    return [((doc_id * 7 + k * 13) % 16384) - 8192 for k in range(n)]


def expected_rows(sf_dir: str) -> list[tuple]:
    """(media_id, win_idx, rms, sample_rate) per FULL 64-sample
    window — identical RMS arithmetic to wav_window_energy (exact
    int64 square sums / power-of-two window, IEEE sqrt): bit-exact
    doubles both engines reproduce."""
    import duckdb

    from google_sheets_etl_spark.operators.multimodal import (
        encode_wav_ima_adpcm,
    )

    con = duckdb.connect()
    ids = [
        int(r[0])
        for r in con.execute(
            f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
            " ORDER BY doc_id"
        ).fetchall()
    ]
    con.close()
    out = []
    for doc_id in ids:
        wav = encode_wav_ima_adpcm(8000, adpcm_samples(doc_id), 129)
        rate, dec = reference_decode_adpcm(wav)
        for w in range(len(dec) // 64):
            win = dec[w * 64 : (w + 1) * 64]
            rms = math.sqrt(sum(s * s for s in win) / 64.0)
            out.append((doc_id, w, rms, rate))
    return out


def rows_to_sql(rows: list[tuple]) -> str:
    values = ",\n  ".join(
        f"({m}, {w}, {r!r}, {sr})" for (m, w, r, sr) in rows
    )
    return (
        "-- GENERATED by tools/gen_adpcm_fixture.py from "
        f"{SF_DIR}/documents.parquet; do not hand-edit\n"
        "SELECT CAST(media_id AS BIGINT) AS media_id,\n"
        "       CAST(win_idx AS BIGINT) AS win_idx,\n"
        "       CAST(rms AS DOUBLE) AS rms,\n"
        "       CAST(sample_rate AS INT) AS sample_rate\n"
        "FROM (VALUES\n  "
        + values
        + "\n) AS t(media_id, win_idx, rms, sample_rate)"
    )


def main() -> None:
    rows = expected_rows(SF_DIR)
    with open(FIXTURE, "w") as f:
        f.write(rows_to_sql(rows) + "\n")
    print(f"wrote {len(rows)} rows to {FIXTURE}")


if __name__ == "__main__":
    main()
