#!/usr/bin/env python
"""Regenerate the literal-expected CRAM-AVI fixture — the
regenerated-ground-truth discipline (JPEG / ADPCM / AVI fixtures): an
INDEPENDENT Microsoft Video 1 decoder (written from the public format
description: its own RIFF walk, per-pixel int loops, its own stateful
skip handling — no shared code with ``operators/multimodal.py``)
decodes every frame of the SAME CRAM payloads the ``avi_cram_*``
queries assemble, and writes per-frame luminance sums PLUS the
block-mode census (skip / solid / 2-color / 8-color counts straight
from the bitstream) as a literal VALUES oracle. The census is what
certifies the TEMPORAL path: skip blocks only decode correctly if
both engines carry the previous frame's pixels forward identically.

The payload DEFINITION is shared with the queries (formula RGB555
rasters → package ``encode_avi_cram``); ground truth certifies the
DECODE path.

Usage: python tools/gen_cram_fixture.py   (rewrites the fixture)
The freshness test (tests/test_queries_oracle.py) re-runs this decoder
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
    "avi_cram_sf001.sql",
)


def _x5(v5: int) -> int:
    return (v5 << 3) | (v5 >> 2)


def cram_frame_rasters(doc_id: int) -> tuple[int, int, list[bytes]]:
    """The per-video frame DEFINITION shared with the avi_cram_*
    queries: w ∈ {8, 12}, h = 8, nf = 2 + (doc_id // 6) % 3 frames. Frame 0
    mixes all three intra modes per block (mode = (block + doc_id) %
    3: solid / checkerboard 2-color / per-quadrant-striped 8-color);
    frame k > 0 copies frame k-1 and re-draws only blocks with
    (block + k + doc_id) % 3 == 0, so the unchanged majority becomes
    skip runs. Every channel value is an exact 5-bit expansion, so
    the encoder's RGB555 quantization is lossless and decode ==
    input."""
    w = 8 + 4 * (doc_id % 2)
    h = 8
    nf = 2 + (doc_id // 6) % 3
    bw, bh = w // 4, h // 4

    def block_pixels(bi: int, seed: int) -> list[tuple[int, int, int]]:
        mode = (bi + doc_id) % 3
        out = []
        for k in range(16):
            y, x = divmod(k, 4)
            if mode == 0:
                v = (seed + bi) % 32
            elif mode == 1:
                v = ((seed + bi) % 32, (seed + bi + 5) % 32)[(x + y) % 2]
            else:
                qd = (y >= 2) * 2 + (x >= 2)
                v = (
                    (seed + bi + qd) % 32,
                    (seed + bi + qd + 9) % 32,
                )[x % 2]
            out.append((_x5(v), _x5((v * 3) % 32), _x5((v * 7) % 32)))
        return out

    frames: list[bytes] = []
    px: list[tuple[int, int, int]] = [(0, 0, 0)] * (w * h)
    for f in range(nf):
        for by in range(bh):
            for bx in range(bw):
                bi = by * bw + bx
                if f > 0 and (bi + f + doc_id) % 3 != 0:
                    continue  # unchanged → future skip block
                blk = block_pixels(bi, doc_id + 17 * f)
                for k in range(16):
                    y, x = divmod(k, 4)
                    px[(by * 4 + y) * w + bx * 4 + x] = blk[k]
        frames.append(bytes(c for t in px for c in t))
    return w, h, frames


def reference_decode_cram_avi(payload: bytes) -> list[dict]:
    """INDEPENDENT MSV1-in-AVI decoder: own chunk walk
    (int.from_bytes, no struct), own bit handling, own skip state.
    Returns one dict per frame: width, height, lum_sum and the
    block-mode census."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    assert 8 + int.from_bytes(payload[4:8], "little") == len(payload)

    def chunks(buf: bytes, start: int):
        p = start
        while p + 8 <= len(buf):
            cid = buf[p : p + 4]
            sz = int.from_bytes(buf[p + 4 : p + 8], "little")
            assert p + 8 + sz <= len(buf), "truncated"
            yield cid, buf[p + 8 : p + 8 + sz]
            p += 8 + sz + (sz & 1)

    width = height = None
    frame_data: list[bytes] = []
    for cid, body in chunks(payload, 12):
        if cid == b"LIST" and body[:4] == b"hdrl":
            for scid, sbody in chunks(body, 4):
                if scid == b"avih":
                    width = int.from_bytes(sbody[32:36], "little")
                    height = int.from_bytes(sbody[36:40], "little")
                if scid == b"LIST" and sbody[:4] == b"strl":
                    assert sbody[12:16] == b"vids"
                    assert sbody[16:20] == b"CRAM"
        if cid == b"LIST" and body[:4] == b"movi":
            for scid, sbody in chunks(body, 4):
                if scid[2:4] == b"dc":
                    frame_data.append(bytes(sbody))
    assert width and height and width % 4 == 0 and height % 4 == 0

    bw, bh = width // 4, height // 4
    pix = [0] * (width * height)  # RGB555
    out = []
    for fidx, data in enumerate(frame_data):
        pos = 0
        census = {"skip": 0, "solid": 0, "two": 0, "eight": 0}
        run = 0
        done = 0
        for by in range(bh - 1, -1, -1):
            for bx in range(bw):
                if run > 0:
                    run -= 1
                    census["skip"] += 1
                    done += 1
                    continue  # pixels already hold the prior frame
                w0 = data[pos] | (data[pos + 1] << 8)
                pos += 2
                if w0 >= 0x8400 and w0 <= 0x87FF:
                    assert fidx > 0, "skip on keyframe"
                    run = w0 & 0x3FF
                    assert run >= 1
                    run -= 1
                    census["skip"] += 1
                    done += 1
                    continue
                if w0 & 0x8000:
                    census["solid"] += 1
                    for y in range(4):
                        for x in range(4):
                            pix[(by * 4 + y) * width + bx * 4 + x] = (
                                w0 & 0x7FFF
                            )
                    done += 1
                    continue
                mask = w0
                ca = data[pos] | (data[pos + 1] << 8)
                pos += 2
                if ca & 0x8000:
                    census["eight"] += 1
                    cs = [ca & 0x7FFF]
                    for _ in range(7):
                        cs.append(data[pos] | (data[pos + 1] << 8))
                        pos += 2
                    for k in range(16):
                        y, x = divmod(k, 4)
                        qd = (2 if y >= 2 else 0) + (1 if x >= 2 else 0)
                        v = cs[2 * qd] if (mask >> k) & 1 else cs[2 * qd + 1]
                        pix[(by * 4 + y) * width + bx * 4 + x] = v
                else:
                    census["two"] += 1
                    cb = data[pos] | (data[pos + 1] << 8)
                    pos += 2
                    for k in range(16):
                        y, x = divmod(k, 4)
                        v = ca if (mask >> k) & 1 else cb
                        pix[(by * 4 + y) * width + bx * 4 + x] = v
                done += 1
        assert pos == len(data) and done == bw * bh
        lum = 0
        for v in pix:
            r5, g5, b5 = (v >> 10) & 31, (v >> 5) & 31, v & 31
            r = (r5 << 3) | (r5 >> 2)
            g = (g5 << 3) | (g5 >> 2)
            b = (b5 << 3) | (b5 >> 2)
            lum += (r + g + b) // 3
        out.append({
            "width": width, "height": height, "lum_sum": lum,
            "n_blocks": bw * bh, "skip": census["skip"],
            "solid": census["solid"], "two": census["two"],
            "eight": census["eight"],
        })
    return out


def expected_rows(sf_dir: str) -> list[tuple]:
    import duckdb

    from google_sheets_etl_spark.operators.multimodal import encode_avi_cram

    con = duckdb.connect()
    ids = [
        int(r[0])
        for r in con.execute(
            f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
            " WHERE doc_id % 6 = 0 ORDER BY doc_id"
        ).fetchall()
    ]
    con.close()
    rows = []
    for doc_id in ids:
        w, h, rasters = cram_frame_rasters(doc_id)
        payload = encode_avi_cram(w, h, rasters)
        for f, d in enumerate(reference_decode_cram_avi(payload)):
            rows.append((
                doc_id, f, d["width"], d["height"], d["lum_sum"],
                d["n_blocks"], d["skip"], d["solid"], d["two"],
                d["eight"],
            ))
    return rows


def rows_to_sql(rows: list[tuple]) -> str:
    values = ",\n  ".join(
        "({}, {}, {}, {}, {}, {}, {}, {}, {}, {})".format(*r) for r in rows
    )
    return (
        "-- GENERATED by tools/gen_cram_fixture.py from "
        f"{SF_DIR}/documents.parquet; do not hand-edit\n"
        "SELECT CAST(media_id AS BIGINT) AS media_id,\n"
        "       CAST(frame_idx AS BIGINT) AS frame_idx,\n"
        "       CAST(width AS INT) AS width,\n"
        "       CAST(height AS INT) AS height,\n"
        "       CAST(lum_sum AS BIGINT) AS lum_sum,\n"
        "       CAST(n_blocks AS BIGINT) AS n_blocks,\n"
        "       CAST(skip_blocks AS BIGINT) AS skip_blocks,\n"
        "       CAST(solid_blocks AS BIGINT) AS solid_blocks,\n"
        "       CAST(two_color_blocks AS BIGINT) AS two_color_blocks,\n"
        "       CAST(eight_color_blocks AS BIGINT) AS eight_color_blocks\n"
        "FROM (VALUES\n  "
        + values
        + "\n) AS t(media_id, frame_idx, width, height, lum_sum,"
        " n_blocks, skip_blocks, solid_blocks, two_color_blocks,"
        " eight_color_blocks)"
    )


def main() -> None:
    rows = expected_rows(SF_DIR)
    with open(FIXTURE, "w") as f:
        f.write(rows_to_sql(rows) + "\n")
    print(f"wrote {len(rows)} rows to {FIXTURE}")


if __name__ == "__main__":
    main()
