#!/usr/bin/env python
"""Regenerate the literal-expected JPEG luminance fixture — the
regenerated-ground-truth discipline (multimodal PPM / BPE / unigram):
an INDEPENDENT pure-Python baseline-JPEG decoder, sharing no code with
``operators/jpeg.py`` (canonical-code-RANGE Huffman navigation per
T.81 F.2.2.3 vs the operator's dict-keyed tables; scalar separable
IDCT loops vs the operator's matrix form), decodes the SAME payloads
the ``jpeg_decode_features`` query assembles and writes the expected
per-image luminance sums as a literal VALUES oracle.

JPEG is LOSSY, so the oracle cannot recompute from the pixel formula
(the PNG/PPM pattern); instead the DECODE CONTRACT (float64 IDCT,
half-up rounding + clamp at reconstruction and at YCbCr→RGB — shared
by necessity, like the unigram Viterbi tie-break) is implemented twice
and the fixture pins agreement on every payload. The payload
DEFINITION (formula pixels through the package encoder) is shared —
ground truth here certifies the decoder.

Usage: python tools/gen_jpeg_fixture.py   (rewrites the fixture)
The freshness test (tests/test_queries_oracle.py) re-runs this decoder
and fails on drift.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "jpeg_lum_sf001.sql",
)

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _CanonicalHuff:
    """T.81 F.2.2.3 decode: MINCODE/MAXCODE/VALPTR per code length —
    a genuinely different decode structure from the operator's
    (length, code)->symbol dict."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, nextbit) -> int:
        code = nextbit()
        ln = 1
        while self.maxcode[ln] < code or self.maxcode[ln] == -1:
            ln += 1
            if ln > 16:
                raise ValueError("invalid jpeg huffman code")
            code = (code << 1) | nextbit()
        return self.vals[self.valptr[ln] + code - self.mincode[ln]]


def reference_decode_jpeg(payload: bytes) -> tuple[int, int, list[int]]:
    """Scalar baseline decoder → (w, h, flat RGB list). Supports the
    same scope as the operator (SOF0, 8-bit, 4:4:4 / 4:2:2 / 4:2:0
    with MCU interleave and nearest-neighbor chroma replication, no
    restarts)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a jpeg payload")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[int, _CanonicalHuff] = {}
    ri = 0
    w = h = None
    comps: list[tuple[int, int]] = []
    scan: list[tuple[int, int, int]] = []
    entropy_start = None
    while pos < len(payload):
        assert payload[pos] == 0xFF
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        pos += 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = (payload[pos] << 8) | payload[pos + 1]
        data = payload[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:
            d = 0
            while d < len(data):
                tid = data[d] & 0x0F
                zz = data[d + 1:d + 65]
                tab = [0] * 64
                for i in range(64):
                    tab[_ZIGZAG[i]] = zz[i]
                qt[tid] = tab
                d += 65
        elif marker == 0xC0:
            h = (data[1] << 8) | data[2]
            w = (data[3] << 8) | data[4]
            nc = data[5]
            for i in range(nc):
                hv = data[7 + 3 * i]
                comps.append(
                    (data[6 + 3 * i], data[8 + 3 * i], hv >> 4, hv & 0x0F)
                )
        elif marker == 0xC4:
            d = 0
            while d < len(data):
                tc_th = data[d]
                bits = list(data[d + 1:d + 17])
                nsym = sum(bits)
                vals = list(data[d + 17:d + 17 + nsym])
                huff[tc_th] = _CanonicalHuff(bits, vals)
                d += 17 + nsym
        elif marker == 0xDD:
            ri = (data[0] << 8) | data[1]
        elif marker == 0xDA:
            ns = data[0]
            for i in range(ns):
                cs, tsel = data[1 + 2 * i], data[2 + 2 * i]
                idx = [j for j, c in enumerate(comps) if c[0] == cs][0]
                scan.append((idx, tsel >> 4, tsel & 0x0F))
            entropy_start = pos
            break
    end = payload.rfind(b"\xff\xd9")
    entropy = payload[entropy_start:end]
    # restart intervals: scalar split at byte-aligned FF D0-D7
    # boundaries (FF 00 is stuffed data)
    segs: list[bytes] = []
    if ri:
        k = s0 = 0
        while k + 1 < len(entropy):
            if entropy[k] == 0xFF and 0xD0 <= entropy[k + 1] <= 0xD7:
                segs.append(entropy[s0:k])
                k = s0 = k + 2
            elif entropy[k] == 0xFF:
                k += 2
            else:
                k += 1
        segs.append(entropy[s0:])
    else:
        segs.append(entropy)

    state = {"seg": 0, "pos": 0, "acc": 0, "n": 0}

    def nextbit() -> int:
        if state["n"] == 0:
            data = segs[state["seg"]]
            b = data[state["pos"]]
            state["pos"] += 1
            if b == 0xFF:
                state["pos"] += 1  # skip stuffed 0x00
            state["acc"] = b
            state["n"] = 8
        state["n"] -= 1
        return (state["acc"] >> state["n"]) & 1

    def next_segment() -> None:
        state["seg"] += 1
        state["pos"] = 0
        state["n"] = 0

    def receive_extend(cat: int) -> int:
        if cat == 0:
            return 0
        v = 0
        for _ in range(cat):
            v = (v << 1) | nextbit()
        if v < (1 << (cat - 1)):
            v -= (1 << cat) - 1
        return v

    # precomputed cosine table for the scalar separable IDCT
    cos_t = [
        [math.cos((2 * x + 1) * u * math.pi / 16.0) for x in range(8)]
        for u in range(8)
    ]

    def idct_block(coef: list[float]) -> list[list[float]]:
        # rows then columns, explicit scalar loops
        tmp = [[0.0] * 8 for _ in range(8)]
        for y in range(8):
            for x in range(8):
                s = 0.0
                for u in range(8):
                    a = (1.0 / (2.0 * math.sqrt(2.0))) if u == 0 else 0.5
                    s += a * coef[y * 8 + u] * cos_t[u][x]
                tmp[y][x] = s
        out = [[0.0] * 8 for _ in range(8)]
        for y in range(8):
            for x in range(8):
                s = 0.0
                for v in range(8):
                    a = (1.0 / (2.0 * math.sqrt(2.0))) if v == 0 else 0.5
                    s += a * tmp[v][x] * cos_t[v][y]
                out[y][x] = s
        return out

    nc = len(comps)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mx_n = (w + 8 * hmax - 1) // (8 * hmax)
    my_n = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        [[0] * (mx_n * c[2] * 8) for _ in range(my_n * c[3] * 8)]
        for c in comps
    ]
    prev_dc = [0] * nc
    mcu_count = 0
    for my in range(my_n):
      for mx in range(mx_n):
        if ri and mcu_count and mcu_count % ri == 0:
            next_segment()
            prev_dc = [0] * nc
        mcu_count += 1
        for ci, dct, act in scan:
            hi, vi = comps[ci][2], comps[ci][3]
            for vb in range(vi):
              for hb in range(hi):
                dtab = huff[0x00 | dct]
                atab = huff[0x10 | act]
                q = qt[comps[ci][1]]
                zz = [0] * 64
                cat = dtab.decode(nextbit)
                prev_dc[ci] += receive_extend(cat)
                zz[0] = prev_dc[ci]
                i = 1
                while i < 64:
                    sym = atab.decode(nextbit)
                    if sym == 0x00:
                        break
                    if sym == 0xF0:
                        i += 16
                        continue
                    i += sym >> 4
                    zz[i] = receive_extend(sym & 0x0F)
                    i += 1
                coef = [0.0] * 64
                for i in range(64):
                    coef[_ZIGZAG[i]] = float(zz[i]) * q[_ZIGZAG[i]]
                blk = idct_block(coef)
                by, bx = my * vi + vb, mx * hi + hb
                for y in range(8):
                    for x in range(8):
                        # reconstruction contract: +128, half-up, clamp
                        v = math.floor(blk[y][x] + 128.0 + 0.5)
                        planes[ci][by * 8 + y][bx * 8 + x] = min(
                            255, max(0, int(v))
                        )
    out: list[int] = []
    for y in range(h):
        for x in range(w):
            if nc == 1:
                yv = planes[0][y][x]
                out += [yv, yv, yv]
            else:
                # pinned upsampling contract: nearest-neighbor sample
                # replication — pixel (x, y) reads component sample
                # (y*vi//vmax, x*hi//hmax), realized here as scalar
                # per-pixel index arithmetic (the operator uses
                # numpy repeat — different structure, same rule)
                yv = planes[0][y * comps[0][3] // vmax][
                    x * comps[0][2] // hmax]
                cb = planes[1][y * comps[1][3] // vmax][
                    x * comps[1][2] // hmax]
                cr = planes[2][y * comps[2][3] // vmax][
                    x * comps[2][2] // hmax]
                r = math.floor(yv + 1.402 * (cr - 128.0) + 0.5)
                g = math.floor(
                    yv - 0.344136286 * (cb - 128.0)
                    - 0.714136286 * (cr - 128.0) + 0.5
                )
                b = math.floor(yv + 1.772 * (cb - 128.0) + 0.5)
                out += [
                    min(255, max(0, int(r))),
                    min(255, max(0, int(g))),
                    min(255, max(0, int(b))),
                ]
    return w, h, out


FIXTURE_420 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "jpeg420_lum_sf001.sql",
)


def jpeg420_payload_for_doc(doc_id: int) -> bytes:
    """The payload DEFINITION shared with the jpeg420_decode_features
    query: formula pixels through the package encoder at 4:2:0. Dims
    cycle 14/19/24 x 13/18 — odd widths/heights exercise the chroma
    crop and non-multiple-of-16 dims exercise 16x16-MCU edge padding
    with subsampled interleave."""
    from google_sheets_etl_spark.operators.jpeg import encode_jpeg

    w = 14 + 5 * (doc_id % 3)
    h = 13 + 5 * (doc_id % 2)
    raster = bytes(
        (doc_id + x * 7 + y * 13 + c * 37) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    return encode_jpeg(w, h, raster, subsampling="420")


FIXTURE_DRI = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "jpegdri_lum_sf001.sql",
)


def jpegdri_payload_for_doc(doc_id: int) -> bytes:
    """The restart-interval plant: dims 30/35/40 x 29/34 (several
    MCUs at every subsampling), the subsampling mode cycling
    444/420/422 and the restart interval cycling 1/2/3 MCUs — every
    (mode, interval) pair appears across the corpus."""
    from google_sheets_etl_spark.operators.jpeg import encode_jpeg

    w = 30 + 5 * (doc_id % 3)
    h = 29 + 5 * (doc_id % 2)
    raster = bytes(
        (doc_id + x * 7 + y * 13 + c * 37) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    return encode_jpeg(
        w, h, raster,
        subsampling=["444", "420", "422"][doc_id % 3],
        restart_interval=1 + doc_id % 3,
    )


def jpeg_payload_for_doc(doc_id: int) -> bytes:
    """The payload DEFINITION shared with the jpeg_decode_features
    query: formula pixels through the package encoder."""
    from google_sheets_etl_spark.operators.jpeg import encode_jpeg

    w = 8 + 4 * (doc_id % 3)
    h = 8 + 4 * (doc_id % 2)
    raster = bytes(
        (doc_id + x * 7 + y * 13 + c * 37) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    return encode_jpeg(w, h, raster)


def expected_lum_sums(sf_dir: str, payload_fn=None) -> list[tuple[int, int]]:
    import duckdb

    con = duckdb.connect()
    ids = [
        int(r[0])
        for r in con.execute(
            f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
            " ORDER BY doc_id"
        ).fetchall()
    ]
    con.close()
    payload_fn = payload_fn or jpeg_payload_for_doc
    out = []
    for doc_id in ids:
        _, _, rgb = reference_decode_jpeg(payload_fn(doc_id))
        lum = sum(
            (rgb[3 * p] + rgb[3 * p + 1] + rgb[3 * p + 2]) // 3
            for p in range(len(rgb) // 3)
        )
        out.append((doc_id, lum))
    return out


def sums_to_sql(sums: list[tuple[int, int]]) -> str:
    values = ",\n  ".join(f"({i}, {s})" for i, s in sums)
    return (
        "-- GENERATED by tools/gen_jpeg_fixture.py from "
        f"{SF_DIR}/documents.parquet; do not hand-edit\n"
        "SELECT CAST(media_id AS BIGINT) AS media_id,\n"
        "       CAST(lum_sum AS BIGINT) AS lum_sum\n"
        "FROM (VALUES\n  "
        + values
        + "\n) AS t(media_id, lum_sum)"
    )


def main() -> None:
    sums = expected_lum_sums(SF_DIR)
    with open(FIXTURE, "w") as f:
        f.write(sums_to_sql(sums) + "\n")
    print(f"wrote {len(sums)} rows to {FIXTURE}")
    sums420 = expected_lum_sums(SF_DIR, jpeg420_payload_for_doc)
    with open(FIXTURE_420, "w") as f:
        f.write(sums_to_sql(sums420) + "\n")
    print(f"wrote {len(sums420)} rows to {FIXTURE_420}")
    sumsdri = expected_lum_sums(SF_DIR, jpegdri_payload_for_doc)
    with open(FIXTURE_DRI, "w") as f:
        f.write(sums_to_sql(sumsdri) + "\n")
    print(f"wrote {len(sumsdri)} rows to {FIXTURE_DRI}")


if __name__ == "__main__":
    main()
