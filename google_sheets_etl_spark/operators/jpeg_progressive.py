"""Progressive JPEG (ITU-T T.81 SOF2, Huffman) — the OTHER dominant
real-web JPEG shape next to 4:2:0 (large web images are routinely
saved progressive): DC/AC spectral selection across multiple scans,
successive approximation on both DC (arithmetic-shift point
transform, bit-refinement scans) and AC (magnitude point transform,
the G.1.2.3 correction-bit refinement algorithm), EOB-run coding
across blocks, interleaved DC scans on the MCU grid and
non-interleaved AC scans on each component's OWN (unpadded) block
grid.

Decode contract: progressive transmission REORDERS the same quantized
coefficients baseline carries — so for any raster,
``parse_jpeg(encode_jpeg_progressive(x)) ==
parse_jpeg(encode_jpeg(x))`` BIT-EXACTLY (same quant tables, same
IDCT/reconstruction path). That equality is the co-drift kill switch
the fixture discipline wants: the progressive encoder and decoder are
written from the spec independently of each other, and both must land
on the baseline pixels.

Pinned point transforms (T.81 G.1.2.1, the libjpeg-compatible
reading): DC uses the ARITHMETIC right shift of the signed
coefficient; AC shifts the MAGNITUDE (toward-zero). Pinned rejects:
'bad jpeg progressive scan', 'jpeg restart intervals in progressive
unsupported', plus every shared malformation class from the baseline
walk.

Scale shape: identical to baseline — per-payload work inside Arrow
batches via ``multimodal.decode_image``'s FFD8 dispatch (parse_jpeg
hands SOF2 payloads here), embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import struct

from .jpeg import (
    QUANT_CHROMA,
    QUANT_LUM,
    ZIGZAG,
    AC_CHROMA_BITS,
    AC_CHROMA_VALS,
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_CHROMA_BITS,
    DC_CHROMA_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    _BitReader,
    _BitWriter,
    _decode_symbol,
    _decode_table,
    _dct_matrix,
    _extend,
    _huffman_codes,
    _magnitude,
)

# Progressive AC scans need the EOBn symbols (r<<4, r = 1..14) the
# Annex-K SEQUENTIAL tables don't carry (real progressive encoders
# always emit optimized tables). This fixture table is the simplest
# valid one: every run/size symbol an AC progressive scan can emit —
# EOB0, ZRL, EOBn, and (r<<4)|s for s 1..10 — all at code length 8
# (176 codes of one length are trivially prefix-free; Kraft 176/256).
PROG_AC_VALS = sorted(
    {0x00, 0xF0}
    | {r << 4 for r in range(1, 15)}
    | {(r << 4) | s for r in range(16) for s in range(1, 11)}
)
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(PROG_AC_VALS),
                0, 0, 0, 0, 0, 0, 0, 0]


# ----------------------------------------------------------------- encode


def _quantized_blocks(w: int, h: int, raster: bytes, subsampling: str):
    """Quantized zigzag-order coefficient blocks per component on the
    MCU-PADDED grid — the exact arithmetic of ``encode_jpeg`` (same
    plane prep, padding, chroma mean, DCT matrix and rounding), so
    progressive output decodes to the baseline pixels."""
    import numpy as np

    fh, fv = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
    if len(raster) != w * h * 3:
        raise ValueError("raster size mismatch")
    rgb = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    full = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
    ]
    mcu_w, mcu_h = 8 * fh, 8 * fv
    mx_n = (w + mcu_w - 1) // mcu_w
    my_n = (h + mcu_h - 1) // mcu_h
    pw, ph = mx_n * mcu_w, my_n * mcu_h
    padded = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in full]
    planes = [padded[0]]
    for p in padded[1:]:
        if fh == 1 and fv == 1:
            planes.append(p)
        else:
            planes.append(
                p.reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3))
            )
    factors = [(fh, fv), (1, 1), (1, 1)]
    C = _dct_matrix()
    qts = [np.array(QUANT_LUM, dtype=np.float64).reshape(8, 8),
           np.array(QUANT_CHROMA, dtype=np.float64).reshape(8, 8)]
    blocks = []
    for ci, plane in enumerate(planes):
        hi, vi = factors[ci]
        bw, bh = mx_n * hi, my_n * vi
        tsel = 0 if ci == 0 else 1
        arr = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                block = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coeffs = C @ block @ C.T
                q = np.round(coeffs / qts[tsel]).astype(np.int64)
                flat = q.reshape(-1)
                arr[by, bx] = flat[ZIGZAG]  # zigzag scan order
        blocks.append(arr)
    return factors, mx_n, my_n, blocks


class _ScanWriter:
    """Per-scan entropy writer with the EOB-run + buffered-
    correction-bit machinery AC scans share."""

    def __init__(self) -> None:
        self.w = _BitWriter()
        self.eobrun = 0
        self.pending: list[int] = []

    def flush_eobrun(self, ac_tab) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            ln, code = ac_tab[nbits << 4]
            self.w.write(code, ln)
            if nbits:
                self.w.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for bit in self.pending:
            self.w.write(bit, 1)
        self.pending = []


def encode_jpeg_progressive(
    w: int, h: int, raster: bytes, subsampling: str = "444"
) -> bytes:
    """Progressive JFIF writer over the standard four-phase scan
    script: (1) interleaved DC first at Al=1; per component (2) AC
    first Ss=1..63 at Al=1 then (3) AC refinement to Al=0; (4)
    interleaved DC refinement — exercising spectral selection,
    EOB runs, and BOTH successive-approximation refinement
    algorithms. Same Annex K quant + typical Huffman tables as the
    baseline writer."""
    try:
        factors, mx_n, my_n, blocks = _quantized_blocks(
            w, h, raster, subsampling
        )
    except KeyError:
        raise ValueError("encode_jpeg: unknown subsampling mode")
    fh, fv = factors[0]
    dc_tabs = [_huffman_codes(DC_LUM_BITS, DC_LUM_VALS),
               _huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    prog_ac = _huffman_codes(PROG_AC_BITS, PROG_AC_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    for tid, table in ((0, QUANT_LUM), (1, QUANT_CHROMA)):
        zz_t = bytes(table[ZIGZAG[i]] for i in range(64))
        out += seg(0xFFDB, bytes([tid]) + zz_t)
    out += seg(
        0xFFC2,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (fh << 4) | fv, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for tc_th, bits, vals in (
        (0x00, DC_LUM_BITS, DC_LUM_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x10, PROG_AC_BITS, PROG_AC_VALS),
    ):
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))

    def sos(comps: list[tuple[int, int]], ss: int, se: int,
            ah: int, al: int) -> bytes:
        body = bytes([len(comps)])
        for cid, tsel in comps:
            body += bytes([cid, tsel])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, body)

    # scan 1: DC first, interleaved, Al=1 (arithmetic-shift transform)
    out += sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, 1)
    wtr = _BitWriter()
    prev = [0, 0, 0]
    for my in range(my_n):
        for mx in range(mx_n):
            for ci in range(3):
                hi, vi = factors[ci]
                tsel = 0 if ci == 0 else 1
                for vb in range(vi):
                    for hb in range(hi):
                        dc = int(blocks[ci][my * vi + vb, mx * hi + hb, 0]) >> 1
                        diff = dc - prev[ci]
                        prev[ci] = dc
                        cat, bits_ = _magnitude(diff)
                        ln, code = dc_tabs[tsel][cat]
                        wtr.write(code, ln)
                        if cat:
                            wtr.write(bits_, cat)
    out += wtr.flush()

    # per component: AC first (Al=1) then AC refinement (Ah=1, Al=0)
    # over the component's OWN unpadded block grid
    for ci in range(3):
        hi, vi = factors[ci]
        hmax, vmax = factors[0]
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        bw, bh = (cw + 7) // 8, (ch + 7) // 8
        ac_tab = prog_ac

        # ---- AC first scan, Al=1 (magnitude point transform) ----
        out += sos([(ci + 1, 0x00)], 1, 63, 0, 1)
        sw = _ScanWriter()
        for by in range(bh):
            for bx in range(bw):
                zz = blocks[ci][by, bx]
                vals = []
                for k in range(1, 64):
                    v = int(zz[k])
                    mag = (v if v >= 0 else -v) >> 1
                    vals.append(mag if v >= 0 else -mag)
                last = 0
                for k in range(63, 0, -1):
                    if vals[k - 1]:
                        last = k
                        break
                if last == 0:
                    sw.eobrun += 1
                    if sw.eobrun == 0x7FFF:
                        sw.flush_eobrun(ac_tab)
                    continue
                sw.flush_eobrun(ac_tab)
                run = 0
                for k in range(1, last + 1):
                    v = vals[k - 1]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_tab[0xF0]
                        sw.w.write(code, ln)
                        run -= 16
                    cat, bits_ = _magnitude(v)
                    ln, code = ac_tab[(run << 4) | cat]
                    sw.w.write(code, ln)
                    sw.w.write(bits_, cat)
                    run = 0
                if last < 63:
                    sw.eobrun += 1
                    if sw.eobrun == 0x7FFF:
                        sw.flush_eobrun(ac_tab)
        sw.flush_eobrun(ac_tab)
        out += sw.w.flush()

        # ---- AC refinement scan, Ah=1 -> Al=0 (G.1.2.3) ----
        out += sos([(ci + 1, 0x00)], 1, 63, 1, 0)
        sw = _ScanWriter()
        for by in range(bh):
            for bx in range(bw):
                zz = blocks[ci][by, bx]
                absv = [abs(int(zz[k])) for k in range(1, 64)]
                eob = 0
                for k in range(1, 64):
                    if absv[k - 1] == 1:
                        eob = k
                run = 0
                local_bits: list[int] = []
                for k in range(1, 64):
                    temp = absv[k - 1]
                    if temp == 0:
                        run += 1
                        continue
                    while run > 15 and k <= eob:
                        sw.flush_eobrun(ac_tab)
                        ln, code = ac_tab[0xF0]
                        sw.w.write(code, ln)
                        run -= 16
                        for bit in local_bits:
                            sw.w.write(bit, 1)
                        local_bits = []
                    if temp > 1:
                        # already significant: buffer its correction bit
                        local_bits.append(temp & 1)
                        continue
                    # newly significant (magnitude exactly 1)
                    sw.flush_eobrun(ac_tab)
                    ln, code = ac_tab[(run << 4) | 1]
                    sw.w.write(code, ln)
                    sw.w.write(1 if int(zz[k]) >= 0 else 0, 1)
                    for bit in local_bits:
                        sw.w.write(bit, 1)
                    local_bits = []
                    run = 0
                if run > 0 or local_bits:
                    sw.eobrun += 1
                    sw.pending.extend(local_bits)
                    if sw.eobrun == 0x7FFF:
                        sw.flush_eobrun(ac_tab)
        sw.flush_eobrun(ac_tab)
        out += sw.w.flush()

    # final scan: DC refinement, interleaved, Ah=1 -> Al=0 (raw bits)
    out += sos([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 1, 0)
    wtr = _BitWriter()
    for my in range(my_n):
        for mx in range(mx_n):
            for ci in range(3):
                hi, vi = factors[ci]
                for vb in range(vi):
                    for hb in range(hi):
                        wtr.write(
                            int(blocks[ci][my * vi + vb, mx * hi + hb, 0]) & 1,
                            1,
                        )
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------------------------------- decode


def parse_jpeg_progressive(payload: bytes) -> tuple[int, int, bytes]:
    """Strict progressive decode — multiple SOS scans accumulated
    into per-component coefficient planes, then the SHARED
    dequantize/IDCT/reconstruction contract (half-up rounding,
    nearest-neighbor chroma replication). Reached through
    ``parse_jpeg``'s SOF2 dispatch."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a jpeg payload")
    pos = 2
    qtables: dict[int, "np.ndarray"] = {}
    htables: dict[int, dict] = {}
    restart_interval = 0
    w = h = None
    comps: list[tuple[int, int, int, int]] = []
    coef: list["np.ndarray"] = []
    saw_scan = False
    geom = None  # (hmax, vmax, mx_n, my_n)
    while True:
        if pos >= len(payload):
            raise ValueError("jpeg missing eoi")
        if payload[pos] != 0xFF:
            raise ValueError("malformed jpeg marker stream")
        marker = payload[pos + 1] if pos + 1 < len(payload) else None
        if marker is None:
            raise ValueError("truncated jpeg marker")
        if marker == 0xFF:
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            if not saw_scan:
                raise ValueError("jpeg missing scan data")
            if pos != len(payload):
                raise ValueError("trailing bytes after jpeg eoi")
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            raise ValueError("unexpected marker in jpeg entropy stream")
        if pos + 2 > len(payload):
            raise ValueError("truncated jpeg marker")
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        if seglen < 2 or pos + seglen > len(payload):
            raise ValueError("truncated jpeg segment")
        data = payload[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:
            dpos = 0
            while dpos < len(data):
                pq_tq = data[dpos]
                if pq_tq >> 4:
                    raise ValueError("16-bit jpeg quant tables unsupported")
                if dpos + 65 > len(data):
                    raise ValueError("truncated jpeg segment")
                zz = data[dpos + 1:dpos + 65]
                q = np.zeros(64, dtype=np.float64)
                for i in range(64):
                    q[ZIGZAG[i]] = zz[i]
                qtables[pq_tq & 0x0F] = q.reshape(8, 8)
                dpos += 65
        elif marker == 0xC4:
            dpos = 0
            while dpos < len(data):
                if dpos + 17 > len(data):
                    raise ValueError("truncated jpeg segment")
                tc_th = data[dpos]
                bits = list(data[dpos + 1:dpos + 17])
                nsym = sum(bits)
                vals = list(data[dpos + 17:dpos + 17 + nsym])
                if len(vals) != nsym:
                    raise ValueError("truncated jpeg segment")
                htables[tc_th] = _decode_table(bits, vals)
                dpos += 17 + nsym
        elif marker == 0xDD:
            if len(data) < 2:
                raise ValueError("truncated jpeg segment")
            restart_interval = struct.unpack(">H", data[:2])[0]
        elif marker == 0xC2:
            if len(data) < 6:
                raise ValueError("truncated jpeg segment")
            prec, h, w, nc = struct.unpack(">BHHB", data[:6])
            if prec != 8:
                raise ValueError("only 8-bit jpeg supported")
            if nc not in (1, 3):
                raise ValueError("unsupported jpeg component count")
            if len(data) < 6 + 3 * nc:
                raise ValueError("truncated jpeg segment")
            for i in range(nc):
                cid, hv, tq = data[6 + 3 * i:9 + 3 * i]
                comps.append((cid, tq, hv >> 4, hv & 0x0F))
            fs = [(hi, vi) for (_, _, hi, vi) in comps]
            if fs not in (
                [(1, 1)],
                [(1, 1)] * 3,
                [(2, 1), (1, 1), (1, 1)],
                [(2, 2), (1, 1), (1, 1)],
            ):
                raise ValueError("unsupported jpeg sampling factors")
            hmax = max(c[2] for c in comps)
            vmax = max(c[3] for c in comps)
            mx_n = (w + 8 * hmax - 1) // (8 * hmax)
            my_n = (h + 8 * vmax - 1) // (8 * vmax)
            geom = (hmax, vmax, mx_n, my_n)
            coef = [
                np.zeros((my_n * c[3], mx_n * c[2], 64), dtype=np.int64)
                for c in comps
            ]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("bad jpeg progressive scan")
        elif marker == 0xDA:
            if w is None or geom is None:
                raise ValueError("jpeg missing sof0")
            if restart_interval:
                raise ValueError(
                    "jpeg restart intervals in progressive unsupported"
                )
            if not data:
                raise ValueError("truncated jpeg segment")
            ns = data[0]
            if len(data) < 1 + 2 * ns + 3:
                raise ValueError("truncated jpeg segment")
            scomps: list[tuple[int, int, int]] = []
            for i in range(ns):
                cs, tsel = data[1 + 2 * i], data[2 + 2 * i]
                idx = next(
                    (j for j, c in enumerate(comps) if c[0] == cs), None
                )
                if idx is None:
                    raise ValueError("jpeg scan component mismatch")
                scomps.append((idx, tsel >> 4, tsel & 0x0F))
            ss, se = data[1 + 2 * ns], data[2 + 2 * ns]
            ahal = data[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            # entropy segment: forward scan to the next true marker
            p = pos
            while True:
                p2 = payload.find(b"\xff", p)
                if p2 < 0 or p2 + 1 >= len(payload):
                    raise ValueError("jpeg missing eoi")
                nxt = payload[p2 + 1]
                if nxt == 0x00:
                    p = p2 + 2
                    continue
                if nxt == 0xFF:
                    p = p2 + 1
                    continue
                if 0xD0 <= nxt <= 0xD7:
                    raise ValueError(
                        "jpeg restart intervals in progressive unsupported"
                    )
                end = p2
                break
            seg_end = end
            while seg_end > pos and payload[seg_end - 1] == 0xFF:
                seg_end -= 1  # trailing fill bytes are marker padding
            _decode_scan(
                payload[pos:seg_end], comps, coef, scomps,
                ss, se, ah, al, htables, geom, w, h,
            )
            saw_scan = True
            pos = end
        # APPn / COM: skipped
    if w is None:
        raise ValueError("jpeg missing sof0")
    hmax, vmax, mx_n, my_n = geom
    nc = len(comps)
    C = _dct_matrix()
    recon = []
    for p_arr, c in zip(coef, comps):
        qt = qtables.get(c[1])
        if qt is None:
            raise ValueError("jpeg table reference undefined")
        bh, bw = p_arr.shape[0], p_arr.shape[1]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                zz = p_arr[by, bx]
                coeffs = np.zeros(64, dtype=np.float64)
                for i in range(64):
                    coeffs[ZIGZAG[i]] = zz[i]
                block = C.T @ (coeffs.reshape(8, 8) * qt) @ C
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = block
        s = np.clip(np.floor(plane + 128.0 + 0.5), 0, 255)
        fy, fx = vmax // c[3], hmax // c[2]
        if fy > 1:
            s = np.repeat(s, fy, axis=0)
        if fx > 1:
            s = np.repeat(s, fx, axis=1)
        recon.append(s[:h, :w])
    if nc == 1:
        y = recon[0].astype(np.uint8)
        return w, h, np.repeat(y[:, :, None], 3, axis=2).tobytes()
    y, cb, cr = recon
    r = np.clip(np.floor(y + 1.402 * (cr - 128.0) + 0.5), 0, 255)
    g = np.clip(
        np.floor(
            y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0) + 0.5
        ),
        0,
        255,
    )
    b = np.clip(np.floor(y + 1.772 * (cb - 128.0) + 0.5), 0, 255)
    out = np.stack([r, g, b], axis=2).astype(np.uint8)
    return w, h, out.tobytes()


def _decode_scan(entropy, comps, coef, scomps, ss, se, ah, al,
                 htables, geom, w, h) -> int:
    """Decode ONE progressive scan into the coefficient planes.
    Validates the (Ss, Se, Ah, Al) grammar strictly."""
    hmax, vmax, mx_n, my_n = geom
    # successive-approximation grammar (T.81 G.1.1.1): Al in 0..13;
    # a refinement scan refines exactly one bit, so Ah == Al + 1
    # (r11 ADVICE strictness gap)
    if al > 13 or (ah != 0 and ah != al + 1):
        raise ValueError("bad jpeg progressive scan")
    reader = _BitReader(entropy)
    if ss == 0:
        if se != 0:
            raise ValueError("bad jpeg progressive scan")
        # ---- DC scan: interleaved over the MCU grid (or a single
        # component's padded grid when Ns == 1) ----
        if ah == 0:
            prev = [0] * len(comps)
            tabs = {}
            for ci, dct, _ in scomps:
                tab = htables.get(0x00 | dct)
                if tab is None:
                    raise ValueError("jpeg table reference undefined")
                tabs[ci] = tab
        if len(scomps) > 1:
            walk = []
            for my in range(my_n):
                for mx in range(mx_n):
                    for ci, dct, act in scomps:
                        _, _, hi, vi = comps[ci]
                        for vb in range(vi):
                            for hb in range(hi):
                                walk.append((ci, my * vi + vb, mx * hi + hb))
        else:
            # non-interleaved DC scan: the component's NATURAL grid
            # (ceil(comp_dim/8)), NOT the MCU-padded one — T.81 A.2.2
            ci = scomps[0][0]
            _, _, hi, vi = comps[ci]
            cw = (w * hi + hmax - 1) // hmax
            ch = (h * vi + vmax - 1) // vmax
            bw, bh = (cw + 7) // 8, (ch + 7) // 8
            walk = [(ci, by, bx) for by in range(bh) for bx in range(bw)]
        for ci, by, bx in walk:
            if ah == 0:
                cat = _decode_symbol(reader, tabs[ci])
                diff = _extend(reader.read_bits(cat), cat)
                prev[ci] += diff
                coef[ci][by, bx, 0] = prev[ci] << al
            else:
                if reader.read_bits(1):
                    coef[ci][by, bx, 0] |= 1 << al
        return 0
    # ---- AC scan: exactly one component, natural block grid ----
    if len(scomps) != 1 or not (1 <= ss <= se <= 63):
        raise ValueError("bad jpeg progressive scan")
    ci, _, act = scomps[0]
    ac_tab = htables.get(0x10 | act)
    if ac_tab is None:
        raise ValueError("jpeg table reference undefined")
    _, _, hi, vi = comps[ci]
    cw = (w * hi + hmax - 1) // hmax
    ch = (h * vi + vmax - 1) // vmax
    bw, bh = (cw + 7) // 8, (ch + 7) // 8
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    for by in range(bh):
        for bx in range(bw):
            zz = coef[ci][by, bx]
            if ah == 0:
                # -------- AC first scan --------
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = _decode_symbol(reader, ac_tab)
                    r, s = sym >> 4, sym & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("jpeg coefficient index overflow")
                    zz[k] = _extend(reader.read_bits(s), s) << al
                    k += 1
            else:
                # -------- AC refinement scan (G.1.2.3) --------
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = _decode_symbol(reader, ac_tab)
                        r, s = sym >> 4, sym & 0x0F
                        if s:
                            if s != 1:
                                raise ValueError(
                                    "bad jpeg progressive scan"
                                )
                            val = p1 if reader.read_bits(1) else m1
                        else:
                            if r != 15:
                                # refinement convention: the run
                                # INCLUDES the current block — its
                                # remaining correction bits are
                                # processed below, then the count
                                # decrements (T.81 G.1.2.3)
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.read_bits(r)
                                break
                            val = 0
                        while k <= se:
                            if zz[k] != 0:
                                if reader.read_bits(1):
                                    if (zz[k] & p1) == 0:
                                        zz[k] += p1 if zz[k] >= 0 else m1
                            else:
                                if r == 0:
                                    if val:
                                        zz[k] = val
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if eobrun > 0:
                    while k <= se:
                        if zz[k] != 0:
                            if reader.read_bits(1):
                                if (zz[k] & p1) == 0:
                                    zz[k] += p1 if zz[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
    # an EOB-run may not extend past the scan's final block — a
    # leftover count means the encoder claimed blocks that don't
    # exist (r11 ADVICE strictness gap)
    if eobrun > 0:
        raise ValueError("bad jpeg progressive scan")
    return 0
