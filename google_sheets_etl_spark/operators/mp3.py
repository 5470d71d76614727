"""MP3 / MPEG-audio frame-header WALK (ISO/IEC 11172-3 + 13818-3
header grammar) — the pipeline-realistic audio operator for crawl
corpora: real web audio is MP3/AAC, and what a curation pipeline
needs per payload is duration / bitrate / VBR / container stats plus
a strict admission verdict — obtainable from the 4-byte frame
headers alone, WITHOUT decoding audio (the
``warc_content_length_walk`` shape on the audio axis: walk by
declared lengths, verify structure, never inflate payloads).

Covers: MPEG version 1 / 2 / 2.5 (the 2.5 extension uses the
version-ID bit pattern ``00``), Layers I/II/III, the per-(version,
layer) bitrate tables, padding slots (4-byte slots in Layer I, 1-byte
otherwise), optional CRC-16 protection (affects the Xing offset, not
the frame length — the CRC bytes live inside the declared length),
ID3v2 prefix tags (syncsafe 28-bit size), ID3v1 trailer tags (fixed
128 bytes), and Xing/Info/VBRI VBR headers in the first frame's side
region.

STRICT-parse contract (the package-wide admission discipline): the
stream must be frames end-to-end — optional ID3v2, then contiguous
frames whose declared lengths tile the payload exactly, then an
optional ID3v1 block. Pinned reject classes: 'not an mp3 payload'
(no frame sync where the first frame must start), 'bad mp3 frame
header' (reserved version/layer/samplerate/emphasis, bitrate index
15), 'free-format mp3 unsupported' (bitrate index 0 — legal but
requires length discovery by resync, out of scope like 16-bit quant
tables in JPEG), 'truncated mp3 frame' (declared length overruns the
payload), 'mp3 frame sync lost' (bytes between frames — the strict
twin of lenient decoders' resync-skip), 'mp3 stream parameter change'
(version/layer/samplerate flip mid-stream), 'bad id3v2 tag'
(non-syncsafe size bytes).

Stats are INTEGER-exact: bitrates in kbps straight from the table,
``duration_us = n_frames * samples_per_frame * 10^6 // sample_rate``
(floor division pinned in both this walker and the independent
fixture walker), ``is_vbr`` = more than one distinct bitrate index.

Scale shape: per-payload work inside Arrow batches
(``mapInPandas``), embarrassingly parallel, no shuffle — identical
cost envelope to the WAV/JPEG audit kernels. A 100 TB audio crawl
walk is pure map-side metadata extraction; nothing ever inflates.

The builders (:func:`build_mp3_stream`, :func:`mp3_payload_for_doc`)
are FIXTURE SOURCES shared verbatim with ``tools/gen_mp3_fixture.py``
whose INDEPENDENT header walker supplies the literal expected stats
(the encode_pdf_text / encode_wav discipline).
"""

from __future__ import annotations

import struct

__all__ = [
    "MP3_BITRATES_KBPS",
    "MP3_SAMPLERATES",
    "parse_mp3_stream",
    "build_mp3_stream",
    "mp3_payload_for_doc",
    "mp3_frame_stats",
    "mp3_decode_audit",
]

# kbps by (version-group, layer); index 0 = free format, 15 = bad.
# MPEG-2 and 2.5 share one table per layer; Layers II and III share
# the low-rate table in the MPEG-2 group.
MP3_BITRATES_KBPS = {
    ("1", 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320,
               352, 384, 416, 448),
    ("1", 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
               256, 320, 384),
    ("1", 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
               224, 256, 320),
    ("2", 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176,
               192, 224, 256),
    ("2", 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
               144, 160),
    ("2", 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
               144, 160),
}

MP3_SAMPLERATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}

_VERSION_BITS = {"1": 0b11, "2": 0b10, "2.5": 0b00}
_BITS_VERSION = {0b11: "1", 0b10: "2", 0b00: "2.5"}
_LAYER_BITS = {1: 0b11, 2: 0b10, 3: 0b01}
_BITS_LAYER = {0b11: 1, 0b10: 2, 0b01: 3}


def _vgroup(version: str) -> str:
    return "1" if version == "1" else "2"


def samples_per_frame(version: str, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version == "1" else 576


def frame_length(version: str, layer: int, bitrate_kbps: int,
                 sample_rate: int, padding: int) -> int:
    """Declared frame length in bytes (header included). Layer I
    counts 4-byte slots; Layers II/III count bytes; Layer III halves
    the coefficient 144 -> 72 in the MPEG-2 group (576 samples)."""
    br = bitrate_kbps * 1000
    if layer == 1:
        return (12 * br // sample_rate + padding) * 4
    coeff = 72 if (layer == 3 and version != "1") else 144
    return coeff * br // sample_rate + padding


def _side_info_len(version: str, mono: bool) -> int:
    """Layer III side-information length — positions the Xing/Info
    block inside the first frame."""
    if version == "1":
        return 17 if mono else 32
    return 9 if mono else 17


# ----------------------------------------------------------------- build


def build_mp3_stream(
    version: str,
    layer: int,
    sr_idx: int,
    bitrate_indices: list[int],
    paddings: list[int] | None = None,
    mono: bool = False,
    crc: bool = False,
    xing: str | None = None,
    id3v2_size: int | None = None,
    id3v1: bool = False,
    seed: int = 0,
) -> bytes:
    """FIXTURE BUILDER (encoder-only contract, like
    ``encode_pdf_text``): a syntactically valid MPEG audio stream
    with deterministic filler payload bytes ``(seed*31 + f*7 + k) %
    256``. ``xing``: None | 'Xing' | 'Info' — written at the correct
    side-info offset of frame 0 (Layer III only) with truthful
    frames/bytes fields."""
    sample_rate = MP3_SAMPLERATES[version][sr_idx]
    table = MP3_BITRATES_KBPS[(_vgroup(version), layer)]
    paddings = paddings or [0] * len(bitrate_indices)
    lengths = [
        frame_length(version, layer, table[bi], sample_rate, pad)
        for bi, pad in zip(bitrate_indices, paddings)
    ]
    stream_bytes = sum(lengths)
    out = bytearray()
    if id3v2_size is not None:
        if id3v2_size >= 1 << 28:
            raise ValueError("id3v2 tag too large")
        out += b"ID3\x03\x00\x00" + bytes(
            (id3v2_size >> s) & 0x7F for s in (21, 14, 7, 0)
        )
        out += bytes((seed + k) % 0x7F for k in range(id3v2_size))
    for f, (bi, pad, ln) in enumerate(
        zip(bitrate_indices, paddings, lengths)
    ):
        h = (
            (0x7FF << 21)
            | (_VERSION_BITS[version] << 19)
            | (_LAYER_BITS[layer] << 17)
            | ((0 if crc else 1) << 16)
            | (bi << 12)
            | (sr_idx << 10)
            | (pad << 9)
            | ((0b11 if mono else 0b00) << 6)
        )
        frame = bytearray(struct.pack(">I", h))
        body = bytes((seed * 31 + f * 7 + k) % 256 for k in range(ln - 4))
        frame += body
        if f == 0 and xing is not None:
            if layer != 3:
                raise ValueError("xing header requires layer III")
            off = 4 + (2 if crc else 0) + _side_info_len(version, mono)
            block = (
                xing.encode("ascii")
                + struct.pack(">I", 0x3)  # flags: frames + bytes
                + struct.pack(">I", len(bitrate_indices))
                + struct.pack(">I", stream_bytes)
            )
            if off + len(block) > ln:
                raise ValueError("xing header does not fit frame 0")
            frame[off:off + len(block)] = block
        out += frame
    if id3v1:
        out += b"TAG" + bytes((seed + k) % 0x7F for k in range(125))
    return bytes(out)


def mp3_payload_for_doc(doc_id: int) -> bytes:
    """THE pinned per-document payload formula, shared verbatim with
    ``tools/gen_mp3_fixture.py`` (whose independent walker supplies
    the literal ground truth): version/layer/rate/VBR/tag shape all
    derive from doc_id residues so every combination class appears in
    any contiguous id range."""
    version = ("1", "2", "2.5")[doc_id % 3]
    layer = (3, 3, 1, 3, 2)[doc_id % 5]
    sr_idx = doc_id % 3
    n_frames = 4 + doc_id % 7
    vbr = doc_id % 4 == 0
    mono = doc_id % 2 == 1
    crc = doc_id % 6 == 3
    bitrate_indices = [
        1 + ((doc_id + (f * 3 if vbr else 0)) % 13)
        for f in range(n_frames)
    ]
    paddings = [1 if (doc_id + f) % 3 == 0 else 0 for f in range(n_frames)]
    xing = None
    if layer == 3:
        if vbr:
            xing = "Xing"
        elif doc_id % 8 == 1:
            xing = "Info"
    if xing is not None:
        # frame 0 must hold the VBR block past the side info — the
        # lowest MPEG-2-group rates at 24 kHz yield 24-byte frames.
        # CBR (Info) streams bump every frame so they STAY constant
        if vbr:
            bitrate_indices[0] = max(bitrate_indices[0], 8)
        else:
            bitrate_indices = [max(bi, 8) for bi in bitrate_indices]
    return build_mp3_stream(
        version, layer, sr_idx, bitrate_indices, paddings,
        mono=mono, crc=crc, xing=xing,
        id3v2_size=(20 + doc_id % 40) if doc_id % 3 == 1 else None,
        id3v1=doc_id % 5 == 2,
        seed=doc_id,
    )


# ----------------------------------------------------------------- walk


def parse_mp3_stream(payload: bytes) -> dict:
    """Strict frame-header walk -> integer stats dict. See module
    docstring for the pinned reject classes."""
    pos = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("bad id3v2 tag")
        size_bytes = payload[6:10]
        if any(b & 0x80 for b in size_bytes):
            raise ValueError("bad id3v2 tag")
        size = 0
        for b in size_bytes:
            size = (size << 7) | b
        pos = 10 + size
        if pos > len(payload):
            raise ValueError("bad id3v2 tag")
    end = len(payload)
    if end - pos >= 128 and payload[end - 128:end - 125] == b"TAG":
        end -= 128
    if pos + 4 > end or payload[pos] != 0xFF or (payload[pos + 1] & 0xE0) != 0xE0:
        raise ValueError("not an mp3 payload")

    frames_start = pos
    n_frames = 0
    version = layer = sample_rate = None
    crc0 = mono0 = None
    br_min = br_max = None
    distinct_bi: set[int] = set()
    has_xing = False
    while pos < end:
        if pos + 4 > end:
            raise ValueError("truncated mp3 frame")
        (h,) = struct.unpack(">I", payload[pos:pos + 4])
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError("mp3 frame sync lost")
        vbits = (h >> 19) & 0x3
        lbits = (h >> 17) & 0x3
        if vbits == 0b01 or lbits == 0b00:
            raise ValueError("bad mp3 frame header")
        v = _BITS_VERSION[vbits]
        lay = _BITS_LAYER[lbits]
        protection = (h >> 16) & 0x1
        bi = (h >> 12) & 0xF
        sri = (h >> 10) & 0x3
        pad = (h >> 9) & 0x1
        chan = (h >> 6) & 0x3
        emphasis = h & 0x3
        if bi == 15 or sri == 3 or emphasis == 2:
            raise ValueError("bad mp3 frame header")
        if bi == 0:
            raise ValueError("free-format mp3 unsupported")
        sr = MP3_SAMPLERATES[v][sri]
        if n_frames == 0:
            version, layer, sample_rate = v, lay, sr
            crc0, mono0 = protection == 0, chan == 0b11
        elif (v, lay, sr) != (version, layer, sample_rate):
            raise ValueError("mp3 stream parameter change")
        br = MP3_BITRATES_KBPS[(_vgroup(v), lay)][bi]
        ln = frame_length(v, lay, br, sr, pad)
        if pos + ln > end:
            raise ValueError("truncated mp3 frame")
        if n_frames == 0 and lay == 3:
            off = pos + 4 + (2 if protection == 0 else 0) + _side_info_len(
                v, chan == 0b11
            )
            magic = payload[off:off + 4]
            if magic in (b"Xing", b"Info"):
                has_xing = True
            elif payload[pos + 36:pos + 40] == b"VBRI":
                has_xing = True
        distinct_bi.add(bi)
        br_min = br if br_min is None else min(br_min, br)
        br_max = br if br_max is None else max(br_max, br)
        n_frames += 1
        pos += ln
    spf = samples_per_frame(version, layer)
    return {
        "n_frames": n_frames,
        "mpeg_version": version,
        "layer": layer,
        "sample_rate": sample_rate,
        "bitrate_min_kbps": br_min,
        "bitrate_max_kbps": br_max,
        "stream_bytes": end - frames_start,
        "duration_us": n_frames * spf * 10**6 // sample_rate,
        "is_vbr": len(distinct_bi) > 1,
        "has_xing": has_xing,
        "has_crc": bool(crc0),
        "is_mono": bool(mono0),
    }


# ------------------------------------------------------------- operators


_STATS_SCHEMA = (
    "media_id long, n_frames long, mpeg_version string, layer long, "
    "sample_rate long, bitrate_min_kbps long, bitrate_max_kbps long, "
    "stream_bytes long, duration_us long, is_vbr boolean, "
    "has_xing boolean"
)


def mp3_frame_stats(media, payload_col="payload", id_col="media_id"):
    """Per-payload MPEG frame-header stats — one narrow Arrow pass,
    no shuffle. Strict: a malformed payload raises (use
    :func:`mp3_decode_audit` for the dead-letter channel)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                st = parse_mp3_stream(bytes(payload))
                rows.append({
                    "media_id": mid,
                    "n_frames": st["n_frames"],
                    "mpeg_version": st["mpeg_version"],
                    "layer": st["layer"],
                    "sample_rate": st["sample_rate"],
                    "bitrate_min_kbps": st["bitrate_min_kbps"],
                    "bitrate_max_kbps": st["bitrate_max_kbps"],
                    "stream_bytes": st["stream_bytes"],
                    "duration_us": st["duration_us"],
                    "is_vbr": st["is_vbr"],
                    "has_xing": st["has_xing"],
                })
            yield pd.DataFrame(rows)

    return media.select(id_col, payload_col).mapInPandas(
        kernel, _STATS_SCHEMA
    )


def mp3_decode_audit(media, payload_col="payload", id_col="media_id"):
    """Admission verdict for MPEG-audio payloads — the dead-letter
    channel: ``(id, ok, n_frames, err)`` for EVERY row, err = the
    strict walker's pinned message ('' when ok)."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType, LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField(id_col, media.schema[id_col].dataType),
        StructField("ok", BooleanType()),
        StructField("n_frames", LongType()),
        StructField("err", StringType()),
    ])

    def kernel(batches):
        for pdf in batches:
            ids, oks, nfs, errs = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(mid)
                if payload is None:
                    oks.append(False)
                    nfs.append(0)
                    errs.append("null payload")
                    continue
                try:
                    st = parse_mp3_stream(bytes(payload))
                    oks.append(True)
                    nfs.append(st["n_frames"])
                    errs.append("")
                except ValueError as exc:
                    oks.append(False)
                    nfs.append(0)
                    errs.append(str(exc))
                except (IndexError, struct.error):
                    oks.append(False)
                    nfs.append(0)
                    errs.append("malformed mp3")
            yield pd.DataFrame({
                id_col: ids,
                "ok": pd.Series(oks, dtype="bool"),
                "n_frames": pd.Series(nfs, dtype="int64"),
                "err": errs,
            })

    return media.select(id_col, payload_col).mapInPandas(kernel, schema)
