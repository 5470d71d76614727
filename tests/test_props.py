"""Property-based invariants (hypothesis) for the pure-Python kernel
pieces — these run without a SparkSession and cover the input space the
example-based tests can't."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from google_sheets_etl_spark.operators.normalize import (
    normalize_column_name,
    normalized_column_names,
)
from google_sheets_etl_spark.operators.rows import (
    ColumnIndexOutOfBounds,
    RequiredColumnNotFound,
    resolve_column_selectors,
)

IDENT = re.compile(r"^[a-z_][a-z0-9_ ]*$|^col_[0-9]+$")


@given(st.lists(st.text(max_size=30), max_size=12))
@settings(max_examples=200, deadline=None)
def test_normalized_names_are_unique_valid_identifiers(cols):
    out = normalized_column_names(cols)
    assert len(out) == len(cols)
    assert len(set(out)) == len(out), "names must be unique"
    for name in out:
        assert IDENT.match(name), name


@given(st.text(max_size=50))
@settings(max_examples=200, deadline=None)
def test_normalize_is_idempotent(raw):
    once = normalize_column_name(raw)
    assert normalize_column_name(once) == once


@given(st.lists(st.text(min_size=1, max_size=10), min_size=1, max_size=8, unique=True))
@settings(max_examples=100, deadline=None)
def test_header_resolution_roundtrip(header):
    """Every header name resolves to its own position; every in-range
    position resolves to itself."""
    assert resolve_column_selectors(header, list(header)) == list(range(len(header)))
    assert resolve_column_selectors(header, list(range(len(header)))) == list(
        range(len(header))
    )


@given(st.lists(st.text(max_size=10), min_size=1, max_size=5))
@settings(max_examples=50, deadline=None)
def test_out_of_range_position_raises(header):
    try:
        resolve_column_selectors(header, [len(header)])
        raise AssertionError("expected ColumnIndexOutOfBounds")
    except ColumnIndexOutOfBounds:
        pass


@given(st.lists(st.text(max_size=10), max_size=5))
@settings(max_examples=50, deadline=None)
def test_missing_name_raises(header):
    missing = "zz-not-a-header"
    assert missing not in header
    try:
        resolve_column_selectors(header, [missing])
        raise AssertionError("expected RequiredColumnNotFound")
    except RequiredColumnNotFound:
        pass


from collections import Counter

from google_sheets_etl_spark.operators.text import misra_gries_summary


@given(
    st.lists(
        st.sampled_from([f"t{i}" for i in range(20)]),
        min_size=1, max_size=400,
    ),
    st.integers(min_value=2, max_value=10),
)
@settings(max_examples=300, deadline=None)
def test_misra_gries_superset_guarantee(tokens, k):
    """Any token with true frequency > n/k MUST survive the summary —
    the invariant the distributed heavy-hitter plan's correctness
    rests on (candidate union ⊇ true heavy hitters)."""
    summary = misra_gries_summary([" ".join(tokens)], k)
    assert len(summary) <= k
    true = Counter(tokens)
    n = len(tokens)
    for tok, freq in true.items():
        if freq * k > n:
            assert tok in summary, (tok, freq, n, k)


@given(
    st.text(alphabet="abc", min_size=1, max_size=8),
    st.integers(min_value=0, max_value=2),   # 0=sub 1=ins 2=del
    st.integers(min_value=0, max_value=8),
    st.sampled_from("abcx"),
)
@settings(max_examples=300, deadline=None)
def test_deletion_neighborhood_covers_edit_distance_one(s, kind, pos, ch):
    """The FastSS recall theorem edit_distance_near_dup relies on:
    any single edit (substitution, insertion, deletion) leaves the
    deletion neighborhoods D1(s) = {s} ∪ single-deletions
    intersecting — so the signature join has recall 1 at distance 1
    by construction, for EVERY string and edit position."""
    pos = pos % (len(s) + 1)
    if kind == 0 and pos < len(s):
        t = s[:pos] + ch + s[pos + 1:]
    elif kind == 1:
        t = s[:pos] + ch + s[pos:]
    elif kind == 2 and pos < len(s) and len(s) > 1:
        t = s[:pos] + s[pos + 1:]
    else:
        t = s

    def d1(x):
        return {x} | {x[:i] + x[i + 1:] for i in range(len(x))}

    assert d1(s) & d1(t)


@given(
    st.text(alphabet="ab", min_size=1, max_size=6),
    st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=3),
        st.integers(min_value=1, max_value=1000),
        min_size=0, max_size=8,
    ),
)
@settings(max_examples=300, deadline=None)
def test_viterbi_best_path_optimal_vs_enumeration(word, extra):
    """_viterbi_best_path returns a true segmentation (pieces
    concatenate to the word) achieving the lexicographic minimum
    (cost, n_pieces) over ALL segmentations — checked against
    brute-force enumeration; char coverage guarantees feasibility."""
    from google_sheets_etl_spark.operators.text import _viterbi_best_path

    pieces = {"a": 7, "b": 11, **extra}
    max_len = max(len(p) for p in pieces)

    def enumerate_all(w):
        if not w:
            yield (0, 0)
            return
        for ln in range(1, min(max_len, len(w)) + 1):
            c = pieces.get(w[:ln])
            if c is None:
                continue
            for cost, np_ in enumerate_all(w[ln:]):
                yield (c + cost, 1 + np_)

    best = min(enumerate_all(word))
    path = _viterbi_best_path(word, pieces, max_len)
    assert "".join(path) == word
    assert (sum(pieces[p] for p in path), len(path)) == best


@settings(max_examples=60, deadline=None)
@given(
    mcs=st.integers(min_value=2, max_value=8),
    data=st.binary(min_size=0, max_size=600),
)
def test_gif_lzw_roundtrip_any_code_size(mcs, data):
    """LZW encode∘decode is identity for every legal min-code-size
    and arbitrary index streams (values capped to the alphabet), so
    dictionary growth, width changes, the KwKwK case, and table
    resets all hold under adversarial inputs — not just fixtures."""
    from google_sheets_etl_spark.operators.multimodal import (
        _lzw_decode, _lzw_encode,
    )

    idx = bytes(b % (1 << mcs) for b in data)
    assert _lzw_decode(_lzw_encode(idx, mcs), mcs, len(idx)) == idx


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=17),
    h=st.integers(min_value=1, max_value=13),
    nf=st.integers(min_value=1, max_value=3),
    pal_bits=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_gif_container_roundtrip(w, h, nf, pal_bits, seed):
    """parse_gif_indexed ∘ encode_gif is identity over random frame
    rasters at every power-of-two palette size, single and animated
    (extension blocks on the animated path)."""
    import random

    from google_sheets_etl_spark.operators.multimodal import (
        encode_gif, parse_gif_indexed,
    )

    rng = random.Random(seed)
    n_ent = 1 << pal_bits
    pal = bytes(rng.randrange(256) for _ in range(3 * n_ent))
    frames = [
        bytes(rng.randrange(n_ent) for _ in range(w * h))
        for _ in range(nf)
    ]
    g = encode_gif(w, h, frames, pal)
    assert parse_gif_indexed(g) == (w, h, frames, pal)


@settings(max_examples=120, deadline=None)
@given(data=st.binary(min_size=0, max_size=300))
def test_media_parsers_reject_with_valueerror_only(data):
    """The per-row reject contract that keeps a 100 TB decode pass
    alive: every strict parser either returns or raises ValueError —
    never IndexError/struct.error/KeyError, which would escape the
    kernels' `except ValueError` and fail the whole task. Pure
    adversarial bytes."""
    from google_sheets_etl_spark.operators import jpeg as jpeg_mod
    from google_sheets_etl_spark.operators.multimodal import (
        parse_gif_indexed, parse_png, parse_ppm_frames, parse_wav_pcm16,
    )

    for parser in (
        parse_gif_indexed, parse_png, parse_ppm_frames,
        parse_wav_pcm16, jpeg_mod.parse_jpeg,
    ):
        try:
            parser(data)
        except ValueError:
            pass


@settings(max_examples=120, deadline=None)
@given(
    pos=st.integers(min_value=0, max_value=10**6),
    val=st.integers(min_value=0, max_value=255),
    cut=st.integers(min_value=0, max_value=10**6),
    fmt=st.sampled_from(["gif", "png", "ppm", "wav", "jpeg"]),
)
def test_media_parsers_survive_mutated_valid_payloads(pos, val, cut, fmt):
    """Same contract under the nastier distribution: take a VALID
    payload of each format, flip one byte and/or truncate, and the
    parser still either returns or raises ValueError — the mutation
    space where magic bytes match and deep parser paths run."""
    import struct

    from google_sheets_etl_spark.operators import jpeg as jpeg_mod
    from google_sheets_etl_spark.operators.multimodal import (
        encode_gif, encode_png, parse_gif_indexed, parse_png,
        parse_ppm_frames, parse_wav_pcm16,
    )

    if fmt == "gif":
        pal = bytes((i % 256) for i in range(768))
        good = encode_gif(5, 4, [bytes(range(20))], pal)
        parser = parse_gif_indexed
    elif fmt == "png":
        good = encode_png(5, 4, bytes(k % 256 for k in range(60)),
                          [y % 5 for y in range(4)])
        parser = parse_png
    elif fmt == "ppm":
        good = (b"P6\n5 4\n255\n" + bytes(range(60))) * 2  # 2 frames
        parser = parse_ppm_frames
    elif fmt == "wav":
        samples = b"".join(struct.pack("<h", (k * 91) % 1000 - 500)
                           for k in range(64))
        good = (b"RIFF" + struct.pack("<I", 36 + len(samples))
                + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
                + b"data" + struct.pack("<I", len(samples)) + samples)
        parser = parse_wav_pcm16
    else:
        good = jpeg_mod.encode_jpeg(8, 8, bytes(range(192)))
        parser = jpeg_mod.parse_jpeg

    bad = bytearray(good)
    bad[pos % len(bad)] ^= val
    payload = bytes(bad)[: 1 + cut % len(bad)]
    try:
        parser(payload)
    except ValueError:
        pass


@given(
    st.lists(st.binary(max_size=200), min_size=1, max_size=5),
    st.integers(min_value=1, max_value=9),
)
@settings(max_examples=60, deadline=None)
def test_gzip_member_walk_roundtrip(chunks, level):
    """Multi-member gzip: compressing each chunk as its own member
    and walking them back yields the exact concatenation, at any
    compression level and member count (the Common Crawl layout)."""
    import zlib

    from google_sheets_etl_spark.operators.cleaning import gunzip_members

    members = []
    for b in chunks:
        c = zlib.compressobj(level, zlib.DEFLATED, 31)
        members.append(c.compress(b) + c.flush())
    assert gunzip_members(b"".join(members)) == b"".join(chunks)


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=129 * 2, max_size=129 * 2,
    ),
)
@settings(max_examples=40, deadline=None)
def test_adpcm_decode_blocks_are_independent(samples):
    """IMA ADPCM block independence (the seek property): decoding
    block 2's bytes alone, re-wrapped as a one-block file, equals the
    tail of the full decode — for ANY input signal, including
    clipping-range extremes the quantizer saturates on."""
    from google_sheets_etl_spark.operators.multimodal import (
        encode_wav_ima_adpcm, parse_wav_ima_adpcm,
    )

    wav = encode_wav_ima_adpcm(8000, samples, 129)
    _, full = parse_wav_ima_adpcm(wav)
    block_align = 4 + 64
    di = wav.find(b"data")
    blk2 = wav[di + 8 + block_align : di + 8 + 2 * block_align]
    solo = encode_wav_ima_adpcm(8000, [0] * 129, 129)
    sdi = solo.find(b"data")
    _, dec2 = parse_wav_ima_adpcm(solo[: sdi + 8] + blk2)
    assert (dec2 == full[129:]).all()


@given(
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=8, max_value=24),
    st.integers(min_value=8, max_value=16),
    st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=25, deadline=None)
def test_mp4_container_roundtrip_matches_avi(nf, w, h, seed):
    """Container independence for ANY frame plan: the same JPEG
    frames wrapped as MP4 and as AVI decode to identical frame
    lists — the property that lets one fixture certify both walks."""
    from google_sheets_etl_spark.operators.jpeg import encode_jpeg
    from google_sheets_etl_spark.operators.multimodal import (
        encode_avi_mjpeg, encode_mp4_mjpeg, parse_avi_mjpeg,
        parse_mp4_mjpeg,
    )

    jpegs = [
        encode_jpeg(
            w, h,
            bytes((seed + f * 31 + k * 7) % 256
                  for k in range(w * h * 3)),
        )
        for f in range(nf)
    ]
    mp4 = parse_mp4_mjpeg(encode_mp4_mjpeg(w, h, jpegs))
    avi = parse_avi_mjpeg(encode_avi_mjpeg(w, h, jpegs))
    assert mp4 == avi and len(mp4) == nf
