"""Property tests for the Z-order bit kernel: the Spark column
expression must agree with an independent Python reference, and the
interleave must be a bijection on 16-bit pairs (a collision would
merge unrelated cells; a divergence would silently misplace rows
relative to the SQL oracle)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from google_sheets_etl_spark.operators.layout import morton_key


def _spread_py(x: int) -> int:
    x &= 0xFFFF
    for s, m in [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]:
        x = (x | (x << s)) & m
    return x


def _morton_py(a: int, b: int) -> int:
    return _spread_py(a) | (_spread_py(b) << 1)


def test_morton_matches_python_reference(spark):
    rng = random.Random(42)
    pairs = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(500)]
    pairs += [(0, 0), (0xFFFF, 0xFFFF), (0xFFFF, 0), (0, 0xFFFF), (1, 0)]
    df = spark.createDataFrame(pairs, "a long, b long").select(
        "a", "b", morton_key(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r["z"] == _morton_py(r["a"], r["b"]), (r["a"], r["b"])


def test_morton_is_bijective_on_sample(spark):
    # distinct (a, b) pairs -> distinct keys; and the key decodes:
    # even bits give a, odd bits give b
    rng = random.Random(7)
    pairs = {(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(2000)}
    keys = {_morton_py(a, b) for a, b in pairs}
    assert len(keys) == len(pairs)
    for a, b in list(pairs)[:50]:
        z = _morton_py(a, b)
        da = db = 0
        for i in range(16):
            da |= ((z >> (2 * i)) & 1) << i
            db |= ((z >> (2 * i + 1)) & 1) << i
        assert (da, db) == (a, b)


def _xy2d_py(x: int, y: int, order: int = 16) -> int:
    """Independent Python reference: the textbook xy2d walk."""
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - y, s - 1 - x
            else:
                x, y = y, x
        s >>= 1
    return d


def test_hilbert_prefix_scan_matches_walk_and_reference(spark):
    """with_hilbert_key's affine parallel-prefix evaluation must be
    bit-for-bit the textbook walk: checked against BOTH the in-repo
    sequential-walk implementation (_with_hilbert_key_walk) and an
    independent Python xy2d, on an exhaustive 32x32 grid plus random
    16-bit corners. The grid is fed through an identity-normalizing
    frame (corners 0 and 65535 present) so _with_norm16 is a no-op
    and raw coordinates reach the curve."""
    from google_sheets_etl_spark.operators.layout import (
        _with_hilbert_key_walk, with_hilbert_key,
    )

    rng = random.Random(11)
    pts = [(x, y) for x in range(32) for y in range(32)]
    pts += [(rng.randrange(1 << 16), rng.randrange(1 << 16))
            for _ in range(300)]
    pts += [(0, 0), (0xFFFF, 0xFFFF), (0xFFFF, 0), (0, 0xFFFF)]
    # make the span exactly 2^16-1 so normalization is identity
    df = spark.createDataFrame(
        sorted(set(pts)), "cx long, cy long"
    ).coalesce(4)
    fast = {(r.cx, r.cy): r._hkey
            for r in with_hilbert_key(df, "cx", "cy").collect()}
    slow = {(r.cx, r.cy): r._hkey
            for r in _with_hilbert_key_walk(df, "cx", "cy").collect()}
    assert fast == slow
    for (x, y), k in fast.items():
        assert k == _xy2d_py(x, y), (x, y)

def test_exact_ntile_matches_window_ntile(spark):
    """_exact_ntile (r12: per-bucket parallel ranking, no global
    single-partition window) must reproduce ntile(n) OVER (ORDER BY k)
    exactly: same tile per row on a unique total order, across n that
    divides N, n with a remainder, and n > N; the bucket coarsening
    is deliberately lumpy (top bits → empty buckets, multi-key
    buckets, one hot bucket)."""
    from pyspark.sql import Window

    from google_sheets_etl_spark.operators.layout import _exact_ntile

    rng = random.Random(13)
    keys = rng.sample(range(1 << 20), 700) + [0, (1 << 20) - 1]
    # hot bucket: many keys sharing the same top bits
    keys += [(7 << 10) + i for i in range(200) if (7 << 10) + i not in keys]
    keys = sorted(set(keys))
    df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(8)
    for n in (7, 16, 64, len(keys), len(keys) + 50):
        got = {
            r.k: r._tile
            for r in _exact_ntile(
                df, [F.col("k")], n,
                bucket=F.shiftrightunsigned(F.col("k"), 10),
            ).collect()
        }
        want = {
            r.k: r.t
            for r in df.select(
                "k",
                F.ntile(n).over(Window.orderBy("k")).alias("t"),
            ).collect()
        }
        assert got == want, f"n={n}"


def test_exact_ntile_part_cols_matches_partitioned_ntile(spark):
    """_exact_ntile with part_cols (r12 pass 7: the fused
    curve_locality ranking) must reproduce ntile(n) OVER (PARTITION BY
    g ORDER BY k) exactly — per-partition offsets and per-partition N,
    including unequal partition sizes and a partition smaller than
    n."""
    from pyspark.sql import Window

    from google_sheets_etl_spark.operators.layout import _exact_ntile

    rng = random.Random(29)
    rows = []
    for g, size in (("a", 513), ("b", 211), ("c", 9)):
        ks = rng.sample(range(1 << 20), size)
        rows += [(g, k) for k in ks]
    df = spark.createDataFrame(rows, "g string, k long").repartition(8)
    for n in (7, 16, 64):
        got = {
            (r.g, r.k): r._tile
            for r in _exact_ntile(
                df, [F.col("k")], n,
                bucket=F.shiftrightunsigned(F.col("k"), 10),
                part_cols=["g"],
            ).collect()
        }
        want = {
            (r.g, r.k): r.t
            for r in df.select(
                "g", "k",
                F.ntile(n).over(
                    Window.partitionBy("g").orderBy("k")
                ).alias("t"),
            ).collect()
        }
        assert got == want, f"n={n}"
