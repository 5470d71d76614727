"""Multi-dimensional table layout: Z-order (Morton) keys for
file-skipping data organization (north-star extension; no reference
counterpart — the reference loads sheets, this is how a 100 TB table
gets PHYSICALLY arranged so point/range queries on two keys both
prune).

A table range-partitioned and sorted by ``morton_key(a, b)`` packs
rows into files whose (a, b) bounding boxes are small squares instead
of full-width stripes: parquet min/max footer stats on BOTH columns
become selective, so a filter on either key (or both) skips most
files — the property linear sort on ``a`` gives only to ``a``.

Everything is closed-form 64-bit bit-twiddling (the classic
magic-number spread), identical semantics in Spark and ANSI SQL —
no loops, no UDFs, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# bit-spread magic masks: after the k-th step, the low 16 input bits
# occupy every other position of a 32-bit lane
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread16(x: Column) -> Column:
    """Interleave-ready spread of the low 16 bits of ``x``: bit i of
    the input lands at bit 2i of the output."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_key(cx: Column, cy: Column) -> Column:
    """64-bit Morton (Z-order) key of two non-negative integer
    columns' low 16 bits: bits of ``cx`` at even positions, ``cy`` at
    odd. Monotone in the interleaved order — sorting by it walks the
    Z-curve."""
    return _spread16(cx).bitwiseOR(F.shiftleft(_spread16(cy), 1))


def with_morton_key(
    df: DataFrame, cx: str, cy: str, key_col: str = "_zkey"
) -> DataFrame:
    """``df`` plus the range-normalized Morton key of (cx, cy) as
    ``key_col`` — the shared kernel of :func:`zorder_file_stats`
    (layout audit) and :func:`zorder_write` (actual write path).

    Normalization is SHIFT-ONLY integer arithmetic — no
    multiplication or division anywhere, so it is engine-exact for
    ANY key span up to 2^62 (a multiply-then-divide scheme silently
    diverges from integer floor-div past span ≈ 2^47, where the
    product leaves double precision): offset = v - min; bit width
    L = length(bin(span)); wide dims shift DOWN to 16 bits, narrow
    dims shift UP to fill them — both directions lossless for
    ordering and cell structure. The bounds row is an O(1) aggregate
    broadcast back; the key computation itself is narrow."""
    keyed = _with_norm16(df, cx, cy)
    return keyed.withColumn(
        key_col, morton_key(F.col("_xn"), F.col("_yn"))
    ).drop("_xn", "_yn")


def _with_norm16(df: DataFrame, cx: str, cy: str) -> DataFrame:
    """Shared range normalization of :func:`with_morton_key` and
    :func:`with_hilbert_key`: ``df`` plus ``_xn``/``_yn`` — both
    columns shift-mapped into the 16-bit key space (see the exactness
    notes above; the bounds row is an O(1) aggregate broadcast
    back)."""
    bounds = df.agg(
        F.min(cx).alias("_minx"),
        F.max(cx).alias("_maxx"),
        F.min(cy).alias("_miny"),
        F.max(cy).alias("_maxy"),
    )
    scaled = df.crossJoin(F.broadcast(bounds))

    def norm(col: str, lo: str, hi: str) -> Column:
        # bit width of the span via length(bin(span)) — exact integer
        # log2+1 in any engine, no floats anywhere
        span = F.greatest(F.col(hi) - F.col(lo), F.lit(1))
        width = F.length(F.bin(span)).cast("int")
        down = F.greatest(width - F.lit(16), F.lit(0))
        up = F.greatest(F.lit(16) - width, F.lit(0))
        dx = (F.col(col) - F.col(lo)).cast("long")
        # pyspark shift wrappers take literal ints only; the SQL
        # builtins take columns (same trick as operators/bloom.py)
        return F.call_function(
            "shiftleft", F.call_function("shiftright", dx, down), up
        )

    return scaled.withColumn(
        "_xn", norm(cx, "_minx", "_maxx")
    ).withColumn("_yn", norm(cy, "_miny", "_maxy")).drop(
        "_minx", "_maxx", "_miny", "_maxy"
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cx: str,
    cy: str,
    file_bits: int = 4,
) -> None:
    """The REAL z-order write: rows land in ``2**file_bits``
    z-curve TILES (top Morton-key bits) written as hive partition
    directories, sorted by the full key within each tile. Every
    tile's parquet footers then carry GUARANTEED-tight min/max on
    BOTH ``cx`` and ``cy`` (each tile fixes the top bits of both
    normalized dims), and the tile id itself partition-prunes — the
    layout that makes point/range filters on either key skip most
    files at 100 TB.

    Deliberately top-bit tiles rather than ``repartitionByRange`` on
    the raw key: count-balanced quantile ranges straddle z-curve
    major boundaries, and a straddling file spans nearly the full
    range of one dimension — the per-file bound becomes statistical
    instead of guaranteed (measured: a 16-quantile write of a skewed
    corpus put 126/200 of the narrow dim's span in one file). The
    trade is tile sizes following data density; compaction
    (plans/compaction.py) handles uneven tiles the same way it
    handles any fragmented partition."""
    keyed = with_morton_key(df, cx, cy, key_col="_zkey")
    tile = F.shiftrightunsigned(F.col("_zkey"), 32 - file_bits).cast("long")
    (
        keyed.withColumn("_tile", tile)
        .repartition(F.col("_tile"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .partitionBy("_tile")
        .parquet(path)
    )


def zorder_file_stats(
    df: DataFrame,
    cx: str,
    cy: str,
    file_bits: int = 6,
) -> DataFrame:
    """Simulate the layout a Z-order write would produce and measure
    its skipping power: range-NORMALIZE both columns into the 16-bit
    key space (an O(1) min/max row broadcast back — raw keys of any
    cardinality would otherwise wrap modulo 2^16 and destroy
    locality), interleave, assign each row to one of ``2**file_bits``
    files by the TOP bits of its Morton key (range partitioning on
    the z-curve), then emit per-file footer-style stats — row count
    and min/max of BOTH dimensions. Narrow key computation (shared
    :func:`with_morton_key` kernel — see its exactness notes) + one
    aggregate shuffle on the file id. The per-file (min, max) spans
    are what parquet footers would carry; small spans on both columns
    are the file-skipping property; :func:`zorder_write` is the
    actual write-path counterpart."""
    keyed = with_morton_key(df, cx, cy, key_col="_zkey")
    file_id = F.shiftrightunsigned(F.col("_zkey"), 32 - file_bits)
    return (
        keyed.select(
            F.col(cx), F.col(cy), file_id.cast("long").alias("file_id")
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(cx).alias(f"min_{cx}"),
            F.max(cx).alias(f"max_{cx}"),
            F.min(cy).alias(f"min_{cy}"),
            F.max(cy).alias(f"max_{cy}"),
        )
    )


def with_hilbert_key(
    df: DataFrame, cx: str, cy: str, key_col: str = "_hkey"
) -> DataFrame:
    """``df`` plus the range-normalized HILBERT curve index of
    (cx, cy) as ``key_col`` — the locality upgrade of
    :func:`with_morton_key` (and the curve Iceberg/Delta reach for
    past Z-order): the Hilbert curve visits every cell of the 2^16 ×
    2^16 grid through ADJACENT cells only, so consecutive key ranges
    tile into more compact bounding boxes than the Z-curve's
    quadrant jumps — measurably smaller per-file (min, max) spans at
    the same file count (the ``curve_locality_compare`` row).

    Same shift-only range normalization as the Morton kernel, then
    the AFFINE PARALLEL-PREFIX evaluation of the classic xy2d walk —
    derived here, certified against the sequential walk (kept as
    :func:`_with_hilbert_key_walk`) by an exhaustive-grid test and
    against the oracle's recursive-CTE walk by the driver rows:

    The walk's frame state is (swap w, complement c) ∈ GF(2)² —
    processing quadrant bits (x_i, y_i) MSB-first, the effective
    quadrant is rx = c ⊕ x_i ⊕ (w ∧ t), ry = c ⊕ y_i ⊕ (w ∧ t) with
    t = x_i ⊕ y_i, and the state transition is AFFINE over GF(2)²:
    t=1 → (w,c) ← (c⊕g, w⊕g), t=0 → (w,c) ← (w⊕c⊕g, c), g = ¬y_i.
    Affine maps compose associatively, so the 16 per-bit states are
    an exclusive suffix-scan of 2×2 GF(2) matrices + offsets —
    computed for ALL bit positions at once in packed 16-bit lanes
    (six int64 fields) by 4 Hillis-Steele doubling rounds of pure
    AND/XOR/shift, identity-filled past the MSB. The digit then
    splits into bit planes: index bit 2i+1 = rx_i, bit 2i = t_i —
    one Morton-style interleave of two 16-bit fields.

    Cost: ~7 narrow projections of int64 bit ops (vs 33 for the
    sequential walk — measured 6-7× faster at sf0.1), no Python, no
    shuffle, no branches; at 100 TB the key is pure map-side
    codegen work like the Morton kernel."""
    return _hilbert_from_norm(
        _with_norm16(df, cx, cy), key_col
    ).drop("_xn", "_yn")


def _hilbert_from_norm(
    keyed: DataFrame, key_col: str
) -> DataFrame:
    """:func:`with_hilbert_key`'s body over an ALREADY-normalized
    frame (``_xn``/``_yn`` present, kept on the output) — split out
    so :func:`curve_locality_stats` can derive BOTH curves' keys
    from one normalization pass instead of re-running the bounds
    aggregate and shift mapping per curve (r12 optimization round,
    guide §2.4)."""
    M = F.lit(0xFFFF)

    def bxor(a: Column, b: Column) -> Column:
        return a.bitwiseXOR(b)

    def band(a: Column, b: Column) -> Column:
        return a.bitwiseAND(b)

    # per-lane initial affine maps from the packed quadrant bits
    t = band(bxor(F.col("_xn"), F.col("_yn")), M)
    g = bxor(F.col("_yn"), M)  # ¬y_i per lane (inputs are 16-bit)
    out = keyed.withColumns({
        "_t": t,
        "_m00": bxor(t, M),
        "_m01": M,
        "_m10": t,
        "_m11": bxor(t, M),
        "_k0": g,
        "_k1": band(g, t),
    })
    # exclusive suffix-scan of the affine maps: 4 doubling rounds;
    # lane i composes (own ∘ lanes-above); identity fills past MSB
    for r in (1, 2, 4, 8):
        hi_fill = F.lit(((1 << r) - 1) << (16 - r))
        s00 = F.shiftright(F.col("_m00"), r).bitwiseOR(hi_fill)
        s01 = F.shiftright(F.col("_m01"), r)
        s10 = F.shiftright(F.col("_m10"), r)
        s11 = F.shiftright(F.col("_m11"), r).bitwiseOR(hi_fill)
        sk0 = F.shiftright(F.col("_k0"), r)
        sk1 = F.shiftright(F.col("_k1"), r)
        out = out.withColumns({
            "_m00": bxor(band(F.col("_m00"), s00),
                         band(F.col("_m01"), s10)),
            "_m01": bxor(band(F.col("_m00"), s01),
                         band(F.col("_m01"), s11)),
            "_m10": bxor(band(F.col("_m10"), s00),
                         band(F.col("_m11"), s10)),
            "_m11": bxor(band(F.col("_m10"), s01),
                         band(F.col("_m11"), s11)),
            "_k0": bxor(bxor(band(F.col("_m00"), sk0),
                             band(F.col("_m01"), sk1)), F.col("_k0")),
            "_k1": bxor(bxor(band(F.col("_m10"), sk0),
                             band(F.col("_m11"), sk1)), F.col("_k1")),
        })
    # state before bit i = composed offset of lanes i+1..15 (the
    # initial state is (0,0), so the linear part vanishes)
    w = F.shiftright(F.col("_k0"), 1)
    c = F.shiftright(F.col("_k1"), 1)
    rx = band(
        bxor(bxor(c, F.col("_xn")), band(w, F.col("_t"))), M
    )
    return out.withColumn(
        key_col,
        F.shiftleft(_spread16(rx), 1).bitwiseOR(_spread16(F.col("_t"))),
    ).drop("_t", "_m00", "_m01", "_m10", "_m11", "_k0", "_k1")


def _with_hilbert_key_walk(
    df: DataFrame, cx: str, cy: str, key_col: str = "_hkey"
) -> DataFrame:
    """The sequential xy2d walk (16 conditional reflect-and-swap
    steps, one narrow projection pair per scale) — the TEXTBOOK
    formulation :func:`with_hilbert_key`'s parallel-prefix evaluation
    is certified against (tests assert bit-for-bit equality on
    exhaustive grids; the driver oracle independently replays this
    walk as a recursive CTE). Kept as the readable reference
    implementation, not the production path."""
    keyed = _with_norm16(df, cx, cy)
    out = (
        keyed.withColumn("_hx", F.col("_xn"))
        .withColumn("_hy", F.col("_yn"))
        .withColumn("_hd", F.lit(0).cast("long"))
        .drop("_xn", "_yn")
    )
    for i in range(15, -1, -1):
        s = 1 << i
        out = out.withColumns({
            "_rx": F.when(
                F.col("_hx").bitwiseAND(F.lit(s)) != 0, F.lit(1)
            ).otherwise(F.lit(0)).cast("long"),
            "_ry": F.when(
                F.col("_hy").bitwiseAND(F.lit(s)) != 0, F.lit(1)
            ).otherwise(F.lit(0)).cast("long"),
        })
        out = out.withColumns({
            "_hd": F.col("_hd")
            + F.lit(s * s).cast("long")
            * (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry")),
            "_hx": F.when(
                F.col("_ry") == 0,
                F.when(
                    F.col("_rx") == 1, F.lit(s - 1) - F.col("_hy")
                ).otherwise(F.col("_hy")),
            ).otherwise(F.col("_hx")),
            "_hy": F.when(
                F.col("_ry") == 0,
                F.when(
                    F.col("_rx") == 1, F.lit(s - 1) - F.col("_hx")
                ).otherwise(F.col("_hx")),
            ).otherwise(F.col("_hy")),
        })
    return out.withColumn(key_col, F.col("_hd")).drop(
        "_hx", "_hy", "_hd", "_rx", "_ry"
    )


def hilbert_file_stats(
    df: DataFrame,
    cx: str,
    cy: str,
    file_bits: int = 6,
) -> DataFrame:
    """:func:`zorder_file_stats` on the Hilbert key: simulate the
    layout, emit per-file footer-style stats (row count + min/max of
    BOTH dimensions). Same narrow-key + one-aggregate shape."""
    keyed = with_hilbert_key(df, cx, cy, key_col="_hkey")
    file_id = F.shiftrightunsigned(F.col("_hkey"), 32 - file_bits)
    return (
        keyed.select(
            F.col(cx), F.col(cy), file_id.cast("long").alias("file_id")
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(cx).alias(f"min_{cx}"),
            F.max(cx).alias(f"max_{cx}"),
            F.min(cy).alias(f"min_{cy}"),
            F.max(cy).alias(f"max_{cy}"),
        )
    )


def _exact_ntile(
    df: DataFrame,
    order_by: list,
    n: int,
    bucket: Column,
    out_col: str = "_tile",
    part_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT ``ntile(n) OVER (PARTITION BY part_cols ORDER BY
    order_by)`` without the single-partition global window sort (r12
    optimization round — a global window funnels every row through
    ONE task, the guide §2.5 straggler shape and a non-starter at
    100 TB).

    ``bucket`` must be a DETERMINISTIC, order-consistent coarsening
    of the leading sort key (b(r1) <= b(r2) whenever r1 sorts before
    r2 within one partition; equal keys share a bucket) — e.g. the
    top bits of an integer key. Rows are ranked within each
    (partition, bucket) group in parallel (``row_number`` over a
    hash-partitioned window), group offsets come from a
    group-count-sized cumulative sum broadcast back, and the tile is
    the closed-form ntile assignment from the per-partition 0-based
    index: with q = N div n, r = N mod n, the first r tiles hold q+1
    rows — all integral ``div`` arithmetic, engine-exact (ties
    beyond ``order_by`` are interchangeable rows, same contract as
    the window form).

    ``part_cols`` (default none = one global partition) lets several
    independent ntiles share ONE ranking exchange — e.g.
    :func:`curve_locality_stats` ranks both curves in one exploded
    pass (same bytes, half the stage barriers) instead of one
    exchange per curve."""
    part_cols = list(part_cols or [])
    b = df.withColumn("_bkt", bucket)
    wcum = Window.partitionBy(*part_cols).orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # group-count rows: the two tiny windows below run over at most
    # one row per distinct (partition, bucket) value, never the data
    offs = (
        b.groupBy(*part_cols, "_bkt")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select(
            *part_cols,
            "_bkt",
            F.coalesce(F.sum("_c").over(wcum), F.lit(0)).alias("_off"),
            F.sum("_c").over(
                Window.partitionBy(*part_cols).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("_N"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy(*part_cols, "_bkt").orderBy(*order_by)
    )
    return (
        b.join(F.broadcast(offs), part_cols + ["_bkt"])
        .withColumn("_idx", F.col("_off") + rn - 1)
        .withColumn("_q", F.expr(f"_N div {n}"))
        .withColumn("_r", F.col("_N") % n)
        .withColumn("_cut", F.col("_r") * (F.col("_q") + 1))
        .withColumn(
            out_col,
            (
                F.when(
                    F.col("_idx") < F.col("_cut"),
                    F.expr("_idx div (_q + 1)"),
                ).otherwise(
                    F.col("_r")
                    + F.expr("(_idx - _cut) div greatest(_q, 1L)")
                )
                + 1
            ).cast("int"),
        )
        .drop("_bkt", "_off", "_N", "_idx", "_q", "_r", "_cut")
    )


def curve_locality_stats(
    df: DataFrame,
    cx: str,
    cy: str,
    file_bits: int = 6,
) -> DataFrame:
    """The honest Morton-vs-Hilbert measurement: both curves' layouts
    over the SAME rows at the SAME file count, reduced to the numbers
    a file-skipping planner feels — per curve, the EXACT integer sums
    of per-file spans and bounding-box areas ((span+1) products).
    Smaller sums = tighter footer stats = more files skipped per
    point/range filter.

    Files here are COUNT-BALANCED key ranges (ntile over the curve
    order — what ``repartitionByRange`` on the key produces), not the
    top-bit tiles of :func:`zorder_file_stats`: at any power-of-4
    file count the two curves' top-bit tiles are the SAME square
    blocks (only numbered differently), so the curves can only
    differ where a real writer actually cuts — at arbitrary
    count-balanced boundaries, where a Morton range straddles
    quadrant jumps and a Hilbert range stays adjacent. The ntile is
    a bounded measurement sort (ties broken by (key, cx, cy);
    identical rows are interchangeable between adjacent tiles, so
    the aggregate is order-deterministic); r12: the ntile runs as
    :func:`_exact_ntile` (per-bucket parallel ranking off the keys'
    top bits), not a single-partition global window, and BOTH
    curves' keys derive from ONE normalization pass."""
    n_files = 2 ** file_bits
    # cut the narrow key table ONCE (4 ints/row): each curve branch
    # consumes it twice (ranking + bucket counts), and the Hilbert
    # parallel-prefix chain is a large expression tree — un-cut, the
    # four consumers re-plan and re-run bounds + both key kernels
    # (guide §3.3: materialize to truncate a plan that outgrows its
    # usefulness; the cut is keys only, never payload)
    both = _hilbert_from_norm(
        _with_norm16(df.select(cx, cy), cx, cy).withColumn(
            "_zk", morton_key(F.col("_xn"), F.col("_yn"))
        ),
        "_hk",
    ).select(cx, cy, "_zk", "_hk").localCheckpoint(eager=True)

    # ONE ranking pass for BOTH curves (r12 pass 7): explode each key
    # row into (curve, key) — same bytes as the two per-curve
    # exchanges it replaces, half the stage barriers — and rank with
    # the curve label leading every partition key (_exact_ntile's
    # part_cols), so the two curves' ntiles stay independent inside
    # the shared exchange.
    exploded = both.select(
        cx, cy,
        F.explode(F.array(
            F.struct(
                F.lit("morton").alias("curve"), F.col("_zk").alias("_key")
            ),
            F.struct(
                F.lit("hilbert").alias("curve"), F.col("_hk").alias("_key")
            ),
        )).alias("_e"),
    ).select(cx, cy, F.col("_e.curve").alias("curve"),
             F.col("_e._key").alias("_key"))
    # both curve keys are 32-bit; top 10 bits give <= 1024
    # order-consistent buckets per curve for the parallel ranking
    tiles = (
        _exact_ntile(
            exploded,
            [F.col("_key"), F.col(cx), F.col(cy)],
            n_files,
            bucket=F.shiftrightunsigned(F.col("_key"), 22),
            part_cols=["curve"],
        )
        .groupBy("curve", "_tile")
        .agg(
            F.min(cx).alias("_mnx"),
            F.max(cx).alias("_mxx"),
            F.min(cy).alias("_mny"),
            F.max(cy).alias("_mxy"),
        )
    )
    sx = F.col("_mxx") - F.col("_mnx")
    sy = F.col("_mxy") - F.col("_mny")
    return tiles.groupBy("curve").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(sx).cast("long").alias("sum_span_x"),
        F.sum(sy).cast("long").alias("sum_span_y"),
        F.sum((sx + 1) * (sy + 1)).cast("long").alias("sum_area"),
    )
