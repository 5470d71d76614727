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

from pyspark.sql import Column, DataFrame
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
    and min/max of BOTH dimensions. Narrow key computation + one
    aggregate shuffle on the file id.

    Normalization is pure integer arithmetic (``(v - min) * 65535 div
    span`` — products stay far under 2^63, integer div is engine-
    exact on non-negatives). The per-file (min, max) spans are what
    parquet footers would carry; small spans on both columns are the
    file-skipping property. ``file_bits`` top bits ≈
    ``repartitionByRange(2**file_bits, zkey)`` in an actual write."""
    bounds = df.agg(
        F.min(cx).alias("_minx"),
        F.max(cx).alias("_maxx"),
        F.min(cy).alias("_miny"),
        F.max(cy).alias("_maxy"),
    )
    scaled = df.crossJoin(F.broadcast(bounds))

    def norm(col: str, lo: str, hi: str) -> Column:
        # double-division floor is exact here: the quotient magnitude
        # is ≤ 65535 (ulp ~1.5e-11) while any non-zero remainder
        # fraction is ≥ 1/span — rounding can never cross an integer,
        # so the truncating cast equals integer floor-div in any engine
        span = F.greatest(F.col(hi) - F.col(lo), F.lit(1))
        return (
            ((F.col(col) - F.col(lo)) * F.lit(65535)).cast("long") / span
        ).cast("long")

    xn = norm(cx, "_minx", "_maxx")
    yn = norm(cy, "_miny", "_maxy")
    zkey = morton_key(xn, yn)
    file_id = F.shiftrightunsigned(zkey, 32 - file_bits)
    return (
        scaled.select(
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
