"""Content fingerprint (A3) — change-detection hash of a whole sheet.

The reference hashes the JSON-encoded raw payload once per fetch
(``src/GoogleSheetsAgent.php:167``) and compares it against the stored
hash to skip unchanged loads (``src/DatabaseAgentMysql.php:211,232``).
Hashes never cross engines, so the exact encoding is free — what must
hold is (SURVEY.md §7.4): the fingerprint is *stable across Spark
partitionings* and sensitive to any cell, row order, or raggedness
change.

Scale design: a naive ``sha256(collect())`` materializes the sheet on
the driver. Instead: one SHA-256 per ROW over its canonical JSON
(``row_idx`` inside the hashed content makes the digest order-
sensitive), then a COMMUTATIVE combination — two independent 60-bit
XOR lanes plus the row count, aggregated map-side. XOR commutes, so
the root is invariant under ANY partitioning, partition COUNT, sort
layout, or AQE coalescing decision — a per-partition Merkle digest is
not (its partition boundaries move with ``shuffle.partitions``, so the
"same sheet" could fingerprint differently across sessions). Identical
rows cannot cancel: ``row_idx`` is unique per row. Cost: one narrow
pass + a partial aggregate; O(1) driver traffic, no shuffle at all.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rows import CELLS, ROW_IDX


def sheet_fingerprint(sheet: DataFrame) -> str:
    """Stable SHA-256 hex fingerprint of ``(row_idx, cells)`` content —
    invariant across partitionings AND session configs; sensitive to
    any cell, row order (via row_idx), raggedness, or count change."""
    row_hex = F.sha2(
        F.to_json(
            F.struct(
                F.col(ROW_IDX).cast("long").alias("i"),
                F.col(CELLS).cast("array<string>").alias("c"),
            )
        ),
        256,
    )
    agg = (
        sheet.select(
            F.conv(F.substring(row_hex, 1, 15), 16, 10)
            .cast("long").alias("l1"),
            F.conv(F.substring(row_hex, 17, 15), 16, 10)
            .cast("long").alias("l2"),
        )
        .agg(
            F.bit_xor("l1").alias("x1"),
            F.bit_xor("l2").alias("x2"),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    x1 = agg["x1"] if agg["x1"] is not None else 0
    x2 = agg["x2"] if agg["x2"] is not None else 0
    return hashlib.sha256(f"{x1}:{x2}:{agg['n']}".encode()).hexdigest()


def rows_fingerprint_col(cells_col: str = CELLS):
    """Per-row hash column (sha2 of the canonical JSON of one row) —
    the building block used by exact dedup and incremental diffing."""
    return F.sha2(F.to_json(F.col(cells_col)), 256)
