"""Content fingerprint (A3) — change-detection hash of a whole sheet.

The reference hashes the JSON-encoded raw payload once per fetch
(``src/GoogleSheetsAgent.php:167``) and compares it against the stored
hash to skip unchanged loads (``src/DatabaseAgentMysql.php:211,232``).
Hashes never cross engines, so the exact encoding is free — what must
hold is (SURVEY.md §7.4): the fingerprint is *stable across Spark
partitionings* and sensitive to any cell, row order, or raggedness
change.

Scale design: a naive ``sha256(collect())`` materializes the sheet on
the driver. Instead this is a two-level ordered digest (Merkle-style):

1. range-sort by ``row_idx`` (so partition p holds a contiguous,
   ordered slice of rows),
2. one SHA-256 per partition over its rows' canonical JSON — computed
   where the data lives,
3. a final SHA-256 over the ordered partition digests (tiny — one
   32-byte digest per partition reaches the driver).

Any single-cell change flips its partition digest and therefore the
root. Cost: one shuffle (the range sort) + one narrow pass; driver
traffic is O(partitions), not O(rows).
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rows import CELLS, ROW_IDX


def sheet_fingerprint(sheet: DataFrame) -> str:
    """Stable SHA-256 hex fingerprint of ``(row_idx, cells)`` content."""

    def digest_partition(rows: Iterator) -> Iterator[tuple[int, str]]:
        h = hashlib.sha256()
        first_idx = None
        empty = True
        for row in rows:
            if first_idx is None:
                first_idx = row[0]
            empty = False
            h.update(
                json.dumps([row[0], row[1]], separators=(",", ":"), ensure_ascii=False).encode()
            )
        if not empty:
            yield (first_idx, h.hexdigest())

    parts = (
        sheet.select(F.col(ROW_IDX).cast("long"), F.col(CELLS).cast("array<string>"))
        .orderBy(ROW_IDX)
        .rdd.mapPartitions(digest_partition)
        .collect()
    )
    root = hashlib.sha256()
    for _, digest in sorted(parts):
        root.update(bytes.fromhex(digest))
    return root.hexdigest()


def rows_fingerprint_col(cells_col: str = CELLS):
    """Per-row hash column (sha2 of the canonical JSON of one row) —
    the building block used by exact dedup and incremental diffing."""
    return F.sha2(F.to_json(F.col(cells_col)), 256)
