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
sensitive), then a CHUNKED Merkle combine whose boundaries depend only
on the DATA — ``chunk = row_idx // 1024`` — never on partition layout,
``shuffle.partitions``, or AQE coalescing, so the same sheet
fingerprints identically under any session config. Each chunk's digest
is a full SHA-256 over its (row_idx-sorted) row hashes, and the root is
a SHA-256 over the chunk digests in chunk order — no XOR/addition
lanes anywhere, so the combine is NOT linearly malleable: compensating
row edits cannot cancel (flagged in round-3 advice; sheet content is
externally authored, so collision resistance is the integrity bar).

Cost: one narrow hashing pass + one shuffle on the uniform chunk key
(each group is ≤1024 fixed-width hashes ≈ 64 KB); driver traffic is
one 32-byte digest per 1024 rows — 10⁷ rows (Google Sheets' hard cell
cap is 10⁷) → <10⁴ digests, metadata scale.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rows import CELLS, ROW_IDX

CHUNK_ROWS = 1024  # fixed-width row_idx chunks — boundaries are data-only


def sheet_fingerprint(sheet: DataFrame) -> str:
    """Stable SHA-256 hex fingerprint of ``(row_idx, cells)`` content —
    invariant across partitionings AND session configs; sensitive to
    any cell, row order (via row_idx), raggedness, or count change;
    collision-resistant end to end (nested SHA-256, no malleable
    combiner)."""
    row_hex = F.sha2(
        F.to_json(
            F.struct(
                F.col(ROW_IDX).cast("long").alias("i"),
                F.col(CELLS).cast("array<string>").alias("c"),
            )
        ),
        256,
    )
    # chunk digest: rows sorted by row_idx WITHIN the chunk (sort_array
    # on (row_idx, hash) structs — row_idx is unique, so the order is
    # total and deterministic under any arrival order), then one sha256
    # over the concatenated row hashes.
    chunks = (
        sheet.select(
            (F.col(ROW_IDX).cast("long") / CHUNK_ROWS)
            .cast("long")
            .alias("chunk"),
            F.struct(
                F.col(ROW_IDX).cast("long").alias("i"), row_hex.alias("h")
            ).alias("ih"),
        )
        .groupBy("chunk")
        .agg(
            F.sha2(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(F.collect_list("ih")), lambda s: s["h"]
                    ),
                ),
                256,
            ).alias("d"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("chunk")
        .collect()  # metadata scale: one 32-byte digest per 1024 rows
    )
    root = hashlib.sha256()
    total = 0
    for r in chunks:
        root.update(f"{r['chunk']}:{r['n']}:{r['d']};".encode())
        total += r["n"]
    root.update(f"#{total}".encode())
    return root.hexdigest()


def rows_fingerprint_col(cells_col: str = CELLS):
    """Per-row hash column (sha2 of the canonical JSON of one row) —
    the building block used by exact dedup and incremental diffing."""
    return F.sha2(F.to_json(F.col(cells_col)), 256)
