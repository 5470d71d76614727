"""Watermark cursor reads (A1/A2) and the residual tuple filter (S2).

The reference's incremental discovery rests on a lexicographic
``(modifiedTime, id)`` tuple cursor over RFC-3339 strings
(``src/DatabaseAgentMysql.php:24-49``, ``src/GoogleSheetsAgent.php:78-82,
114-119``). RFC-3339 with a fixed ``Z`` offset sorts identically
lexically and temporally (SURVEY.md §1.2), so the cursor is a plain
string-tuple max/min — expressed here with ``max_by``/``min_by`` over a
struct, which Spark computes as a partial (map-side) aggregate: no sort,
no full shuffle, O(1) result rows regardless of table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The reference seeds an unseen warehouse at 2001-01-01 (Tasks.php:36-41).
EPOCH_WATERMARK = ("2001-01-01T00:00:00Z", "")


def greatest_modified(spreadsheets: DataFrame) -> tuple[str, str]:
    """A1: greatest ``(google_modified, google_spreadsheet_id)`` tuple
    ever recorded (``DatabaseAgentMysql.php:24-35``), or the epoch seed.

    Equivalent plan to ``ORDER BY m DESC, id DESC LIMIT 1`` but cheaper:
    ``max(struct(...))`` aggregates partially on each partition.
    """
    row = spreadsheets.select(
        F.max(F.struct("google_modified", "google_spreadsheet_id")).alias("wm")
    ).first()
    if row is None or row["wm"] is None:
        return EPOCH_WATERMARK
    return (row["wm"]["google_modified"], row["wm"]["google_spreadsheet_id"])


def longest_unseen(spreadsheets: DataFrame) -> str | None:
    """A2: the spreadsheet id not confirmed for the longest time —
    ``ORDER BY last_seen LIMIT 1`` (``DatabaseAgentMysql.php:38-49``)
    as a ``min_by`` partial aggregate."""
    row = spreadsheets.select(
        F.min_by("google_spreadsheet_id", "last_seen").alias("oldest")
    ).first()
    return None if row is None else row["oldest"]


def after_cursor(files: DataFrame, watermark: str, cursor_id: str) -> DataFrame:
    """S2: residual tuple filter — keep files strictly past the cursor,
    with the id tie-break the Drive query language cannot express
    (``GoogleSheetsAgent.php:114-119``):
    ``modifiedTime > wm OR (modifiedTime == wm AND id >= cursor_id)``."""
    m, i = F.col("modifiedTime"), F.col("id")
    return files.filter((m > watermark) | ((m == watermark) & (i >= cursor_id)))
