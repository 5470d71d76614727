"""Sheet sources (S1-S4): the boundary the reference crosses via REST.

``SheetSource`` is the protocol; the engine orchestration only talks to
it. Two implementations:

- :class:`FixtureSheetSource` — in-memory sheets for tests and local
  runs (the primary implementation in this environment; SURVEY.md §7.1
  step 4).
- :class:`GoogleSheetSource` (``google_source.py``) — the real Drive /
  Sheets REST client with retry+backoff (O5), import-gated because the
  Google client libraries and network are absent here.

Semantics mirrored from the reference:

- ``list_spreadsheets``: ordered by ``(modifiedTime, id)``, predicate /
  projection / limit pushed down by construction (the REST query *is*
  the filter — ``src/GoogleSheetsAgent.php:91-123``). The fixture
  source applies the same ordering and watermark filter.
- ``get_sheet``: whole-sheet read returning ragged rows-of-strings plus
  a SHA-256 fingerprint of the raw (pre-trim) payload, computed at
  fetch time like ``GoogleSheetsAgent.php:167``.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from typing import Protocol


@dataclass(frozen=True)
class SpreadsheetMeta:
    id: str
    modified_time: str  # RFC 3339, fixed Z offset → lexicographic == temporal
    name: str


def payload_fingerprint(rows: list[list[str]]) -> str:
    """SHA-256 of the JSON-encoded raw payload (A3,
    ``GoogleSheetsAgent.php:167`` — hashed *before* trimming)."""
    return hashlib.sha256(
        json.dumps(rows, separators=(",", ":"), ensure_ascii=False).encode()
    ).hexdigest()


class SheetSource(Protocol):
    def list_spreadsheets(
        self, modified_since: str, cursor_id: str, count: int
    ) -> list[SpreadsheetMeta]:
        """S1+S2: files with mimeType=spreadsheet, ordered by
        ``(modifiedTime, id)``, at or past the ``(modified_since,
        cursor_id)`` tuple cursor, limited to ``count``."""
        ...

    def get_spreadsheet(self, spreadsheet_id: str) -> SpreadsheetMeta | None:
        """S3: single-file metadata probe; ``None`` = not accessible."""
        ...

    def get_sheet(self, spreadsheet_id: str, sheet_name: str) -> tuple[list[list[str]], str]:
        """S4: whole-sheet ragged rows-of-strings + content hash."""
        ...


class FixtureSheetSource:
    """In-memory source. ``sheets`` maps (spreadsheet_id, sheet_name) →
    2-D string array; ``metas`` maps spreadsheet_id → SpreadsheetMeta."""

    def __init__(
        self,
        metas: dict[str, SpreadsheetMeta] | None = None,
        sheets: dict[tuple[str, str], list[list[str]]] | None = None,
    ):
        self.metas = dict(metas or {})
        self.sheets = dict(sheets or {})

    def put_sheet(
        self, meta: SpreadsheetMeta, sheet_name: str, rows: list[list[str]]
    ) -> None:
        self.metas[meta.id] = meta
        self.sheets[(meta.id, sheet_name)] = rows

    def list_spreadsheets(
        self, modified_since: str, cursor_id: str, count: int
    ) -> list[SpreadsheetMeta]:
        eligible = [
            m
            for m in self.metas.values()
            if m.modified_time > modified_since
            or (m.modified_time == modified_since and m.id >= cursor_id)
        ]
        eligible.sort(key=lambda m: (m.modified_time, m.id))
        return eligible[:count]

    def get_spreadsheet(self, spreadsheet_id: str) -> SpreadsheetMeta | None:
        return self.metas.get(spreadsheet_id)

    def get_sheet(self, spreadsheet_id: str, sheet_name: str) -> tuple[list[list[str]], str]:
        rows = self.sheets[(spreadsheet_id, sheet_name)]
        return rows, payload_fingerprint(rows)
