"""Google Drive/Sheets REST source (S1-S4) with retry+backoff (O5).

The source logic — pushdown construction (query/fields/orderBy/
pageSize, ``src/GoogleSheetsAgent.php:91-123``), residual tuple filter,
probe semantics, payload fingerprint, and the backoff policy
(``GoogleSheetsAgent.php:30-64``: ≤5 retries on 429/5xx/transport,
delay ``2^n s + jitter``) — is complete, transport-agnostic code,
driven end-to-end by fake transports in ``tests/test_google_source.py``.
Only the real-transport CONSTRUCTOR path is import-gated on
``googleapiclient`` (absent here, no network).
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable

from .sheet_source import SpreadsheetMeta, payload_fingerprint

MIME_SPREADSHEET = "application/vnd.google-apps.spreadsheet"
RETRYABLE_STATUS = {429, 500, 502, 503, 504}
MAX_RETRIES = 5


def drive_list_params(modified_since: str, count: int) -> dict:
    """The pushed-down Drive ``files.list`` request (S1): predicate
    (mimeType + modifiedTime >= watermark), projection (id, modifiedTime,
    name), ordering, and limit — pushdown by construction (SURVEY.md §4)."""
    return {
        "q": f"mimeType = '{MIME_SPREADSHEET}' and modifiedTime >= '{modified_since}'",
        "fields": "files(id,modifiedTime,name)",
        "orderBy": "modifiedTime",
        "pageSize": min(count, 1000),
        "supportsAllDrives": True,
        "includeItemsFromAllDrives": True,
        "corpora": "allDrives",
    }


def backoff_delays(attempts: int = MAX_RETRIES, rng: random.Random | None = None) -> list[float]:
    """Exponential backoff schedule in seconds: ``2^n + U(0,1)``
    (reference: ``1000*2^n + rand(0,1000)`` ms)."""
    rng = rng or random.Random()
    return [(2**n) + rng.random() for n in range(attempts)]


class RetryableHttpError(Exception):
    def __init__(self, status: int):
        self.status = status
        super().__init__(f"HTTP {status}")


def _retryable_status(exc: Exception) -> int | None:
    """Retryable HTTP status carried by ``exc``, else None. Covers this
    module's :class:`RetryableHttpError` AND the real transport's
    ``googleapiclient.errors.HttpError`` (status lives at
    ``exc.resp.status``) — duck-typed so the policy works identically
    against fakes and the live client without importing the lib."""
    status = getattr(exc, "status", None)
    if status is None:
        status = getattr(getattr(exc, "resp", None), "status", None)
    try:
        status = int(status) if status is not None else None
    except (TypeError, ValueError):
        return None
    return status if status in RETRYABLE_STATUS else None


def with_backoff(call: Callable, *, sleep=time.sleep, rng: random.Random | None = None):
    """Run ``call`` with the reference's retry policy (O5)."""
    delays = backoff_delays(rng=rng)
    for attempt in range(MAX_RETRIES + 1):
        try:
            return call()
        except ConnectionError:
            if attempt == MAX_RETRIES:
                raise
            sleep(delays[attempt])
        except Exception as e:
            if _retryable_status(e) is None or attempt == MAX_RETRIES:
                raise
            sleep(delays[attempt])


class GoogleSheetSource:
    """REST source (S1/S3/S4 + S6 credential scan, O5 retry).

    The class body is complete, transport-agnostic code: every method
    goes through ``with_backoff`` against two service objects with the
    Drive v3 / Sheets v4 call shapes (``files().list(**p).execute()``,
    ``spreadsheets().values().get(...).execute()``). Only CONSTRUCTING
    the real transport needs ``googleapiclient`` + credentials + the
    network; tests inject fakes via the ``drive``/``sheets`` kwargs and
    drive the full list/probe/get/backoff logic
    (``tests/test_google_source.py``).
    """

    def __init__(self, credentials_file: str | None = None, *,
                 drive=None, sheets=None, sleep=time.sleep):
        self._sleep = sleep
        if drive is not None and sheets is not None:
            self._drive = drive
            self._sheets = sheets
            return
        try:
            from googleapiclient.discovery import build  # noqa: F401
            from google.oauth2 import service_account  # noqa: F401
        except ImportError as e:  # pragma: no cover - env has no google libs
            raise NotImplementedError(
                "googleapiclient not installed in this environment; "
                "use FixtureSheetSource, or inject drive=/sheets= fakes, "
                "or install google-api-python-client"
            ) from e
        # S6 credential scan (GoogleSheetsAgent.php:66-78)
        creds = service_account.Credentials.from_service_account_file(
            credentials_file,
            scopes=["https://www.googleapis.com/auth/drive.readonly",
                    "https://www.googleapis.com/auth/spreadsheets.readonly"],
        )
        self._drive = build("drive", "v3", credentials=creds)
        self._sheets = build("sheets", "v4", credentials=creds)

    def list_spreadsheets(self, modified_since: str, cursor_id: str, count: int):
        params = drive_list_params(modified_since, count)

        def survives(f: dict) -> bool:
            # Same (modifiedTime, id) residual tuple predicate applied
            # to the final result below; used here so the cap boundary
            # is computed over files the cursor will actually KEEP.
            return (
                f["modifiedTime"] > modified_since
                or (f["modifiedTime"] == modified_since
                    and f["id"] >= cursor_id)
            )

        files: list[dict] = []
        token: str | None = None
        while True:
            page_params = dict(params)
            if token:
                page_params["pageToken"] = token
            resp = with_backoff(
                lambda p=page_params: self._drive.files().list(**p).execute(),
                sleep=self._sleep,
            )
            files += resp.get("files", [])
            token = resp.get("nextPageToken")
            if not token:
                break
            # Page until the CAP-BOUNDARY modifiedTime's tie group is
            # complete: Drive orders by modifiedTime only and chooses
            # arbitrarily WITHIN a timestamp, so stopping mid-group
            # would let the cursor record an id whose same-timestamp
            # siblings were never returned — they'd be below both the
            # watermark and the id cursor on every later run, i.e.
            # skipped forever. The boundary must be the count-th mtime
            # among SURVIVORS of the residual tuple filter: the Drive
            # query is modifiedTime >= watermark, so re-listed
            # already-seen files AT the old watermark inflate the raw
            # list and would pin the boundary to the OLD watermark
            # mtime, closing paging while the NEW tail tie group is
            # still open. Pages arrive ascending, so once the raw tail
            # strictly passes the survivor boundary the group is
            # closed.
            survivor_mtimes = sorted(
                f["modifiedTime"] for f in files if survives(f)
            )
            if len(survivor_mtimes) >= count:
                boundary = survivor_mtimes[count - 1]
                if files[-1]["modifiedTime"] > boundary:
                    break
        metas = [
            SpreadsheetMeta(f["id"], f["modifiedTime"], f["name"])
            for f in files
        ]
        # Drive orders by modifiedTime ONLY; the tuple cursor needs a
        # total (modifiedTime, id) order or a capped page of
        # same-timestamp files skips every id below the recorded max
        # on the next run. Sort client-side BEFORE filter + cap.
        metas.sort(key=lambda m: (m.modified_time, m.id))
        # S2 residual tuple filter (GoogleSheetsAgent.php:114-119) —
        # same predicate as ``survives`` above, over sorted metas.
        return [
            m for m in metas
            if m.modified_time > modified_since
            or (m.modified_time == modified_since and m.id >= cursor_id)
        ][:count]

    def get_spreadsheet(self, spreadsheet_id: str):
        try:
            f = with_backoff(
                lambda: self._drive.files()
                .get(fileId=spreadsheet_id, fields="id,modifiedTime,name",
                     supportsAllDrives=True)
                .execute(),
                sleep=self._sleep,
            )
        except Exception:
            return None
        return SpreadsheetMeta(f["id"], f["modifiedTime"], f["name"])

    def get_sheet(self, spreadsheet_id: str, sheet_name: str):
        resp = with_backoff(
            lambda: self._sheets.spreadsheets()
            .values()
            # A1 notation doubles embedded single quotes ("Bob's Data"
            # → 'Bob''s Data'); unescaped, the API 400s (non-retryable)
            .get(
                spreadsheetId=spreadsheet_id,
                range="'" + sheet_name.replace("'", "''") + "'",
            )
            .execute(),
            sleep=self._sleep,
        )
        rows = resp.get("values", [])
        return rows, payload_fingerprint(rows)
