"""GoogleSheetSource driven end-to-end through fake Drive/Sheets
transports — the list/probe/get/backoff logic is real code exercised
here; only the googleapiclient-built transport is environment-gated.

Fakes mirror the googleapiclient call shapes exactly:
``drive.files().list(**params).execute()``,
``drive.files().get(fileId=..., ...).execute()``,
``sheets.spreadsheets().values().get(spreadsheetId=..., range=...).execute()``.
"""

from __future__ import annotations

import pytest

from google_sheets_etl_spark.sources.google_source import (
    GoogleSheetSource, RetryableHttpError,
)
from google_sheets_etl_spark.sources.sheet_source import payload_fingerprint


class _Call:
    def __init__(self, fn):
        self._fn = fn

    def execute(self):
        return self._fn()


class FakeDrive:
    """Drive v3 fake: records request params, optionally fails the
    first N calls with a retryable status."""

    def __init__(self, files_by_id=None, fail_times=0, fail_status=429):
        self.files_by_id = files_by_id or {}
        self.fail_times = fail_times
        self.fail_status = fail_status
        self.list_params = []
        self.get_params = []

    def files(self):
        return self

    def list(self, **params):
        self.list_params.append(params)

        def run():
            if self.fail_times > 0:
                self.fail_times -= 1
                raise RetryableHttpError(self.fail_status)
            return {"files": sorted(
                self.files_by_id.values(), key=lambda f: f["modifiedTime"])}

        return _Call(run)

    def get(self, **params):
        self.get_params.append(params)

        def run():
            f = self.files_by_id.get(params["fileId"])
            if f is None:
                raise RetryableHttpError(404)
            return f

        return _Call(run)


class FakeSheets:
    def __init__(self, values_by_key=None, fail_times=0):
        self.values_by_key = values_by_key or {}
        self.fail_times = fail_times
        self.get_params = []

    def spreadsheets(self):
        return self

    def values(self):
        return self

    def get(self, **params):
        self.get_params.append(params)

        def run():
            if self.fail_times > 0:
                self.fail_times -= 1
                raise RetryableHttpError(503)
            return {"values": self.values_by_key[
                (params["spreadsheetId"], params["range"])]}

        return _Call(run)


FILES = {
    "id_old": {"id": "id_old", "modifiedTime": "2026-01-01T00:00:00.000Z", "name": "Old"},
    "id_mid": {"id": "id_mid", "modifiedTime": "2026-01-02T00:00:00.000Z", "name": "Mid"},
    "id_new": {"id": "id_new", "modifiedTime": "2026-01-03T00:00:00.000Z", "name": "New"},
}


def make_source(drive=None, sheets=None):
    sleeps = []
    src = GoogleSheetSource(
        drive=drive or FakeDrive(FILES),
        sheets=sheets or FakeSheets(),
        sleep=sleeps.append,
    )
    return src, sleeps


def test_list_pushdown_params():
    drive = FakeDrive(FILES)
    src, _ = make_source(drive=drive)
    src.list_spreadsheets("2026-01-01T00:00:00.000Z", "", 50)
    (p,) = drive.list_params
    # S1 pushdown reaches the request: predicate, projection, order, limit
    assert "modifiedTime >= '2026-01-01T00:00:00.000Z'" in p["q"]
    assert "mimeType = 'application/vnd.google-apps.spreadsheet'" in p["q"]
    assert p["fields"] == "files(id,modifiedTime,name)"
    assert p["orderBy"] == "modifiedTime"
    assert p["pageSize"] == 50


def test_list_residual_tuple_filter():
    """S2: (modified, id) >= (watermark, cursor) lexicographic residual
    — equal-timestamp files below the id cursor are dropped."""
    src, _ = make_source()
    got = src.list_spreadsheets("2026-01-02T00:00:00.000Z", "id_zzz", 50)
    assert [m.id for m in got] == ["id_new"]  # id_mid ties but id < cursor
    got = src.list_spreadsheets("2026-01-02T00:00:00.000Z", "id_a", 50)
    assert [m.id for m in got] == ["id_mid", "id_new"]


def test_list_retries_then_succeeds():
    drive = FakeDrive(FILES, fail_times=2, fail_status=429)
    src, sleeps = make_source(drive=drive)
    got = src.list_spreadsheets("2026-01-01T00:00:00.000Z", "", 10)
    assert len(got) == 3
    assert len(sleeps) == 2  # two backoff sleeps before success
    assert sleeps[0] >= 1.0 and sleeps[1] >= 2.0  # 2^n + U(0,1)


def test_list_exhausts_retries():
    drive = FakeDrive(FILES, fail_times=10, fail_status=503)
    src, sleeps = make_source(drive=drive)
    with pytest.raises(RetryableHttpError):
        src.list_spreadsheets("2026-01-01T00:00:00.000Z", "", 10)
    assert len(sleeps) == 5  # MAX_RETRIES sleeps, then raise


def test_probe_found_and_revoked():
    src, _ = make_source()
    meta = src.get_spreadsheet("id_mid")
    assert (meta.id, meta.name) == ("id_mid", "Mid")
    # S3/O4: a non-retryable failure probes as None (revoked/missing)
    assert src.get_spreadsheet("id_gone") is None


def test_get_sheet_values_and_fingerprint():
    rows = [["H1", "H2"], ["a", "1"], ["b", "2"]]
    sheets = FakeSheets({("id_mid", "'Tab One'"): rows})
    src, _ = make_source(sheets=sheets)
    got, fp = src.get_sheet("id_mid", "Tab One")
    assert got == rows
    assert fp == payload_fingerprint(rows)  # S4 fingerprint parity
    # range is the quoted sheet name (GoogleSheetsAgent.php:159)
    assert sheets.get_params[0]["range"] == "'Tab One'"


def test_get_sheet_retries_transport():
    rows = [["X"], ["1"]]
    sheets = FakeSheets({("id_new", "'T'"): rows}, fail_times=1)
    src, sleeps = make_source(sheets=sheets)
    got, _ = src.get_sheet("id_new", "T")
    assert got == rows and len(sleeps) == 1


def test_real_transport_gated_without_libs():
    with pytest.raises(NotImplementedError):
        GoogleSheetSource("creds.json")


def test_list_sorts_same_timestamp_page_by_id():
    """Drive orders by modifiedTime only; the tuple cursor needs a
    total (modifiedTime, id) order or a capped page of same-timestamp
    files permanently skips ids below the recorded max (review find)."""
    t = "2026-01-01T00:00:00.000Z"
    files = {
        f"id{chr(c)}": {"id": f"id{chr(c)}", "modifiedTime": t, "name": "n"}
        for c in range(ord("a"), ord("f"))  # ida..ide, one timestamp
    }
    src = GoogleSheetSource(drive=FakeDrive(files_by_id=files),
                            sheets=FakeSheets({}), sleep=lambda s: None)
    page1 = src.list_spreadsheets("2025-12-31T00:00:00.000Z", "", count=3)
    assert [m.id for m in page1] == ["ida", "idb", "idc"]  # id-ordered
    # resume from the cursor tuple: the remaining SAME-timestamp ids
    # (all >= the cursor) arrive on the next page, none skipped
    page2 = src.list_spreadsheets(t, "idc", count=3)
    assert [m.id for m in page2] == ["idc", "idd", "ide"]


def test_backoff_retries_httperror_shaped_exceptions():
    """The real transport raises googleapiclient HttpError (status at
    exc.resp.status), not this module's RetryableHttpError — the
    backoff policy must fire for it too (review find)."""
    from google_sheets_etl_spark.sources.google_source import with_backoff

    class _Resp:
        status = 429

    class FakeHttpError(Exception):
        def __init__(self):
            self.resp = _Resp()

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise FakeHttpError()
        return "ok"

    assert with_backoff(flaky, sleep=lambda s: None) == "ok"
    assert calls["n"] == 3

    class FatalError(Exception):
        pass

    def fatal():
        raise FatalError()

    with pytest.raises(FatalError):  # non-retryable still raises fast
        with_backoff(fatal, sleep=lambda s: None)


class PagedFakeDrive(FakeDrive):
    """Serves files in fixed-size server pages with nextPageToken —
    within a timestamp the SERVER order is adversarial (by id DESC),
    as Drive makes no tie order promise."""

    def __init__(self, files, page_size):
        super().__init__({f["id"]: f for f in files})
        self._serve = sorted(
            files, key=lambda f: (f["modifiedTime"], [-ord(c) for c in f["id"]])
        )
        self._page = page_size

    def list(self, **params):
        self.list_params.append(params)
        start = int(params.get("pageToken", 0))

        def run():
            chunk = self._serve[start:start + self._page]
            out = {"files": chunk}
            if start + self._page < len(self._serve):
                out["nextPageToken"] = str(start + self._page)
            return out

        return _Call(run)


def test_list_completes_same_timestamp_tie_group_across_pages():
    """Round-4 review fix: when more files share one modifiedTime than
    the cap, the client must page until the cap-boundary tie group is
    COMPLETE — otherwise the recorded cursor id skips same-timestamp
    siblings the server never returned, forever."""
    t = "2026-05-01T00:00:00.000Z"
    files = [
        {"id": f"ss{i:03d}", "modifiedTime": t, "name": f"f{i}"}
        for i in range(10)
    ]
    drive = PagedFakeDrive(files, page_size=4)
    src = GoogleSheetSource(drive=drive, sheets=FakeSheets({}), sleep=lambda s: None)
    got = src.list_spreadsheets("2026-04-30T00:00:00.000Z", "", count=6)
    # the cap returns the 6 LOWEST ids of the tie group — a complete
    # (modifiedTime, id)-ordered prefix, so the cursor can resume at
    # ss005 and the next call picks up ss006..ss009 exactly
    assert [m.id for m in got] == [f"ss{i:03d}" for i in range(6)]
    nxt = src.list_spreadsheets(t, "ss006", count=6)
    assert [m.id for m in nxt] == ["ss006", "ss007", "ss008", "ss009"]


def test_get_sheet_escapes_quotes_in_a1_range():
    files = {"ssq": {"id": "ssq", "modifiedTime": "t", "name": "Q"}}
    sheets = FakeSheets({("ssq", "'Bob''s Data'"): [["H"], ["v"]]})
    src = GoogleSheetSource(drive=FakeDrive(files_by_id=files),
                            sheets=sheets, sleep=lambda s: None)
    rows, _ = src.get_sheet("ssq", "Bob's Data")
    assert rows == [["H"], ["v"]]
    assert sheets.get_params[-1]["range"] == "'Bob''s Data'"


def test_list_tie_group_boundary_ignores_refiltered_old_watermark_files():
    """Round-5 advisory fix: the cap boundary must be computed over
    SURVIVORS of the (modifiedTime, id) residual filter. The Drive
    query is modifiedTime >= watermark, so already-seen files AT the
    old watermark re-list and inflate the raw count — a boundary over
    raw files lands at the OLD watermark mtime and closes paging while
    the NEW tail timestamp's tie group is still open, recording a
    partial tie group whose unfetched siblings are skipped forever."""
    t0, t1 = "2026-06-01T00:00:00.000Z", "2026-06-02T00:00:00.000Z"
    old = [{"id": f"a{i:03d}", "modifiedTime": t0, "name": f"old{i}"}
           for i in range(6)]
    new = [{"id": f"b{i:03d}", "modifiedTime": t1, "name": f"new{i}"}
           for i in range(8)]
    drive = PagedFakeDrive(old + new, page_size=4)
    src = GoogleSheetSource(drive=drive, sheets=FakeSheets({}),
                            sleep=lambda s: None)
    # watermark (t0, "a999"): every t0 file is already seen — only the
    # 8-file t1 tie group survives; cap 6 must return its complete
    # (modifiedTime, id)-ordered prefix b000..b005, NOT a partial
    # tie-group tail fetched before paging stopped early
    got = src.list_spreadsheets(t0, "a999", count=6)
    assert [m.id for m in got] == [f"b{i:03d}" for i in range(6)]
    # and the resumed cursor picks up the rest exactly
    nxt = src.list_spreadsheets(t1, "b006", count=6)
    assert [m.id for m in nxt] == ["b006", "b007"]
