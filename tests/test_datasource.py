"""The gsheets Python DataSource: scan shape, kernel compatibility,
and filter-pushdown partition pruning."""

from __future__ import annotations

import json

import pytest

from google_sheets_etl_spark.sources import SheetsDataSource
from google_sheets_etl_spark.sources.spark_datasource import SheetsReader
from google_sheets_etl_spark.operators import rows as K

FIXTURE = {
    "ssA": {
        "Sheet1": [["Name", "Age"], ["alice", "30"], ["bob"]],
        "Sheet2": [["x"], ["1"], ["2"], ["3"]],
    },
    "ssB": {"Main": [["h1", "h2"], ["a", "b"]]},
}


@pytest.fixture(scope="module")
def fixture_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("sheets") / "sheets.json"
    p.write_text(json.dumps(FIXTURE))
    return str(p)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SheetsDataSource)
    return spark


def test_scan_all_sheets(registered, fixture_path):
    df = registered.read.format("gsheets").option("path", fixture_path).load()
    assert df.count() == 3 + 4 + 2
    assert df.columns == ["spreadsheet_id", "sheet_name", "row_idx", "cells"]
    # ragged row preserved
    bob = df.filter("spreadsheet_id = 'ssA' and sheet_name = 'Sheet1' and row_idx = 2").first()
    assert bob["cells"] == ["bob"]


def test_partition_per_sheet(registered, fixture_path):
    reader = SheetsReader({"path": fixture_path})
    assert len(reader.partitions()) == 3


def test_filter_pushdown_prunes_partitions(registered, fixture_path):
    reader = SheetsReader({"path": fixture_path})
    from pyspark.sql.datasource import EqualTo

    leftover = list(reader.pushFilters([EqualTo(("spreadsheet_id",), "ssA"),
                                        EqualTo(("sheet_name",), "Sheet2")]))
    assert leftover == []  # both conjuncts handled by the source
    parts = reader.partitions()
    assert [(p.spreadsheet_id, p.sheet_name) for p in parts] == [("ssA", "Sheet2")]


def test_end_to_end_filtered_read(registered, fixture_path):
    df = (
        registered.read.format("gsheets")
        .option("path", fixture_path)
        .load()
        .filter("spreadsheet_id = 'ssA' and sheet_name = 'Sheet1'")
    )
    rows = df.orderBy("row_idx").collect()
    assert [r["cells"] for r in rows] == [["Name", "Age"], ["alice", "30"], ["bob"]]


def test_feeds_sheet_kernel(registered, fixture_path):
    """The scan output plugs straight into the T1-T6 transform kernel."""
    sheet = (
        registered.read.format("gsheets")
        .option("path", fixture_path)
        .load()
        .filter("spreadsheet_id = 'ssA' and sheet_name = 'Sheet1'")
        .select("row_idx", "cells")
    )
    data = K.project_rows(K.trim_cells(sheet), [0, 1], ["name", "age"], skip_rows=1)
    got = {r["name"]: r["age"] for r in data.collect()}
    assert got == {"alice": "30", "bob": None}


def test_discovery_stream_offset_is_tuple_cursor(spark, tmp_path):
    """The streaming discovery source's offset must behave exactly
    like the reference's lexicographic (modifiedTime, id) cursor
    (O6): first drain emits everything, a second drain after new
    files appear emits ONLY the strictly-newer tuples — including a
    same-timestamp larger-id file, the cursor's edge case — with the
    cursor persisted in the checkpoint across query restarts."""
    import json as _json

    from google_sheets_etl_spark.sources.spark_datasource import (
        SheetsDiscoveryDataSource,
    )

    try:
        spark.dataSource.register(SheetsDiscoveryDataSource)
    except Exception:
        pass  # already registered by an earlier test in this session

    files = str(tmp_path / "drive_files.json")
    out = str(tmp_path / "disc_out")
    ckpt = str(tmp_path / "disc_ck")
    v1 = [
        {"id": "ssB", "modifiedTime": "2024-01-01T10:00:00Z"},
        {"id": "ssA", "modifiedTime": "2024-01-02T09:00:00Z"},
    ]
    with open(files, "w") as f:
        _json.dump(v1, f)

    def drain():
        q = (
            spark.readStream.format("gsheets-discovery")
            .option("path", files)
            .load()
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", out)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r["google_spreadsheet_id"], r["google_modified"])
            for r in spark.read.parquet(out).collect()
        )

    assert drain() == [
        ("ssA", "2024-01-02T09:00:00Z"),
        ("ssB", "2024-01-01T10:00:00Z"),
    ]
    # new file at a LATER mtime + one at the SAME max mtime with a
    # larger id (the same-timestamp edge O6 exists for)
    v2 = v1 + [
        {"id": "ssC", "modifiedTime": "2024-01-03T08:00:00Z"},
        {"id": "ssZ", "modifiedTime": "2024-01-02T09:00:00Z"},
    ]
    with open(files, "w") as f:
        _json.dump(v2, f)
    got = drain()
    # ssA/ssB NOT re-emitted; ssZ (same mtime, id > cursor id) and
    # ssC both emitted exactly once
    assert got == [
        ("ssA", "2024-01-02T09:00:00Z"),
        ("ssB", "2024-01-01T10:00:00Z"),
        ("ssC", "2024-01-03T08:00:00Z"),
        ("ssZ", "2024-01-02T09:00:00Z"),
    ]
