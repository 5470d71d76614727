"""CLI entry point — the Spark-native counterpart of the reference's
``bin/google-sheets-etl`` (reference: ``bin/google-sheets-etl:15-18``
usage ``GOOGLE_KEY_JSON ETL_SCHEMA_JSON DATABASE_DSN [USER [PASS]]``).

    python -m google_sheets_etl_spark \
        --config etl.json --warehouse /data/warehouse \
        [--sheets fixture.json | --credentials key.json] \
        [--discovery-cap 200] [--verify-oldest]

One invocation = one bounded pass, like the reference CLI: idempotent
accounting DDL → delta discovery (≤ discovery-cap files) → incremental
load of configured jobs whose spreadsheets changed → optional oldest-
access probe. Prints one JSON line per phase; exit code 0 on success.

Sheet source: ``--sheets`` loads a local fixture JSON
(``{spreadsheet_id: {"name", "modifiedTime", "sheets": {sheet:
rows}}}``); ``--credentials`` selects the Google REST source (requires
googleapiclient + network, unavailable in CI — import-gated).
"""

from __future__ import annotations

import argparse
import json
import sys
from dataclasses import asdict

from .config import parse_config_file
from .etl import SheetsEtlEngine
from .session import get_spark
from .sources import FixtureSheetSource, SpreadsheetMeta


def _fixture_source(path: str) -> FixtureSheetSource:
    with open(path) as f:
        raw = json.load(f)
    src = FixtureSheetSource()
    for sid, spec in raw.items():
        if sid == "$schema":
            continue
        meta = SpreadsheetMeta(
            id=sid,
            modified_time=spec["modifiedTime"],
            name=spec.get("name", sid),
        )
        for sheet_name, rows in spec.get("sheets", {}).items():
            src.put_sheet(meta, sheet_name, rows)
    return src


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="google_sheets_etl_spark")
    ap.add_argument("--config", required=True, help="ETL job config JSON")
    ap.add_argument("--warehouse", required=True, help="warehouse directory")
    src_group = ap.add_mutually_exclusive_group(required=True)
    src_group.add_argument("--sheets", help="fixture sheet-source JSON")
    src_group.add_argument("--credentials", help="Google service-account key JSON")
    ap.add_argument("--discovery-cap", type=int, default=200,
                    help="max spreadsheets discovered per pass (Tasks.php:46)")
    ap.add_argument("--verify-oldest", action="store_true",
                    help="probe continued access to the longest-unseen file")
    args = ap.parse_args(argv)

    jobs = parse_config_file(args.config)
    if args.sheets:
        source = _fixture_source(args.sheets)
    else:
        from .sources.google_source import GoogleSheetSource

        source = GoogleSheetSource(args.credentials)

    spark = get_spark("sheets-etl-cli")
    spark.sparkContext.setLogLevel("ERROR")
    engine = SheetsEtlEngine(
        spark, args.warehouse, source, discovery_cap=args.discovery_cap
    )
    engine.set_up_accounting()
    n_found = engine.find_updated_spreadsheets()
    print(json.dumps({"phase": "discovery", "spreadsheets_seen": n_found}))

    results = engine.load_updated_spreadsheets(jobs)
    for r in results:
        print(json.dumps({
            "phase": "load",
            "job": asdict(r.job),
            "skipped_unchanged": r.skipped_unchanged,
            "rows_loaded": r.rows_loaded,
            "etl_job_id": r.etl_job_id,
        }))
    print(json.dumps({
        "phase": "summary",
        "jobs_configured": len(jobs),
        "jobs_loaded": sum(1 for r in results if not r.skipped_unchanged),
        "jobs_skipped_unchanged": sum(1 for r in results if r.skipped_unchanged),
    }))

    if args.verify_oldest:
        ok = engine.verify_oldest_spreadsheet()
        print(json.dumps({"phase": "verify_oldest", "accessible": ok}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
