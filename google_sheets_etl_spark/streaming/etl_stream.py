"""The WHOLE reference pipeline as one continuous stream: discovery →
accounting → change-filtered per-sheet loads, driven by Structured
Streaming instead of cron.

The reference runs ``Tasks::findSomeUpdatedSpreadsheets`` +
``loadSomeUpdatedSpreadsheets`` on a schedule (``Tasks.php:34-69``);
here the SAME engine methods hang off a streaming discovery source
(``sources/spark_datasource.SheetsDiscoveryDataSource``) whose offset
is the reference's ``(modifiedTime, id)`` tuple cursor — so the
cron loop's never-skip / never-repeat invariant is enforced by the
streaming checkpoint, and the whole idempotent load machinery (hash
short-circuit, partition overwrite, accounting-last commit) runs
unchanged per micro-batch.

Each batch is metadata-scale (one row per UPDATED spreadsheet, capped
by the cursor) — the ``collect()`` is the same bounded driver hop the
batch discovery pass makes; per-sheet extraction stays inside the
engine's own scan machinery.
"""

from __future__ import annotations

import time

from ..config import EtlJob
from ..etl import SheetsEtlEngine
from ..sources.sheet_source import SpreadsheetMeta


def stream_etl(
    engine: SheetsEtlEngine,
    discovery_path: str,
    checkpoint: str,
    jobs: list[EtlJob],
    trigger: dict | None = None,
):
    """Attach the full ETL to a streaming discovery feed. Returns the
    started StreamingQuery. ``trigger`` as in
    ``streaming.upsert_sink.upsert_stream`` (default drains available
    updates and stops; pass ``{"processingTime": "..."}`` for the
    continuous deployment)."""
    from ..sources.spark_datasource import SheetsDiscoveryDataSource

    spark = engine.spark
    try:
        spark.dataSource.register(SheetsDiscoveryDataSource)
    except Exception:
        pass  # registered earlier in this session

    stream = (
        spark.readStream.format("gsheets-discovery")
        .option("path", discovery_path)
        .load()
    )

    by_spreadsheet: dict[str, list[EtlJob]] = {}
    for j in jobs:
        by_spreadsheet.setdefault(j.google_spreadsheet_id, []).append(j)

    def _apply(batch, batch_id: int) -> None:
        rows = batch.collect()  # metadata-scale: one row per update
        if not rows:
            return
        metas = [
            SpreadsheetMeta(
                id=r["google_spreadsheet_id"],
                modified_time=r["google_modified"],
                name=r["google_spreadsheet_id"],
            )
            for r in rows
        ]
        engine.record_spreadsheets_seen(metas, int(time.time()))
        touched = {m.id for m in metas}
        pending = [
            job
            for sid in sorted(touched)
            for job in by_spreadsheet.get(sid, [])
        ]
        # continue_on_error=False: a failed per-sheet load must FAIL
        # the micro-batch so Structured Streaming retries it. Under
        # the cron model stale accounting re-selects a failed job on
        # the next run, but the stream only re-emits a file when its
        # modifiedTime changes — swallowing the error here would
        # commit the checkpoint past the update and lose the load
        # until the sheet's next edit.
        engine.load_updated_spreadsheets(pending, continue_on_error=False)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
