"""Streaming MATERIALIZED-AGGREGATE maintenance: the ``plans.matview``
mergeable-summary algebra kept current per micro-batch — the
aggregate-level sibling of the count-min stream. Each trigger
partial-aggregates its batch down to keyspace scale
(``matview.summarize``) and lands the summary under a batch-id-keyed
directory; the STANDING aggregate is the measure-combiner fold over
all landed batch summaries (``read_matview``), exact by the
merge algebra (count/sum cells add, min/max survive any grouping).

Exactly-once, stated precisely: summary addition is NOT idempotent
for count/sum (a replayed append would double-count), so the sink
uses the standard foreachBatch idempotence trick — each batch
OVERWRITES its own ``batch={id}`` directory, making checkpoint
replays converge instead of accumulate. Upstream duplicate
DELIVERIES are the caller's contract: compose with
``events_stream.dedup_stream`` as the driver row does.

Per trigger the work is one batch scan + a keyspace-sized write;
history is NEVER rescanned — the batch directories ARE the
incremental-load summaries ``plans.matview`` merges, now produced
continuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans import matview


def matview_stream(
    stream_df: DataFrame,
    summary_path: str,
    checkpoint: str,
    keys: list[str],
    measures: dict[str, matview.Measure],
    trigger: dict | None = None,
):
    """Maintain the standing summary for a streaming relation.
    Returns the started StreamingQuery; read the current state with
    :func:`read_matview`."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        matview.summarize(batch, keys, measures).write.mode(
            "overwrite"
        ).parquet(f"{summary_path}/batch={batch_id}")

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_matview(
    spark: SparkSession,
    summary_path: str,
    keys: list[str],
    measures: dict[str, matview.Measure],
) -> DataFrame:
    """The standing aggregate: one combiner fold over every landed
    batch summary (keyspace-scale shuffle — the aggregate itself)."""
    return matview.merge(
        [spark.read.parquet(summary_path)], keys, measures
    )
