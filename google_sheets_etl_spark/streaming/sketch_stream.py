"""Streaming COUNT-MIN SKETCH maintenance: a standing, mergeable
frequency summary kept current per micro-batch — the sketch sibling
of the admission streams. Each trigger folds its batch into a
depth×width cell table (``operators.cms.cms_build``) and lands it
under a batch-id-keyed directory; the STANDING sketch is the
cell-wise sum over all landed batches (``read_sketch``), exact by the
CMS sum-decomposition.

Exactly-once, stated precisely: CMS addition is NOT idempotent (a
replayed append would double-count), so the sink uses the standard
foreachBatch idempotence trick — each batch OVERWRITES its own
``batch={id}`` partition directory, making replays converge instead
of accumulate. Upstream duplicate DELIVERIES (same logical record,
new batch) are the caller's contract: compose with
``events_stream.dedup_stream`` (watermarked key dedup) as the driver
row does — dedup makes delivery exactly-once-per-key, the keyed
overwrite makes processing exactly-once-per-batch, and the standing
sketch then equals the single-copy batch sketch bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cms import cms_build


def sketch_stream(
    stream_df: DataFrame,
    sketch_path: str,
    checkpoint: str,
    item_col: str = "item",
    depth: int = 4,
    width: int = 1024,
    trigger: dict | None = None,
):
    """Maintain the standing sketch for a streaming item column.
    Returns the started StreamingQuery; read the current state with
    :func:`read_sketch`."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        cells = cms_build(
            batch.select(item_col), item_col=item_col,
            depth=depth, width=width,
        )
        # batch-keyed OVERWRITE: a checkpoint replay rewrites the same
        # directory — idempotent where a bare append would double-count
        cells.write.mode("overwrite").parquet(
            f"{sketch_path}/batch={batch_id}"
        )

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def read_sketch(spark: SparkSession, sketch_path: str) -> DataFrame:
    """The standing sketch: cell-wise sum over every landed batch
    (one metadata-scale shuffle on (r, b) — the sketch itself)."""
    return (
        spark.read.parquet(sketch_path)
        .groupBy("r", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )
