"""Streaming MEDIA ingest admission: the multimodal front door — per
micro-batch of ``(media_id, payload)`` rows, (1) run the parse-only
decode audit (``multimodal.payload_decode_audit``'s magic-byte
dispatch: P6/PNG/JPEG/GIF/WAV strict parsers, pinned ValueErrors),
(2) exact-dedup by payload content hash against everything ever
landed AND batch-internally (lowest id wins), (3) route decodable
payloads to the ADMITTED table and rejects to the DEAD-LETTER table
with the parser's pinned error — the triage channel a 100 TB media
ingest runs as its side output, here as a first-class streaming sink.

This is the ``quality_gate_stream`` contract transplanted to binary
media: verdicts and hashes are pure functions of payload bytes, so an
at-least-once redelivery re-derives identical routing and the hash
anti-join suppresses duplicates on BOTH channels; the landed SETS
converge under replay, and physical duplicates from an
append-then-crash window are healed by ``dropDuplicates`` on read.

Scale shape: the audit kernel is parse-only (headers + bounds
checks), narrow, batch-proportional; the only corpus-sized read per
trigger is one hash column of each landed table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.multimodal import payload_decode_audit
from .admission_stream import _corpus_exists


def media_gate_stream(
    stream_df: DataFrame,
    admitted_path: str,
    deadletter_path: str,
    checkpoint: str,
    id_col: str = "media_id",
    trigger: dict | None = None,
    audit_fn=None,
):
    """Attach the decode+dedup gate to a streaming DataFrame of
    ``(id_col, payload)`` rows. Admitted rows ``(id, content_hash)``
    append to ``admitted_path``; rejects ``(id, content_hash, err)``
    to ``deadletter_path``. Returns the started StreamingQuery.

    ``audit_fn`` is the verdict function — any parse-only
    ``(df, id_col) -> (id, ok, err)`` relation (default: the media
    decode audit; pass ``cleaning.warc_payload_audit`` for the web
    front door). The gate's dedup/replay/routing machinery is
    format-agnostic: verdicts are pure functions of payload bytes."""
    spark = stream_df.sparkSession

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        hashed = batch.select(
            id_col, "payload", F.md5(F.col("payload")).alias("content_hash")
        )
        w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
        firsts = (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        seen = None
        for path in (admitted_path, deadletter_path):
            if _corpus_exists(spark, path):
                part = (
                    spark.read.parquet(path)
                    .select("content_hash")
                    .dropDuplicates(["content_hash"])  # replay healing
                )
                seen = part if seen is None else seen.unionByName(part)
        if seen is not None:
            firsts = firsts.join(
                seen.dropDuplicates(["content_hash"]),
                "content_hash",
                "left_anti",
            )
        verdicts = (audit_fn or payload_decode_audit)(
            firsts, id_col=id_col
        )
        routed = firsts.join(verdicts, id_col).localCheckpoint(eager=True)
        # localCheckpoint: both sinks commit from ONE computed batch —
        # re-deriving per sink would parse every payload twice
        routed.filter(F.col("ok")).select(id_col, "content_hash").write.mode(
            "append"
        ).parquet(admitted_path)
        routed.filter(~F.col("ok")).select(
            id_col, "content_hash", "err"
        ).write.mode("append").parquet(deadletter_path)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
