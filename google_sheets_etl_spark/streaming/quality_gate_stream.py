"""Streaming QUALITY-GATED ingest admission: the composed front door
of a training-data pipeline — per micro-batch of documents, (1) score
fluency under a FROZEN add-k bigram LM (``text.bigram_lm_fit`` /
``bigram_lm_score`` — the CCNet perplexity filter), (2) exact-dedup
by content hash against everything ever admitted AND batch-internally
(lowest id wins), (3) admit survivors to the corpus table, which the
next batch then sees. The corpus table doubles as the admission log,
carrying each document's score.

Rejection policy, documented: a document with fewer than 2 tokens has
no bigram evidence and is REJECTED (the gate cannot certify fluency
it cannot measure); a duplicate hash is rejected regardless of score
(first admitted copy wins — scores are content-deterministic, so any
copy scores the same).

Model scale shape: the LM is vocabulary-bounded (≤V² rows), fitted
ONCE offline and broadcast into every batch's scoring joins — the
train split is never re-counted per trigger. Per-trigger work is
batch-proportional plus one hash-column read of the admitted corpus.

At-least-once caveat (the ``admission_stream`` contract): the corpus
append commits after the batch computation; a replayed batch
re-derives identical verdicts (scores and hashes are pure functions
of content), and its duplicates are suppressed by the hash anti-join
against the landed append — or re-admitted identically if the append
never landed. The admitted SET converges either way; physical
duplicate rows from the append-then-crash window are healed by the
``dropDuplicates(content_hash)`` on every corpus read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.text import bigram_lm_score
from .admission_stream import _corpus_exists


def quality_gate_stream(
    stream_df: DataFrame,
    corpus_path: str,
    model,
    checkpoint: str,
    max_bits: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger: dict | None = None,
):
    """Attach the quality+dedup gate to a streaming DataFrame of
    ``(id_col, text_col)`` rows. Admitted rows
    ``(id, content_hash, n_bigrams, bits_per_bigram)`` append to
    ``corpus_path``; returns the started StreamingQuery."""
    spark = stream_df.sparkSession

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        hashed = batch.select(
            id_col, text_col, F.md5(F.col(text_col)).alias("content_hash")
        )
        # batch-internal first-wins (lowest id): deterministic under
        # replay, mirrors the incremental-admission earlier-id rule
        w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
        firsts = (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if _corpus_exists(spark, corpus_path):
            seen = (
                spark.read.parquet(corpus_path)
                .select("content_hash")
                .dropDuplicates(["content_hash"])  # replay healing
            )
            firsts = firsts.join(seen, "content_hash", "left_anti")
        scored = bigram_lm_score(
            firsts.select(id_col, text_col), model,
            text_col=text_col, id_col=id_col,
        )
        admitted = (
            firsts.join(scored, id_col)  # inner: <2-token docs drop
            .filter(F.col("bits_per_bigram") <= max_bits)
            .select(id_col, "content_hash", "n_bigrams", "bits_per_bigram")
        )
        admitted.write.mode("append").parquet(corpus_path)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
