"""Continuously-ingesting SEMANTIC ADMISSION: the batch operator
``similarity.incremental_semantic_admission`` driven per micro-batch,
with the admitted corpus itself as the accumulating state.

The deployed shape for "dedup the firehose against everything ever
admitted": each micro-batch of new embeddings is assigned to the
FIXED quantizer's cells and compared only against admitted corpus
cell-mates (plus earlier batch-mates); survivors append to the corpus
table, which the NEXT batch then sees. Batch-proportional work per
trigger, never corpus² — and the corpus table doubles as the
admission log.

Exactly-once caveat, documented honestly: the corpus append commits
AFTER the micro-batch's computation; a crash between the parquet
append and the checkpoint commit re-runs the batch, and re-admitted
rows would duplicate in the corpus. The admission math is
self-healing (a replayed row is rejected by its own earlier copy once
the append landed; if the append did NOT land, the replay re-admits
identically — same decision, deterministic), so the corpus converges
to the same admitted SET; duplicate physical rows from the
append-then-crash window are removed by the idempotent
``dropDuplicates`` on the admission id before each batch's
comparison. This is the foreachBatch at-least-once contract made
harmless by deterministic decisions + an idempotent read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.similarity import incremental_semantic_admission


def _corpus_exists(spark, path: str) -> bool:
    """True iff ``path`` holds COMMITTED corpus data, resolved by the
    Hadoop FileSystem for the path's own scheme (local, hdfs://,
    s3a://, abfss://...).

    Committed means at least one visible (non ``_``/``.``-prefixed)
    entry: a crash during the FIRST append can leave the directory
    existing with only ``_temporary`` in it — bare-path existence
    would then send every retry into ``read.parquet`` (which raises
    on a footerless dir) and livelock the stream on exactly the
    append-then-crash window the module contract covers. Spark only
    renames part files in on commit, so a visible entry implies
    committed data.

    Beyond that this deliberately raises on any filesystem error
    other than "not there" (connection refused, auth failure),
    because treating a flaky store as an absent corpus is the one way
    this stream can silently produce wrong state.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    if not fs.exists(jpath):
        return False
    if fs.getFileStatus(jpath).isFile():
        return True  # a lone file: let the reader judge it
    for st in fs.listStatus(jpath):
        if not st.getPath().getName().startswith(("_", ".")):
            return True
    return False


def admit_stream(
    stream_df: DataFrame,
    corpus_path: str,
    centroids: DataFrame,
    checkpoint: str,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger: dict | None = None,
):
    """Attach semantic admission to a streaming DataFrame of
    ``(id_col, vec_col)`` rows. Admitted rows (id, cell, embedding)
    append to ``corpus_path``; returns the started StreamingQuery."""
    spark = stream_df.sparkSession

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        # Probe path existence through the Hadoop FileSystem API, never
        # driver-local os.path: corpus_path may be s3://, hdfs://,
        # abfss:// — a local-fs probe would silently treat every remote
        # corpus as empty and cross-batch dedup would never happen.
        # ONLY a genuinely-missing path means "first trigger, empty
        # corpus". Any OTHER read failure (store throttling, expired
        # auth, corrupt footer) must raise out of this function so the
        # micro-batch fails and the checkpoint retries it — swallowing
        # it would compare the batch against an EMPTY corpus and
        # permanently admit near-duplicates under fresh ids that the
        # dropDuplicates(id) healing can never remove.
        if _corpus_exists(spark, corpus_path):
            corpus = (
                spark.read.parquet(corpus_path)
                .select("cell", id_col, vec_col)
                .dropDuplicates([id_col])  # append-then-crash healing
            )
        else:  # first trigger: path does not exist yet
            from pyspark.sql import functions as F

            corpus = (
                batch.select(id_col, vec_col)
                .withColumn("cell", F.lit(None).cast("long"))
                .select("cell", id_col, vec_col)
                .limit(0)
            )
        verdicts = incremental_semantic_admission(
            batch.select(id_col, vec_col),
            corpus,
            centroids,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            # admitted rows persist WITH their cell: the standing
            # corpus is never re-scored per trigger — work stays
            # batch-proportional as the corpus grows
            corpus_preassigned=True,
        )
        admitted = (
            verdicts.filter("admitted")
            .select(id_col, "cell")
            .join(batch.select(id_col, vec_col), id_col)
            .select("cell", id_col, vec_col)
        )
        admitted.write.mode("append").parquet(corpus_path)

    return (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
