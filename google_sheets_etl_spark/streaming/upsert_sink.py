"""Streaming MERGE sink: foreachBatch upsert into a partitioned
parquet table — the Structured-Streaming twin of the batch ETL's
upsert surface (U1-U5; reference semantics `DatabaseAgentMysql.php`
REPLACE-style load, re-expressed for a continuous feed).

Plain parquet has no row-level MERGE, so the upsert is PARTITION-
scoped, the same replaceWhere discipline as
``plans.target_table.TargetTable.overwrite_job_partition``:

1. within the micro-batch, keep the LATEST row per key (event-time
   ordered, batch-local window — micro-batch-sized input);
2. list the partitions the batch touches (distinct partition values —
   bounded by partitions-per-batch, metadata scale, the only
   ``collect`` here);
3. read ONLY those partitions back, drop rows whose key the batch
   replaces (anti-join on the uniform key), union the batch rows;
4. dynamic-partition-overwrite exactly those partitions (write-local
   option — never a session conf, same hardening as the batch path).

Crash safety: foreachBatch re-delivers a failed batch with the same
``batch_id``; every step above is deterministic in (table state,
batch), so the rewrite is idempotent — at-least-once delivery lands
exactly-once table state, the same argument as the batch engine's
accounting-last ordering (`etl.py`).

Scale: state in the streaming engine is zero (this sink aggregates
nothing); per-batch cost is (touched partitions x their size) — the
knob is the partition column's granularity. A day/hour partitioning
keeps rewrites local while the anti-join shuffles only batch-touched
partitions, never the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _orderable(dt) -> bool:
    """Whether a column of this type can appear in an ORDER BY —
    MapType (at any nesting depth) cannot."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def latest_per_key(batch: DataFrame, key_cols: list[str], seq_col: str) -> DataFrame:
    """Deduplicate a micro-batch to the highest-``seq_col`` row per
    key. Ties on the sequence column are broken by every remaining
    ORDERABLE column (descending) — ordering by ``seq_col`` alone would
    let row_number pick whichever row Spark sorted first, and a
    re-delivered batch could then land a DIFFERENT row, breaking the
    sink's exactly-once-table-state argument. Non-orderable columns
    (maps, at any nesting) are excluded from the tie-break rather than
    throwing AnalysisException; seq ties between rows that differ ONLY
    in non-orderable columns are resolved arbitrarily-but-
    deterministically (whichever the orderable-prefix sort ranks
    first)."""
    orderable, opaque = [], []
    for c in batch.columns:
        if c in key_cols or c == seq_col:
            continue
        (orderable if _orderable(batch.schema[c].dataType) else opaque).append(c)
    tiebreak = [F.col(c).desc() for c in orderable]
    if opaque:
        # last resort for rows differing ONLY in map-typed payload:
        # order by a hash of their JSON serialization (identical
        # binary rows serialize identically, so a re-delivered batch
        # ranks them the same way)
        tiebreak.append(
            F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in opaque]))).desc()
        )
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc(), *tiebreak)
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert_batch(
    spark,
    batch: DataFrame,
    table_path: str,
    key_cols: list[str],
    partition_col: str,
    seq_col: str,
) -> None:
    """One micro-batch MERGE (steps 1-4 above). Also the batch-mode
    backfill entry point — identical semantics either way."""
    fresh = latest_per_key(batch, key_cols, seq_col)
    # Hadoop FileSystem, NOT os.path: an s3a://-or-hdfs:// table path
    # would always look absent locally, the merge would be skipped, and
    # the overwrite would silently DELETE every existing key in the
    # touched partitions
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    exists = fs.exists(hpath) and any(
        "=" in st.getPath().getName()
        for st in fs.listStatus(hpath)
    )
    if exists:
        touched = [
            r[0] for r in fresh.select(partition_col).distinct().collect()
        ]
        current = spark.read.parquet(table_path).filter(
            F.col(partition_col).isin(touched)
        )
        keep = current.join(
            fresh.select(*key_cols).distinct(), on=key_cols, how="left_anti"
        )
        # additive schema evolution, both directions (the same
        # conform-to-union discipline as plans/state_table.upsert):
        # selecting only fresh.columns would silently DROP a table
        # column absent from the batch for every kept row, and a
        # batch that gained a column would crash the union
        all_cols = list(
            dict.fromkeys(list(keep.columns) + list(fresh.columns))
        )
        def _conform(df: DataFrame) -> DataFrame:
            missing = [c for c in all_cols if c not in df.columns]
            for c in missing:
                src = keep if c in keep.columns else fresh
                df = df.withColumn(
                    c, F.lit(None).cast(src.schema[c].dataType)
                )
            return df.select(*all_cols)

        merged = _conform(keep).unionByName(_conform(fresh))
    else:
        merged = fresh
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(table_path)
    )


def upsert_stream(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    key_cols: list[str],
    partition_col: str,
    seq_col: str,
    trigger: dict | None = None,
):
    """Attach the MERGE sink to a streaming DataFrame. Returns the
    started StreamingQuery (caller owns termination). ``trigger``
    passes through to ``writeStream.trigger`` — e.g.
    ``{"processingTime": "30 seconds"}`` for a continuous feed;
    default ``{"availableNow": True}`` drains what's present and
    stops (the batch-backfill / test shape)."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        upsert_batch(
            batch.sparkSession, batch, table_path,
            key_cols, partition_col, seq_col,
        )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
