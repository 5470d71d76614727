"""Streaming event analytics: watermarked windows + stateful sessions.

Batch twins of these live in ``queries.py`` (``events_hourly``,
``events_sessionize``) and are oracle-checked; the streaming versions
share the aggregation logic so batch correctness carries over. Tested
with ``trigger(availableNow=True)`` over file sources — the same code
runs continuous on a real stream (Kafka/files) unchanged.

Scale notes:
- the windowed count is an incremental stateful agg: state is bounded
  by (watermark horizon x windows x event_types), not stream length;
- late data beyond the watermark is dropped deterministically;
- ``sessionize_stream`` uses ``applyInPandasWithState``; per-user
  state is a single (last_ts, session_count) pair, the smallest state
  that computes gap sessions. State is kept for the stream's lifetime
  by default (the cumulative per-user count IS the semantics); pass
  ``idle_timeout_ms`` to evict users idle past the horizon — counts
  then cover "sessions since last eviction", the bounded-state trade.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

EVENTS_STREAM_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
])


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of event parquet/json drops."""
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .load(path)
    )


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark —
    the streaming twin of the oracled ``events_hourly`` query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


_SESSION_STATE = StructType([
    StructField("last_us", LongType()),
    StructField("n_sessions", LongType()),
])
_SESSION_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("n_sessions", LongType()),
])


def sessionize_stream(
    events: DataFrame, gap_s: int = 1800, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user gap-based session counting with explicit state —
    ``applyInPandasWithState`` keyed by user.

    Within a micro-batch events are sorted by time; across batches the
    (last_us, n_sessions) state carries the boundary. Same gap math as
    the batch ``events_sessionize`` oracle query (integer microseconds).

    ``idle_timeout_ms``: optional processing-time eviction for users
    idle past the horizon — bounds state by ACTIVE users at the cost of
    restarting an evicted user's count (see module docstring). Default
    keeps all-time state, which is what the batch-equality oracle
    requires."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if idle_timeout_ms is not None and state.hasTimedOut:
            state.remove()
            return
        last_us, n_sessions = state.get if state.exists else (None, 0)
        # a group's batch rows arrive as MULTIPLE Arrow chunks
        # (arrow.maxRecordsPerBatch); the gap scan needs the whole
        # micro-batch time-ordered, so collect chunks first and sort
        # ONCE — sorting per chunk while carrying last_us across them
        # would run the scan on an unsorted sequence whenever file
        # order isn't globally time-sorted, silently losing sessions
        # drop NULL timestamps BEFORE the int64 conversion: NaT casts
        # to INT64_MIN, which would sort first and phantom-increment
        # the session count (watermarked deployments drop such rows
        # upstream; this keeps un-watermarked batches correct too)
        chunks = [
            pd.to_datetime(pdf["ts"].dropna()).astype("int64") // 1000
            for pdf in pdfs
            if len(pdf) and pdf["ts"].notna().any()
        ]
        if chunks:
            for v in pd.concat(chunks).sort_values():
                v = int(v)
                if last_us is None or v - last_us > gap_s * 1_000_000:
                    n_sessions += 1
                last_us = v
        state.update((last_us, n_sessions))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame({"user_id": [key[0]], "n_sessions": [n_sessions]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of
    ``operators.dedup.exact_dedup``: drop any record whose key was
    already seen within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key
    and expires it once the event-time watermark passes, so state is
    bounded by (horizon × key cardinality within it), never stream
    length — the property that makes exactly-this dedup viable on an
    unbounded ingest feed. A duplicate arriving later than the horizon
    is NOT caught here (state already expired); the batch
    ``exact_dedup`` over the landed table is the backstop, same keys.
    """
    keys = key_cols or ["event_id"]
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def run_available_now(stream: DataFrame, out_path: str, checkpoint: str,
                      output_mode: str = "append") -> None:
    """Drain everything currently available through the streaming
    engine into parquet, then stop (test/backfill entry point)."""
    q = (
        stream.writeStream.outputMode(output_mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .format("parquet")
        .option("path", out_path)
        .start()
    )
    q.awaitTermination()


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def use_rocksdb_state(spark: SparkSession) -> str:
    """Switch new streaming queries to the RocksDB state store and
    return the previous provider (restore it when done). The default
    HDFS-backed provider keeps all state on the JVM heap — fine for
    bounded demo state, GC-fatal at 100 TB scale where keyed state
    (sessions, dedup horizon, join buffers) reaches hundreds of GB
    per executor; RocksDB spills to local disk with bounded memory.
    Runtime conf: applies to queries STARTED afterwards (each
    checkpoint records its provider; never flip providers on an
    existing checkpoint)."""
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    return prev
