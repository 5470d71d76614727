"""SparkSession factory tuned for the test harness and for scale.

Local testing runs a single JVM (``local[N]``); the configuration is
chosen so the same code is correct on a multi-executor cluster:

- AQE on (runtime coalescing, skew-join splitting) — at 100 TB the
  static ``shuffle.partitions`` is only a hint; AQE right-sizes it.
- ``partitionOverwriteMode=dynamic`` — the load path (U4, SURVEY.md
  §2.5) replaces exactly one ``_origin_etl_job_id`` partition per job;
  dynamic overwrite makes that a metadata-scoped operation instead of a
  full-table rewrite.
- Arrow enabled — every Python-side exchange (Pandas UDFs in the
  multimodal/text operators) is Arrow-batched, never row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sheets-etl-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # full sanitation, not just for the partition count: a non-numeric
    # or zero value interpolated into master=local[...] would crash
    # session construction after the guard "tolerated" it
    if not cpus.isdigit() or int(cpus) < 1:
        cpus = "32"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the gsheets Python DataSource prunes sheet partitions via
        # pushFilters; the capability is opt-in in Spark 4.1
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.parquet.mergeSchema", "false")
        # footer-stats MIN/MAX/COUNT answering (no data scan) for
        # pure aggregates; only triggers on the V2 parquet path —
        # inert under the default V1 reader, certified by the
        # aggregate-pushdown plan test
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS) which Spark's
        # vectorized reader rejects; read as long and convert in loaders
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
