"""Target (data-plane) tables: partitioned parquet with per-job
overwrite (U4/U5) and additive schema evolution (U7).

The reference loads each (spreadsheet, sheet) job with
``DELETE FROM target WHERE _origin_etl_job_id = ?`` followed by chunked
inserts, inside one transaction (``src/DatabaseAgentMysql.php:254-292``).
The Spark-native equivalent: a parquet table **partitioned by**
``_origin_etl_job_id`` written with *dynamic partition overwrite* —
``INSERT OVERWRITE`` replaces exactly the partitions present in the
incoming DataFrame and leaves every other job's data untouched. One
job's refresh is therefore O(that sheet), not O(table), at any scale,
and the partition column gives partition pruning to every downstream
query that filters by job.

Schema evolution (U7): parquet allows per-file schemas; reads use
``mergeSchema=true`` so a job that gained columns widens the logical
table, old rows null-padded — the analogue of additive ``ADD COLUMN``
with "already exists" swallowed (``DatabaseAgentMysql.php:158-178``).

Atomicity note (U6, SURVEY.md §7.4): a parquet dynamic overwrite is not
a single atomic commit like Delta's. The engine compensates at the
orchestration layer (``etl.py``): the data write is idempotent (re-run
replaces the same partition) and accounting commits *last*, so a crash
between the two re-does a cheap, hash-short-circuited load instead of
corrupting state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

PARTITION_COL = "_origin_etl_job_id"


class TargetTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            not n.startswith((".", "_")) or n == "_SUCCESS" for n in os.listdir(self.path)
        )

    def overwrite_job_partition(self, data: DataFrame) -> None:
        """U4+U5: replace exactly the ``_origin_etl_job_id`` partitions
        present in ``data`` (requires
        ``spark.sql.sources.partitionOverwriteMode=dynamic``, set by
        ``session.get_spark``)."""
        if PARTITION_COL not in data.columns:
            raise ValueError(f"data must carry {PARTITION_COL}")
        (
            data.write.mode("overwrite")
            .partitionBy(PARTITION_COL)
            .parquet(self.path)
        )

    def read(self) -> DataFrame:
        return self.spark.read.option("mergeSchema", "true").parquet(self.path)
