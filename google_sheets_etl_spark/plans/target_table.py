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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

PARTITION_COL = "_origin_etl_job_id"
ROWID_COL = "_rowid"


class TargetTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _hadoop_fs(self):
        """(Path, FileSystem) for this table — the Hadoop API resolves
        any scheme (file://, hdfs://, s3a://); ``os.path`` would make
        every non-local table look absent (and _rowid numbering would
        silently restart at 0, breaking the never-reuse key contract —
        the same failure class the streaming sink's existence check
        already guards)."""
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(self.path)
        fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return hpath, fs

    def _is_local(self) -> bool:
        scheme = self.path.split("://", 1)[0] if "://" in self.path else ""
        return scheme in ("", "file")

    def exists(self) -> bool:
        """True when the table holds DATA: partition dirs are named
        ``_origin_etl_job_id=N`` (leading underscore — a bare "not
        hidden" listing misses them). A ``_SUCCESS``-only directory
        (the footprint of an empty first write) does NOT count — a
        read of it cannot infer a schema and would crash every
        subsequent load. Hadoop FileSystem listing: scheme-agnostic."""
        hpath, fs = self._hadoop_fs()
        if not fs.exists(hpath) or not fs.getFileStatus(hpath).isDirectory():
            return False
        for st in fs.listStatus(hpath):
            n = st.getPath().getName()
            if n == "_temporary":
                continue
            if "=" in n or (
                n.endswith(".parquet") and not n.startswith((".", "_"))
            ):
                return True
        return False

    def overwrite_job_partition(self, data: DataFrame, with_rowid: bool = False) -> None:
        """U4+U5: replace exactly the ``_origin_etl_job_id`` partitions
        present in ``data``. The dynamic-overwrite mode is a PER-WRITE
        option, not an assumed session conf — under a vanilla session a
        plain ``mode=overwrite`` + ``partitionBy`` would silently drop
        every other job's partitions.

        ``with_rowid`` mirrors the reference's auto-increment surrogate
        key (``DatabaseAgentMysql.php:159``): new rows continue from the
        current table max, like MySQL never reusing deleted ids when a
        job's partition is replaced. The numbering window is
        unpartitioned (single reducer) — fine because one load is one
        sheet's rows, metadata-scale next to the table.
        """
        if PARTITION_COL not in data.columns:
            raise ValueError(f"data must carry {PARTITION_COL}")
        if with_rowid:
            base = 0
            if self.exists():
                # metadata-scale fast path: the table max comes from
                # parquet FOOTER statistics (exact for int64), so a
                # tiny incremental load never scans a 100 TB table's
                # data pages for one number
                base = self._rowid_max_from_footers()
                if base is None:
                    existing = self.read()
                    base = 0
                    if ROWID_COL in existing.columns:
                        base = existing.agg(
                            F.coalesce(F.max(ROWID_COL), F.lit(0))
                        ).first()[0]
            # single-partition window is deliberate and BOUNDED: the
            # frame is one load batch — one spreadsheet's rows (the
            # Sheets product caps a file at ~10M cells), never the
            # accumulated table — and _rowid must be a gapless
            # sequential allocation over exactly that batch
            w = Window.orderBy(PARTITION_COL, "_origin_row")
            data = data.withColumn(
                ROWID_COL, (F.lit(int(base)) + F.row_number().over(w)).cast("long")
            )
        (
            data.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(PARTITION_COL)
            .parquet(self.path)
        )

    def _rowid_max_from_footers(self) -> int | None:
        """max(_rowid) from parquet footer statistics — one footer read
        per file, zero data pages. None when any file lacks usable
        stats (caller falls back to the full aggregate) or no file
        carries the column (legacy pre-rowid table → base 0)."""
        if not self._is_local():
            # pyarrow footer reads below are local-fs; a remote table
            # takes the exact Spark aggregate fallback (still cheap —
            # column-pruned scan of one int64 column)
            return None
        try:
            import pyarrow.parquet as pq

            # manual walk, NOT pyarrow.dataset: the partition dirs are
            # named _origin_etl_job_id=N and dataset discovery treats
            # underscore-prefixed paths as hidden, silently yielding
            # zero fragments
            files = []
            for root, _dirs, names in os.walk(self.path):
                files += [
                    os.path.join(root, n)
                    for n in names
                    if n.endswith(".parquet") and not n.startswith((".", "_"))
                ]
            best: int | None = None
            saw_column = False
            for fpath in files:
                pf = pq.ParquetFile(fpath)
                for g in range(pf.metadata.num_row_groups):
                    rg = pf.metadata.row_group(g)
                    for i in range(rg.num_columns):
                        c = rg.column(i)
                        if c.path_in_schema.split(".")[0] != ROWID_COL:
                            continue
                        saw_column = True
                        if c.statistics is None or c.statistics.max is None:
                            return None  # unreliable → exact fallback
                        v = int(c.statistics.max)
                        best = v if best is None or v > best else best
            if not saw_column:
                return 0  # pre-rowid table (or no data files): base 0
            return best
        except Exception:
            return None

    def delete_job_partition(self, job_id: int) -> None:
        """The DELETE half of U4 for an EMPTY reload: dynamic overwrite
        replaces only partitions present in the incoming frame, so a
        sheet whose data rows were all deleted would otherwise keep
        serving its stale partition forever (with accounting happily
        hash-short-circuiting every later run). The reference's
        ``DELETE FROM target WHERE _origin_etl_job_id = ?`` has no
        incoming-rows precondition — neither does this. Hadoop
        FileSystem recursive delete: scheme-agnostic (file/hdfs/s3a),
        same semantics everywhere."""
        jvm = self.spark._jvm
        pdir = jvm.org.apache.hadoop.fs.Path(
            self.path + f"/{PARTITION_COL}={job_id}"
        )
        fs = pdir.getFileSystem(self.spark._jsc.hadoopConfiguration())
        if fs.exists(pdir):
            fs.delete(pdir, True)

    def read(self) -> DataFrame:
        return self.spark.read.option("mergeSchema", "true").parquet(self.path)
