"""Small-file compaction for partitioned parquet targets.

The incremental load path (one dynamic-overwrite write per sheet job,
``plans.target_table``; one micro-batch per trigger,
``streaming.upsert_sink``) accumulates many small files per partition
over time — the classic long-running-ingest pathology: at 100 TB a
table with 10^6 x 1 MB files spends more time in scan task scheduling
and footer reads than in I/O.

``compact_partitions`` is the maintenance pass:

1. Inventory files per partition from a directory listing — METADATA
   scale (one entry per file, never reads data; the only driver-side
   work here).
2. Select partitions that are actually fragmented: more than
   ``max_files`` files AND average file size under ``small_bytes``
   (a partition of few large files is already healthy — rewriting it
   would be wasted I/O).
3. Read ONLY those partitions (partition-pruned scan), repartition by
   the partition column so each partition's rows converge to one
   task → one output file, and dynamic-overwrite exactly those
   partitions. Healthy partitions are never touched.

Idempotent and crash-safe by the same argument as the load path: the
rewrite is deterministic in the table state, and re-running after a
crash just compacts again. Content is bit-identical (no dedup, no
reorder semantics — downstream queries never observe compaction
beyond file counts).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_file_stats(
    table_path: str, spark: SparkSession | None = None
) -> list[tuple[str, int, int]]:
    """(partition_dir_name, n_files, total_bytes) per partition dir —
    a driver-side listing, one entry per file, no data reads. With a
    ``spark`` handle the listing goes through the Hadoop FileSystem
    API (any scheme — file://, hdfs://, s3a://); without one it falls
    back to ``os`` for plain local paths (tests, single-box runs)."""
    out = []
    if spark is not None:
        jvm = spark._jvm
        root = jvm.org.apache.hadoop.fs.Path(table_path)
        fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(root):
            return out
        for st in sorted(
            fs.listStatus(root), key=lambda s: s.getPath().getName()
        ):
            name = st.getPath().getName()
            if "=" not in name or not st.isDirectory():
                continue
            n_files, total = 0, 0
            for f in fs.listStatus(st.getPath()):
                fn = f.getPath().getName()
                if fn.endswith(".parquet") and not fn.startswith((".", "_")):
                    n_files += 1
                    total += f.getLen()
            out.append((name, n_files, total))
        return out
    for name in sorted(os.listdir(table_path)):
        pdir = os.path.join(table_path, name)
        if "=" not in name or not os.path.isdir(pdir):
            continue
        files = [
            f for f in os.listdir(pdir)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        total = sum(os.path.getsize(os.path.join(pdir, f)) for f in files)
        out.append((name, len(files), total))
    return out


def compact_partitions(
    spark: SparkSession,
    table_path: str,
    partition_col: str,
    max_files: int = 4,
    small_bytes: int = 128 * 1024 * 1024,
) -> list[str]:
    """Rewrite fragmented partitions to ~one file each; returns the
    partition VALUES rewritten (empty when the table is healthy)."""
    from urllib.parse import unquote

    victims = []
    for name, n_files, total in partition_file_stats(table_path, spark):
        col, _, raw = name.partition("=")
        if col != partition_col:
            continue
        if n_files > max_files and (total // max(n_files, 1)) < small_bytes:
            # directory names are URL-escaped ('a b' → 'a%20b'); the
            # column VALUE is the unescaped form — compare on that, or
            # string partition values with spaces/colons silently
            # match nothing and compaction becomes a no-op that still
            # reports success
            victims.append(unquote(raw))
    if not victims:
        return []
    # mergeSchema: per-file schemas are first-class here (additive
    # evolution, plans/target_table.py) — inferring from one footer
    # would DROP evolved columns from the rewritten partition
    table = spark.read.option("mergeSchema", "true").parquet(table_path)
    # partition values arrive as directory-name strings; compare on a
    # string cast so long/date partition columns prune identically
    pruned = table.filter(
        F.col(partition_col).cast("string").isin(victims)
    )
    (
        pruned.repartition(len(victims), F.col(partition_col))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(table_path)
    )
    return victims
