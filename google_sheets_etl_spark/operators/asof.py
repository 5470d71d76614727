"""As-of (point-in-time) join — an operator Spark's DataFrame API
lacks, composed from built-ins (extension surface; no reference
counterpart, SURVEY.md §2.7 notes the reference has no joins beyond
equi-joins on metadata).

For each left row, attach the payload of the LATEST right row with the
same key and ``right_time <= left_time`` (the ``>=`` convention of SQL
``ASOF JOIN``, which DuckDB implements natively — that is the oracle).

Implementation is the union–carry-forward pattern:

1. tag right rows 0 and left rows 1, union them on (key, time) space;
2. one window per key ordered by (time, tag) with
   ``last(payload, ignorenulls=True)`` over the unbounded-preceding
   frame — right payloads propagate forward to every later left row
   (tag order makes a right row at the exact same timestamp visible,
   i.e. ``>=`` not ``>``);
3. keep left rows.

Cost model: ONE shuffle of (|left| + |right|) rows on the join key,
then a linear per-partition pass — versus the naive
join-then-rank-all-matches which shuffles |left| x |avg matches|
intermediate rows. Skewed keys are AQE-splittable since the window
partitions by the same key as the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_time: str,
    start: str,
    end: str,
    bucket_width_s: int = 3600,
) -> DataFrame:
    """Range join (point ∈ [start, end], same key) without the
    nested-loop trap: Catalyst plans a bare inequality join as
    BroadcastNestedLoopJoin — O(|points|·|intervals|) and
    broadcast-bound. Instead, bucketize time at ``bucket_width_s``:
    each point lands in ONE bucket, each interval explodes to the
    buckets it spans, and the join becomes an equi-join on
    (key, bucket) followed by the exact range filter.

    A point inside an interval matches exactly one of the interval's
    exploded buckets, so no post-join dedup is needed. Cost:
    |intervals| × (span/width + 1) exploded rows shuffled on uniform
    keys — pick ``bucket_width_s`` near the typical interval span so
    the expansion factor stays ~2.

    Returns the joined (point columns + interval columns) rows.
    """
    p_bucket = F.floor(F.unix_timestamp(F.col(point_time)) / bucket_width_s)
    i_start = F.unix_timestamp(F.col(start))
    i_end = F.unix_timestamp(F.col(end))
    i_buckets = F.sequence(
        F.floor(i_start / bucket_width_s), F.floor(i_end / bucket_width_s)
    )
    p = points.withColumn("_bucket", p_bucket)
    i = intervals.withColumn("_bucket", F.explode(i_buckets))
    joined = p.join(i, on=[key, "_bucket"]).filter(
        (F.col(point_time) >= F.col(start)) & (F.col(point_time) <= F.col(end))
    )
    return joined.drop("_bucket")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str = "ts",
    right_time: str = "ts",
    payload_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``prefix``-renamed
    ``payload_cols`` from the latest ``right`` row at-or-before its
    timestamp (NULLs when no prior right row exists for the key)."""
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (key, right_time)]

    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            "struct<" + ", ".join(
                f"{c}: {right.schema[c].dataType.simpleString()}" for c in payload_cols
            ) + ">"
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ", ".join(
                f"{c}: {left.schema[c].dataType.simpleString()}" for c in left.columns
            ) + ">"
        ).alias("_l"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_carry", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return carried.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_carry.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
