"""COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005, "An improved data
stream summary: the count-min sketch and its applications") — the
mergeable fixed-size frequency summary for token/item streams too
large to count exactly: a depth×width integer counter grid where item
``t`` increments cell ``(r, h_r(t))`` in every row ``r``, and the
point estimate is the MINIMUM of t's cells — never an undercount
(every occurrence of t landed in all of them), overcounting only by
colliding mass (≤ εN with probability 1−δ at width=e/ε, depth=ln 1/δ).

Why next to Misra-Gries (``text.heavy_hitter_tokens``): MG answers
"which items are frequent" within a fixed candidate budget; CMS
answers "how frequent is THIS item" for any item, and — like the
typed-view profile counters — is a SUM-decomposable grid, so sketches
built over partitions, loads, or days merge EXACTLY by cell-wise
addition (``cms_merge``): the pre-aggregation shape that makes
corpus-wide frequency queries O(sketch) instead of O(rescan) at
100 TB.

Cross-engine exactness: row hashes are 60-bit md5 prefixes of
``"{row}:{item}"`` (the engine-neutral hash discipline used
throughout), counters are exact int64 — the whole sketch is
bit-identical in any engine at any parallelism, so the SQL twins
certify build, merge, and estimate with no tolerance band.

Scale shape: one explode+partial-aggregated pass per build; the
shuffle carries ≤ depth×width rows per task (the sketch itself —
metadata-scale by construction); estimates join a broadcast query
list against the sketch. Sparse representation: zero cells are
implicit (COALESCE 0 on read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(row_col, item_col, width: int):
    """Bucket of ``item`` in sketch row ``row``: 60-bit md5 prefix of
    'row:item' mod width."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(row_col.cast("string"), F.lit(":"), item_col)),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch over an item stream (one row per occurrence,
    or weighted via ``weight_col``). Returns sparse cells
    ``(r int, b long, cnt long)`` — non-zero cells only."""
    from .typed_views import ensure_parallelism

    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    items = ensure_parallelism(items)
    rows = items.select(F.col(item_col).alias("_it")).filter(
        F.col("_it").isNotNull()
    )
    if weight_col is not None:
        rows = items.select(
            F.col(item_col).alias("_it"),
            F.col(weight_col).cast("long").alias("_wt"),
        ).filter(F.col("_it").isNotNull())
    else:
        rows = rows.withColumn("_wt", F.lit(1).cast("long"))
    return (
        rows.select(
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
            "_it",
            "_wt",
        )
        .select(
            F.col("r").cast("int").alias("r"),
            _cell(F.col("r"), F.col("_it"), width).alias("b"),
            "_wt",
        )
        .groupBy("r", "b")
        .agg(F.sum("_wt").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise addition — EXACT by the sum-decomposition (an item's
    occurrences over disjoint inputs partition its every cell's
    increments). One metadata-scale shuffle on (r, b)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("r", "b").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point estimates for a query item list: min over the item's
    ``depth`` cells, absent cells counting 0. ``depth``/``width``
    must match the build. The query list broadcasts; the sketch is
    the only other input — no touch of the original stream. Returns
    ``(item, est long)``; est >= true count always."""
    probes = queries.select(F.col(item_col).alias("_it")).distinct().select(
        "_it",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    ).select(
        "_it",
        F.col("r").cast("int").alias("r"),
        _cell(F.col("r"), F.col("_it"), width).alias("b"),
    )
    joined = F.broadcast(probes).join(sketch, ["r", "b"], "left")
    return (
        joined.groupBy("_it")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .select(F.col("_it").alias(item_col), "est")
    )
