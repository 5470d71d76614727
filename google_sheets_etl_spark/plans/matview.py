"""Incremental materialized-aggregate maintenance — mergeable
summaries for append-only ingest.

The 100 TB problem: a standing rollup (revenue by status, counts by
partner, data-quality tallies) must stay fresh under continuous loads,
and re-aggregating history on every load is O(table) when the new data
is O(load). The fix is the same algebra the typed-view profile store
and the count-min sketch already use: keep the aggregate in MERGEABLE
form (count, sum, min, max — each combinable cell-wise), summarize
ONLY the new load down to keyspace scale, and merge summaries. Per
load the work is one partial-aggregated pass over the delta plus a
keyspace-sized re-aggregation — history is never rescanned.

Non-mergeable surfaces derive at READ time from mergeable parts
(avg = sum/n; the reference's accounting takes the same shape: per-job
ETL state in DatabaseAgent.php:137-148 is written per load and never
recomputed from history). Measures that cannot decompose (exact median, distinct)
belong to the sketch modules (`operators.cms`, HLL/theta rows), which
trade exactness for the same mergeability.

Merging is a ``unionByName`` + one re-aggregation with each measure's
own combiner (count→sum, sum→sum, min→min, max→max) — associative and
commutative, so ANY number of per-load summaries merge in one pass and
load order never changes the result. Persistence composes with the
existing machinery: write each load's summary through
``plans.target_table`` keyed by load id (idempotent overwrite — the
streaming CMS discipline), read-side merge collapses them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_COMBINERS = {
    "count": F.sum, "sum": F.sum, "min": F.min, "max": F.max,
    # Datasketches HLL: union is the lossless merge — COUNT DISTINCT
    # becomes mergeable the moment it is kept as a sketch cell
    # (estimate at READ time via matview.estimate_distinct)
    "approx_distinct": F.hll_union_agg,
}


@dataclass(frozen=True)
class Measure:
    """One mergeable measure: ``kind`` in {count, sum, min, max,
    approx_distinct}; ``col`` is the source column (None for
    count)."""

    kind: str
    col: str | None = None

    def __post_init__(self) -> None:
        if self.kind not in _COMBINERS:
            raise ValueError(
                f"unmergeable measure kind {self.kind!r}: only "
                f"{sorted(_COMBINERS)} decompose cell-wise (derive avg "
                "from sum/count; approx_distinct IS the sketch path "
                "for COUNT DISTINCT; exact median does not decompose)"
            )
        if (self.kind == "count") != (self.col is None):
            raise ValueError(
                "count takes no source column; sum/min/max require one"
            )


def summarize(
    rows: DataFrame, keys: list[str], measures: dict[str, Measure]
) -> DataFrame:
    """Partial-aggregate a raw load down to keyspace scale — the
    per-load summary that gets merged instead of the load itself.
    One shuffle on the grouping keys (map-side combine first);
    output is |keyspace| rows regardless of load size."""
    aggs = []
    for alias, m in measures.items():
        if m.kind == "count":
            aggs.append(F.count(F.lit(1)).alias(alias))
        elif m.kind == "approx_distinct":
            # lgK=12 (~1.6% rsd) — the binary sketch IS the summary
            # cell; estimates derive at read time, never stored
            aggs.append(F.hll_sketch_agg(m.col, 12).alias(alias))
        else:
            aggs.append(getattr(F, m.kind)(m.col).alias(alias))
    return rows.groupBy(*keys).agg(*aggs)


def merge(
    summaries: list[DataFrame],
    keys: list[str],
    measures: dict[str, Measure],
) -> DataFrame:
    """Merge any number of per-load summaries into one: union, then
    one re-aggregation applying each measure's combiner (count cells
    ADD on merge — the combiner is sum, not count). Associative and
    commutative, so the standing summary plus k new loads merge in a
    single keyspace-sized pass, in any order, with the same result
    as one aggregation over all raw rows — the certified contract."""
    if not summaries:
        raise ValueError("nothing to merge")
    u = summaries[0]
    for s in summaries[1:]:
        u = u.unionByName(s)
    aggs = [
        _COMBINERS[m.kind](alias).alias(alias)
        for alias, m in measures.items()
    ]
    return u.groupBy(*keys).agg(*aggs)


def estimate_distinct(summary: DataFrame, alias: str):
    """Read-time estimate for an ``approx_distinct`` summary cell —
    the derive-at-read rule applied to sketches (avg = sum/n; distinct
    = estimate(sketch)). Returns a Column."""
    return F.hll_sketch_estimate(F.col(alias))
