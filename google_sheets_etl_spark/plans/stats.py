"""Table profiling — the ANALYZE pass of the engine.

Real deployments feed Catalyst's cost-based decisions with table and
column statistics (``ANALYZE TABLE ... COMPUTE STATISTICS``); this
module is the queryable equivalent over any DataFrame: one single-pass
global aggregate producing per-column null counts, exact distinct
counts, and min/max, emitted in long form (one row per column) so the
profile of a thousand-column table is still one relation.

Plan shape: a single global ``agg`` — partial aggregation map-side,
one exchange carrying one partial row per task (distinct counts go
through Spark's expand + two-phase distinct aggregation, still keyed
map-side). Nothing is collected; the long-form pivot is a plan-side
``explode`` of one row. At 100 TB this is one full scan — exactly
what ANALYZE costs anywhere — and the scan prunes to the profiled
columns only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n_nulls, n_distinct, min_value, max_value) per profiled
    column, min/max rendered as strings so heterogeneous column types
    share one schema (callers with typed needs profile per column).
    """
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_n_{c}"),
            F.count_distinct(F.col(c)).alias(f"_d_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"_n_{c}").alias("n_nulls"),
            F.col(f"_d_{c}").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_value"),
            F.col(f"_max_{c}").alias("max_value"),
        )
        for c in cols
    ])
    return one.select(F.explode(rows).alias("s")).select("s.*")


def expectations_report(
    df: DataFrame, rules: list[tuple[str, "F.Column"]]
) -> DataFrame:
    """Declarative data-quality EXPECTATIONS evaluated in ONE scan —
    the ops-facing contract layer over a table (the
    Great-Expectations idea expressed as a conditional-aggregate
    projection): each rule is ``(name, boolean Column)`` where the
    column is TRUE when a row SATISFIES the expectation; NULL counts
    as a violation (an expectation that cannot be evaluated on a row
    is not met — the strict reading). Returns one row per rule:
    ``(rule, n_rows, n_violations, pass)``.

    Scale shape: all rules fold into a single aggregate over one
    table scan (conditional sums — map-side combine, one exchange of
    ONE row), then explode to the rules-sized report. Adding a rule
    adds a column to the same pass, never a scan."""
    if not rules:
        raise ValueError("no rules")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (_name, cond) in enumerate(rules):
        aggs.append(
            F.sum(
                F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)
            ).alias(f"_v_{i}")
        )
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(name).alias("rule"),
            F.col("_n").alias("n_rows"),
            F.col(f"_v_{i}").alias("n_violations"),
            (F.col(f"_v_{i}") == 0).alias("pass"),
        )
        for i, (name, _cond) in enumerate(rules)
    ])
    return one.select(F.explode(rows).alias("s")).select("s.*")
