"""Vector math over ``array<float|double>`` columns — pure built-ins.

``F.zip_with`` + ``F.aggregate`` compile to Catalyst higher-order
functions: the dot product of two 64-dim vectors is one codegen'd loop
per row, no Python, no UDF. At 100 TB this is the difference between a
JVM-tight scan and an Arrow round-trip per batch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """duckdb counterpart: ``list_cosine_similarity(a, b)``.

    Zero-norm guard: a single all-zeros embedding (padding row,
    failed encode) must yield NULL cosine — not a DIVIDE_BY_ZERO that
    aborts the whole job under Spark 4's default ANSI mode. NULL
    drops out of every downstream threshold/top-k comparison, which
    is the right semantics for an undefined angle."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)
