"""Slowly-changing-dimension TYPE 2 maintenance — the versioned-
dimension pattern every warehouse load eventually needs: attribute
changes never overwrite; they CLOSE the current version's validity
interval and open a new one, so facts join point-in-time
(``fact.ts BETWEEN valid_from AND valid_to``) and history is
reconstructable. The reference's accounting keeps only latest-state
rows (DatabaseAgent.php:137-148 — Type 1); Type 2 is the standard
extension when downstream analytics need as-was joins.

``scd2_apply`` is one batch application of an update set to the
standing versioned dimension:

- keys NOT in the update batch pass through untouched;
- a current row whose attributes EQUAL the update's is a no-op (no
  spurious version — idempotent under redelivery of the same batch);
- a genuinely changed key closes its current row at the update
  timestamp and appends the new version (valid_from = update ts,
  open-ended).

All comparisons are on the caller's attribute columns; NULL-safe
equality (``eqNullSafe``) so NULL→value and value→NULL both count as
changes. Scale shape: one uniform-key join of the dimension against
the (much smaller, usually broadcastable) update batch, plus a union
— history is never rewritten, only the touched keys' current rows.
"""

from __future__ import annotations

from contextlib import contextmanager
from functools import reduce
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_END_US = 253_402_300_799_000_000  # 9999-12-31T23:59:59.999999Z


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str = "ts_us",
) -> DataFrame:
    """Apply one update batch to a versioned dimension.

    ``dim`` rows: (key, attrs..., valid_from_us, valid_to_us) with the
    current version carrying ``valid_to_us = OPEN_END_US``. ``updates``
    rows: (key, attrs..., ts_col) — at most ONE update per key per
    batch (raise otherwise: intra-batch ordering is the caller's
    contract, exactly the upsert sink's rule). Returns the refreshed
    dimension.

    Cache lifecycle: NONE — this variant leaves no executor-storage
    residue. The out-of-order guard evaluates the cur⋈updates
    broadcast join once; the returned plan re-derives its branches
    (each a narrow broadcast-join scan of ``cur``) on materialization.
    For the evaluate-once cached variant use ``scd2_batch`` (scoped
    context manager) or ``scd2_apply_batches`` (owned batch loop)."""
    result, _ = _scd2_build(dim, updates, key, attrs, ts_col, cache=False)
    return result


@contextmanager
def scd2_batch(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str = "ts_us",
) -> Iterator[DataFrame]:
    """``scd2_apply`` with the cur⋈updates join cached for the scope
    of the ``with`` block: the guard's evaluation is reused by every
    output branch, and the cache entry is released on exit — the
    context manager owns the lifecycle, no caller convention needed.

    >>> with scd2_batch(dim, batch, "k", ["attr"]) as refreshed:
    ...     refreshed.write.parquet(path)   # reads the cached join
    """
    result, joined = _scd2_build(dim, updates, key, attrs, ts_col,
                                 cache=True)
    try:
        yield result
    finally:
        joined.unpersist()


def scd2_apply_batches(
    dim: DataFrame,
    batches: list[DataFrame],
    key: str,
    attrs: list[str],
    ts_col: str = "ts_us",
) -> DataFrame:
    """Apply update batches in (ascending-timestamp) order, owning the
    whole cache lifecycle: each batch's cur⋈updates join is released
    as soon as the refreshed dimension is materialized, and each
    intermediate dimension is released when its successor lands — a
    thousand-batch loop holds at most two cache entries at any moment.
    Returns the final dimension PERSISTED and materialized (the one
    documented handle, same contract as ``pagerank``); the caller
    unpersists it after writing, or lets LRU eviction reclaim it."""
    cur = dim
    prev: DataFrame | None = None
    for b in batches:
        result, joined = _scd2_build(cur, b, key, attrs, ts_col,
                                     cache=True)
        try:
            nxt = result.persist()
            nxt.count()  # materialize THROUGH the cached join
        finally:
            joined.unpersist()
        if prev is not None:
            prev.unpersist()
        prev = nxt
        cur = nxt
    return cur


def _scd2_build(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str,
    cache: bool,
) -> tuple[DataFrame, DataFrame]:
    """Core plan builder. Returns ``(result, joined)``; with
    ``cache=True`` the cur⋈updates join is persisted (guard evaluation
    doubles as the materialization) and the CALLER owns the release —
    a guard raise unpersists before propagating, since an unreachable
    handle could never be released."""
    dup = updates.groupBy(key).count().filter(F.col("count") > 1)
    if dup.head(1):
        raise ValueError(
            "scd2_apply: multiple updates for one key in a single "
            "batch — pre-reduce to latest-per-key first"
        )
    cur = dim.filter(F.col("valid_to_us") == OPEN_END_US)
    hist = dim.filter(F.col("valid_to_us") != OPEN_END_US)
    u = updates.select(
        F.col(key),
        *[F.col(a).alias(f"_u_{a}") for a in attrs],
        F.col(ts_col).alias("_u_ts"),
    )
    joined = cur.join(F.broadcast(u), key, "left")
    if cache:
        joined = joined.persist()
    same = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"_u_{c}")) for c in attrs],
    )
    changed = F.col("_u_ts").isNotNull() & ~same
    # late / out-of-order updates are a caller bug, not data: an
    # update whose ts is <= the current version's valid_from_us would
    # close that version with valid_to_us <= valid_from_us — an
    # INVERTED validity interval that silently corrupts every as-was
    # (BETWEEN) join downstream. Raise with the duplicate-key guard's
    # strictness; apply batches in timestamp order instead.
    late = joined.filter(
        changed & (F.col("_u_ts") <= F.col("valid_from_us"))
    )
    try:
        has_late = bool(late.head(1))
    except Exception:
        joined.unpersist()
        raise
    if has_late:
        joined.unpersist()
        raise ValueError(
            "scd2_apply: update timestamp <= the current version's "
            "valid_from_us — out-of-order batch; apply update batches "
            "in ascending timestamp order"
        )
    # untouched keys + no-op updates pass through as-is
    kept_cur = joined.filter(~changed).select(*cur.columns)
    closed = joined.filter(changed).select(
        *[c for c in cur.columns if c != "valid_to_us"],
        F.col("_u_ts").alias("valid_to_us"),
    ).select(*cur.columns)
    opened = joined.filter(changed).select(
        F.col(key),
        *[F.col(f"_u_{a}").alias(a) for a in attrs],
        F.col("_u_ts").alias("valid_from_us"),
        F.lit(OPEN_END_US).alias("valid_to_us"),
    ).select(*cur.columns)
    # brand-new keys (no current row at all) open at their update ts
    new_keys = u.join(cur.select(key), key, "left_anti").select(
        F.col(key),
        *[F.col(f"_u_{a}").alias(a) for a in attrs],
        F.col("_u_ts").alias("valid_from_us"),
        F.lit(OPEN_END_US).alias("valid_to_us"),
    ).select(*cur.columns)
    result = hist.unionByName(kept_cur).unionByName(closed).unionByName(
        opened
    ).unionByName(new_keys)
    return result, joined
