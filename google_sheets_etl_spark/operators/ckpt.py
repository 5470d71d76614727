"""Shared checkpoint-durability plumbing for iterative operators.

Three operators materialize intermediate state per round and truncate
lineage (``connected_components``, ``kmeans_lloyd``,
``semantic_dedup``). Each takes a ``checkpoint_dir`` knob with the
same contract:

- ``None`` → ``localCheckpoint(eager=True)``: executor-local blocks,
  fastest, right for local mode and tests, but NON-REPLICATED — on a
  real cluster one lost executor after materialization fails the
  query instead of recomputing.
- a path → ``sparkContext.setCheckpointDir`` + reliable
  ``checkpoint()``: blocks land on fault-tolerant storage (HDFS/S3),
  so a 1000-executor prod run survives executor churn mid-iteration
  at the cost of one write per round.

This module owns the set/restore discipline so every operator gets it
identically — including the case the round-5 advisory flagged: when
the application had NO prior checkpoint dir, restore must CLEAR the
setting (``setCheckpointDir(None)`` → Scala ``Option(null)`` = unset)
instead of leaving the application-wide dir permanently pointed at
one caller's per-run directory, where later unrelated
``checkpoint()`` users would silently write.

Checkpoint DATA outlives the scope by design — the returned frames
read from the final round's checkpoint — so storage cleanup is the
caller's, after results are consumed (point each run at its own
subdir; Spark only auto-cleans with
``spark.cleaner.referenceTracking.cleanCheckpoints=true``).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Callable, Iterator

from pyspark.sql import DataFrame


@contextmanager
def scoped_checkpoint_dir(sc, checkpoint_dir: str | None) -> Iterator[None]:
    """Set the application-wide checkpoint dir for the duration of the
    block and restore the prior state on exit — including restoring to
    UNSET when no dir was previously defined. No-op when
    ``checkpoint_dir`` is None.

    Safe to restore eagerly because every checkpoint taken inside the
    scope is eager: nothing after the restore writes to our dir.
    """
    if checkpoint_dir is None:
        yield
        return
    prev = sc._jsc.sc().getCheckpointDir()
    prev_dir = prev.get() if prev.isDefined() else None
    sc.setCheckpointDir(checkpoint_dir)
    try:
        yield
    finally:
        # setCheckpointDir(None) reaches Scala as Option(null) → None,
        # i.e. genuinely unset — not a dir named "None"
        sc.setCheckpointDir(prev_dir)


def make_ckpt(checkpoint_dir: str | None) -> Callable[[DataFrame], DataFrame]:
    """The per-round materializer under the contract above. Both paths
    are EAGER so callers may count/branch on the result immediately
    and the scope may restore the dir on exit."""
    if checkpoint_dir is None:
        return lambda df: df.localCheckpoint(eager=True)
    return lambda df: df.checkpoint(eager=True)
