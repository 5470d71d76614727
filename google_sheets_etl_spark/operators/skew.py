"""Skew mitigation for joins on hot keys.

AQE's skew-join handling (enabled in ``session.py``) splits oversized
sort-merge partitions at runtime and is the FIRST line of defense.
Salting is the explicit fallback for plans AQE can't rewrite — e.g. a
skewed shuffled hash join feeding a stateful op, or a key so hot that
even a split partition's build side overflows.

``salted_join`` spreads one hot left key across ``n_salts`` reducer
partitions: the left side gets a deterministic per-row salt, the right
side is replicated once per salt value, and the join key becomes
(key, salt). Result rows are identical to the plain equi-join; cost is
|right| × n_salts replicated rows — use it when the right side is
small-ish but above the broadcast threshold and the left is skewed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    uid_col: str | None = None,
) -> DataFrame:
    """Equi-join on ``key`` with the left side's hot keys spread over
    ``n_salts`` partitions. ``how`` must be 'inner' or 'left' (the
    right side is replicated, so right/full-outer multiplicity would
    be wrong).

    The salt must be DETERMINISTIC per row: a nondeterministic
    component (``monotonically_increasing_id``, ``rand``) inside a
    shuffle partitioning key is the SPARK-23207 bug class — a partial
    map-stage retry after a fetch failure re-salts the recomputed rows
    onto different reduce partitions than the surviving map outputs,
    silently losing or duplicating join rows (Spark only guards its
    built-in round-robin case, not user expressions).

    Default salt: ``xxhash64`` over the row's full content — stable
    under any retry. EXACT-duplicate rows of a hot key then share a
    salt; if your corpus concentrates identical (key, payload) rows,
    pass ``uid_col`` — a stable, unique, data-derived id column (a
    primary key, not a generated position) — and the salt hashes that
    instead, spreading even verbatim duplicates."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left' only")
    salt_src = (
        [F.col(uid_col)] if uid_col is not None
        else [F.col(c) for c in left.columns]
    )
    l_salted = left.withColumn(
        SALT, F.pmod(F.xxhash64(*salt_src), F.lit(n_salts))
    )
    r_salted = right.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_salted, on=[key, SALT], how=how).drop(SALT)
