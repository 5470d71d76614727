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
) -> DataFrame:
    """Equi-join on ``key`` with the left side's hot keys spread over
    ``n_salts`` partitions. ``how`` must be 'inner' or 'left' (the
    right side is replicated, so right/full-outer multiplicity would
    be wrong).

    The salt mixes a row-content hash with the row's physical position
    (``monotonically_increasing_id``): content alone would give every
    EXACT-DUPLICATE row of a hot key the same salt — one reducer again,
    the precise scenario this operator exists for. Position is not
    stable across retries, but the salt only chooses PLACEMENT; the
    join's result rows are identical under any salt assignment, so
    determinism of output is unaffected."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left' only")
    l_salted = left.withColumn(
        SALT,
        F.pmod(
            F.xxhash64(
                *[F.col(c) for c in left.columns],
                F.monotonically_increasing_id(),
            ),
            F.lit(n_salts),
        ),
    )
    r_salted = right.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_salted, on=[key, SALT], how=how).drop(SALT)
