"""Text feature columns: tokenization, shingles, engine-neutral minhash.

Cross-engine parity contract (the DuckDB expression each helper must
equal, used verbatim by the oracle SQL):

- ``words_of(text)``       ↔ ``string_split(text, ' ')``
- ``word_shingles(w, 3)``  ↔ ``list_transform(range(1, len(w)-1),
                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])``
- ``minhash_min(sh, i)``   ↔ ``list_min(list_transform(sh, x ->
      (A_i * ('0x' || substr(sha256(x),1,8))::BIGINT + B_i) % 2147483647))``

The minhash "permutations" are affine maps over a sha256-derived
uint32 base hash — deliberately engine-neutral (Spark's ``xxhash64``
and DuckDB's ``hash`` disagree; sha256 + exact int64 arithmetic does
not: A < 2^30 and h < 2^32 keep every product inside int64 in numpy,
the JVM, and DuckDB BIGINT alike) and deterministic across
partitionings. One cryptographic hash per shingle; k cheap affine
mins. Constants live in ``operators.dedup.MINHASH_A/B/P``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words_of(text: Column) -> Column:
    """Split on single spaces (documents corpus is single-spaced).
    NOTE: ``F.split`` takes a regex; a literal space is regex-safe."""
    return F.split(text, " ")


def word_shingles(words: Column, n: int = 3) -> Column:
    """All contiguous ``n``-word shingles, space-joined, in order.
    Empty array when the document has fewer than ``n`` words."""
    # sequence(1, size-n+1) is 1-based to align with element_at.
    # Guard: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty —
    # short docs must yield an explicitly empty array.
    idx = F.when(
        F.size(words) >= n,
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j).cast("int")) for j in range(n)]
        ),
    )


def minhash_min(shingles: Column, i: int) -> Column:
    """JVM-expressible twin of the i-th minhash permutation (the batch
    kernel in ``operators.dedup.minhash_signatures`` is the fast path;
    this form exists for pure-SQL composition): min over shingles of
    ``(A_i·h + B_i) mod p`` where h = first-4-bytes-of-sha256 as
    uint32. NULL for empty shingle arrays."""
    from ..operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    hashed = F.transform(
        shingles,
        lambda s: (
            F.lit(MINHASH_A[i])
            * F.conv(F.substring(F.sha2(s, 256), 1, 8), 16, 10).cast("long")
            + F.lit(MINHASH_B[i])
        )
        % F.lit(MINHASH_P),
    )
    return F.array_min(hashed)
