"""Text feature columns: tokenization, shingles, engine-neutral minhash.

Cross-engine parity contract (the DuckDB expression each helper must
equal, used verbatim by the oracle SQL):

- ``words_of(text)``       ↔ ``string_split(text, ' ')``
- ``word_shingles(w, 3)``  ↔ ``list_transform(range(1, len(w)-1),
                                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])``
- ``minhash_min(sh, seed)``↔ ``list_min(list_transform(sh,
                                s -> sha256(seed || '|' || s)))``

The minhash "permutations" are seeded cryptographic hashes compared as
hex strings — deliberately engine-neutral (Spark's ``xxhash64`` and
DuckDB's ``hash`` disagree, sha256 hex does not) and deterministic
across partitionings. Hex-string min == numeric min of the underlying
256-bit value, so the LSH collision probability ≈ Jaccard similarity
property is preserved exactly.
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


def minhash_min(shingles: Column, seed: int) -> Column:
    """Min (lexicographic hex == numeric) of seeded sha256 over
    shingles; NULL for empty shingle arrays."""
    hashed = F.transform(
        shingles, lambda s: F.sha2(F.concat(F.lit(f"{seed}|"), s), 256)
    )
    return F.array_min(hashed)
