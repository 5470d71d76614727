"""Reusable Column-level helpers.

Everything here is built from ``pyspark.sql.functions`` only — JVM-side,
whole-stage-codegen-able, no Python UDFs. Each helper has an exact
DuckDB-SQL counterpart (used by the oracle strings in ``queries.py``),
which pins cross-engine semantics:

- hashes: ``sha2(x, 256)``  ↔  duckdb ``sha256(x)`` (identical hex)
- word shingles: ``word_shingles``  ↔  duckdb ``list_transform(range(...))``
- minhash: ``array_min`` over seeded sha256 of shingles — engine-neutral
  (no reliance on xxhash64/duckdb-hash, which differ across engines)
- cosine: ``F.aggregate`` over ``zip_with`` products (double math)
"""

from .vectors import cosine_similarity, dot, l2_norm
from .textfns import word_shingles, minhash_min, words_of

__all__ = [
    "cosine_similarity", "dot", "l2_norm",
    "word_shingles", "minhash_min", "words_of",
]
