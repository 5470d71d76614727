"""Deduplication operators for large-scale training-data pipelines.

These extend the reference surface (BASELINE.json north star) — the
reference's only dedup-adjacent behavior is the whole-sheet hash
short-circuit (U3, ``src/DatabaseAgentMysql.php:232-236``); here the
same idea is applied *within* the data at document granularity, at
scale:

- **Exact** (:func:`exact_dedup_groups`, :func:`exact_dedup`):
  sha256 content hash → hash-partitioned groupBy. One shuffle on a
  well-distributed key; no skew (hashes are uniform). Keeps the
  lowest id per group (deterministic "first").
- **MinHash + LSH** (:func:`minhash_signatures`,
  :func:`lsh_candidate_pairs`, :func:`near_dup_pairs`): shingle →
  seeded-sha256 minhash → band buckets → self-join *within buckets
  only* → exact Jaccard verify on the candidates. The band join is the
  scale path: candidate generation is O(docs x bands) with a shuffle on
  band-hash (uniform), never the O(n^2) cross join. sf-scale oracle
  cross-checks the same math in DuckDB SQL.
- **SimHash** (:func:`simhash64`): 64-bit near-dup fingerprint from
  per-token hashes; Hamming-distance bucketing. JVM-only bit math.
- **N-gram Jaccard** (:func:`jaccard_pairs_bruteforce`): the exact
  quadratic baseline, for tests and as the verify kernel inside the
  LSH path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import minhash_min, word_shingles, words_of

# ---------------------------------------------------------------- exact


def exact_dedup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content hash: (fp, n_copies, keep_id)."""
    return (
        docs.select(F.sha2(F.col(text_col), 256).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Documents surviving exact dedup (lowest id per content hash).
    Implemented as a semi-join of the winners back to the rows —
    both sides shuffle once on uniform keys; no window-over-everything."""
    winners = exact_dedup_groups(docs, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return docs.join(winners, on=id_col, how="left_semi")


# ------------------------------------------------------------- minhash


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) seeded-sha256 minhash signature columns.
    Narrow (per-row) computation — no shuffle, scales with input splits."""
    words = words_of(F.col(text_col))
    sh = word_shingles(words, shingle_n)
    out = docs.select(F.col(id_col), sh.alias("_sh"))
    for i in range(num_hashes):
        out = out.withColumn(f"mh_{i}", minhash_min(F.col("_sh"), i))
    return out.drop("_sh")


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Candidate (id_a < id_b) pairs sharing at least one LSH band.

    Bands are contiguous groups of ``band_size`` minhashes hashed into a
    bucket key. Docs sharing any band bucket become candidates. The
    self-join is keyed on (band_index, bucket) — uniform, shuffle-
    friendly; identical empty-shingle docs (NULL minhashes) are
    excluded (NULL keys never match, matching SQL join semantics).
    """
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.sha2(
                    F.concat_ws(
                        "|", *[F.col(f"mh_{b * band_size + j}") for j in range(band_size)]
                    ),
                    256,
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = (
        signatures.select(F.col(id_col), F.explode(bands).alias("bb"))
        .select(id_col, "bb.band", "bb.bucket")
        .filter(F.col("bucket").isNotNull())
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard_of(sh_a: Column, sh_b: Column) -> Column:
    """Exact Jaccard over distinct shingle sets (JVM array ops)."""
    inter = F.size(F.array_intersect(sh_a, sh_b)).cast("double")
    union = F.size(F.array_union(sh_a, sh_b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with exact Jaccard verification:
    (id_a, id_b, jaccard) for pairs ≥ threshold. The expensive exact
    Jaccard runs only on LSH candidates."""
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_n)
    cands = lsh_candidate_pairs(sigs, id_col, num_hashes, band_size)
    shingled = docs.select(
        F.col(id_col),
        F.array_distinct(word_shingles(words_of(F.col(text_col)), shingle_n)).alias("sh"),
    )
    return (
        cands.join(shingled.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(shingled.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard_of(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_bruteforce(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact O(n^2) Jaccard pairs — test oracle / small inputs only."""
    shingled = docs.select(
        F.col(id_col),
        F.array_distinct(word_shingles(words_of(F.col(text_col)), shingle_n)).alias("sh"),
    )
    a = shingled.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = shingled.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(jaccard_of(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------- simhash


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document from xxhash64(token) bit votes.

    For each bit position: +1 when set in a token's hash, -1 otherwise;
    the fingerprint bit is 1 when the vote sum is positive. All JVM
    higher-order functions — per-row, narrow, no shuffle.
    """
    words = F.array_distinct(words_of(F.col(text_col)))
    hashes = F.transform(words, lambda w: F.xxhash64(w))

    def bit_vote(bit: int) -> Column:
        # vote_b = sum over tokens of (2*bit_b(h) - 1); bit set iff > 0
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + (F.shiftrightunsigned(h, bit).bitwiseAND(F.lit(1)) * 2 - 1).cast("int"),
        )

    fingerprint = F.aggregate(
        F.array(*[(bit_vote(b) > 0).cast("long") * F.lit(1 << b).cast("long") for b in range(63)]),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return docs.select(F.col(id_col), fingerprint.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
