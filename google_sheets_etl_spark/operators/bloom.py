"""Sparse broadcast Bloom filter, pure JVM (north-star extension; no
reference counterpart — the reference moves whole sheets, this is the
big-side prefilter a 100 TB decontamination / membership pass needs).

The classic scale problem: "does each row of a HUGE table appear in a
SMALL set?" answered as a semi-join shuffles the huge side on the
probe key. The classic fix is a Bloom filter of the small set
broadcast to the scan — Spark has this internally (runtime row-level
filtering) but does not expose the aggregate to the DataFrame API,
and ``df.stat.bloomFilter`` materializes a JVM object on the driver
that executors can't probe without py4j.

This module implements the same idea with nothing but DataFrame ops:

- the filter is a SPARSE WORD TABLE — ``(word_idx, word)`` rows where
  ``word`` is a 64-bit lane of the bitset and only non-zero lanes
  exist. Built with one ``groupBy(word_idx).agg(bit_or(mask))`` over
  the k probe positions of each build-side key (small shuffle on the
  small side).
- probing is k chained **BroadcastHashJoins** on ``word_idx`` with a
  residual ``(word & mask) == mask`` condition: the huge side streams
  through the scan, never shuffles, and each join is 1:1 (word_idx is
  unique in the filter). Rows surviving all k probes are the
  candidates; Bloom guarantees candidates ⊇ true members (no false
  negatives), so an exact verify on the tiny candidate set makes the
  whole pass exact.

Probe hashes are ``xxhash64(key, seed_i)`` — engine-local JVM hashing
is fine because the filter is structurally invisible in any final
result (callers always exact-verify candidates); oracles never need
to reproduce it.

Sizing: ``m_bits / 64`` non-empty lanes max, 8 B + 8 B each → a
``m_bits = 2**27`` filter (~1 % fpp at 10 M keys) is ≤ 2 M rows
≈ 32 MB — comfortably under Spark's broadcast ceiling, and reachable
from there to 100 M keys with ``2**30`` bits at ~256 MB (raise
``spark.sql.autoBroadcastJoinThreshold`` or pre-shuffle instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Largest filter localized to the driver as a LocalRelation:
# 2^27 bits = 2 M 16-byte lanes ≈ 32 MB through Arrow. Bigger filters
# stay distributed (see bloom_build docstring for the trade).
LOCAL_RELATION_MAX_BITS = 1 << 27


def _probe_cols(key, m_bits: int, k: int) -> list[tuple]:
    """(word_idx, mask) expression pairs for the k probe positions of
    ``key``. Bit index = pmod(xxhash64(key, i), m_bits); word index =
    bit div 64; mask = 1L << (bit % 64)."""
    out = []
    for i in range(k):
        bit = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        word_idx = (bit / F.lit(64)).cast("long")
        # the pyspark shiftleft wrapper only takes a literal int shift;
        # call_function reaches the SQL builtin, which takes a column
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (bit % 64).cast("int")
        )
        out.append((word_idx, mask))
    return out


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Aggregate the (small) build side into the sparse word table:
    one row per non-zero 64-bit lane, ``(word_idx long, word long)``.

    One explode (k rows per key) + one groupBy on word_idx — both on
    the SMALL side only. The result is bounded by ``m_bits / 64`` rows
    regardless of key count.

    Up to ``LOCAL_RELATION_MAX_BITS`` the aggregated word table is
    localized to the driver THROUGH ARROW (``toPandas`` →
    ``createDataFrame(pandas)``: columnar batches, no per-row Python
    tuple round-trip) and re-created as a LocalRelation. This is NOT
    a data-scale collect: the bitset is the filter's metadata,
    bounded by the DESIGN constant ``m_bits / 64`` rows (16 K at the
    default, 2 M ≈ 32 MB at the 2^27 ceiling) — the same bytes a
    broadcast would ship anyway. It buys: the k probe joins broadcast
    from local data instead of re-running the build aggregation k
    times (Spark can't reuse the exchange across the per-probe column
    renames), and nothing stays persisted afterwards (a previous
    persist()-based version leaked one cached table per call).

    ABOVE the ceiling (e.g. 2^30 bits ≈ 16 M lanes / 128 MB — a real
    driver-memory hazard as a LocalRelation) the aggregated DataFrame
    is returned distributed but MATERIALIZED (``localCheckpoint``):
    the k probe joins each broadcast it independently, and an
    un-materialized plan would re-execute the build aggregation per
    probe — with a non-deterministic build input the k probes could
    then see k DIFFERENT bitsets, breaking the candidates ⊇ members
    guarantee the exact-verify pattern rests on. Materialized blocks
    pin one bitset for all k probes (executor-local: an executor
    loss fails the query rather than recomputing — the iterative-
    operator trade, see connected_components)."""
    probes = _probe_cols(F.col(key_col), m_bits, k)
    lanes = keys.select(
        F.explode(
            F.array(
                *[F.struct(w.alias("word_idx"), m.alias("mask")) for w, m in probes]
            )
        ).alias("p")
    ).select("p.word_idx", "p.mask")
    agg = lanes.groupBy("word_idx").agg(F.bit_or("mask").alias("word"))
    if m_bits > LOCAL_RELATION_MAX_BITS:
        return agg.localCheckpoint(eager=True)
    return keys.sparkSession.createDataFrame(
        agg.toPandas(), "word_idx long, word long"
    )


def bloom_probe(
    big: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Filter ``big`` to rows whose ``key_col`` is (probably) in the
    filter: k chained broadcast hash joins, each 1:1 on the unique
    ``word_idx``, each with the bitmask residual. The big side never
    shuffles; candidates ⊇ true members (exact-verify downstream).

    Guards the empty-filter edge: an empty build side yields an empty
    word table, and the inner joins then correctly drop every probe
    row (a member of the empty set is impossible).

    Each join renames the lane columns per probe index (Spark's
    self-join analysis rejects reusing one lineage three times); at
    default sizes the word table is a LocalRelation (see
    :func:`bloom_build`), so the k BroadcastExchanges re-ship local
    bytes, never re-run a plan."""
    out = big
    for i, (word_idx, mask) in enumerate(_probe_cols(F.col(key_col), m_bits, k)):
        b = F.broadcast(
            bloom.select(
                F.col("word_idx").alias(f"_bw{i}"), F.col("word").alias(f"_bv{i}")
            )
        )
        out = out.join(
            b,
            (word_idx == F.col(f"_bw{i}"))
            & (F.col(f"_bv{i}").bitwiseAND(mask) == mask),
            "inner",
        ).drop(f"_bw{i}", f"_bv{i}")
    return out


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """EXACT semi-join of ``big`` against ``small`` on column ``on``,
    Bloom-accelerated: broadcast-bloom prefilter (no shuffle of the
    big side) → exact semi-join of the surviving sliver against
    ``small``. Result is identical to ``big.join(small, on,
    "left_semi")`` for any filter parameters — the bloom only changes
    HOW MUCH of the big side reaches the shuffle."""
    keys = small.select(on).distinct()
    bloom = bloom_build(keys, on, m_bits, k)
    candidates = bloom_probe(big, on, bloom, m_bits, k)
    # left_semi is duplicate-insensitive: no second distinct needed
    return candidates.join(small.select(on), on, "left_semi")
