"""Sparse broadcast Bloom filter (operators/bloom.py): exactness of
the semi-join wrapper (filter must be invisible in results), no-false-
negative property, empty-set edge, and the plan shape the 100 TB
design relies on (big side reaches the probes without an Exchange)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from google_sheets_etl_spark.operators import bloom


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def big(spark):
    return spark.range(0, 2000).select(
        F.concat(F.lit("k"), (F.col("id") % 700).cast("string")).alias("g"),
        F.col("id").alias("payload"),
    )


@pytest.fixture(scope="module")
def small(spark):
    # overlaps k0..k99 of big's key domain, plus keys big never has
    return spark.range(0, 150).select(
        F.concat(F.lit("k"), (F.col("id") * 7 % 120).cast("string")).alias("g")
    )


def test_bloom_semi_join_equals_exact(spark, big, small):
    got = bloom.bloom_semi_join(big, small, "g", m_bits=1 << 14, k=3)
    want = big.join(small.select("g").distinct(), "g", "left_semi")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bloom_semi_join_equals_exact_tiny_filter(spark, big, small):
    # heavy-fp regime: 256 bits for ~120 keys — correctness must hold
    # because the exact verify trims every false positive
    got = bloom.bloom_semi_join(big, small, "g", m_bits=256, k=2)
    want = big.join(small.select("g").distinct(), "g", "left_semi")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bloom_probe_superset_of_members(spark, big, small):
    """No false negatives: every true member row survives the probe."""
    filt = bloom.bloom_build(small.select("g").distinct(), "g", m_bits=1 << 14, k=3)
    probed = bloom.bloom_probe(big, "g", filt, m_bits=1 << 14, k=3)
    members = big.join(small.select("g").distinct(), "g", "left_semi")
    missing = members.join(probed.select("g").distinct(), "g", "left_anti")
    assert missing.count() == 0


def test_empty_build_side_drops_everything(spark, big):
    empty = spark.createDataFrame([], "g string")
    filt = bloom.bloom_build(empty, "g")
    assert bloom.bloom_probe(big, "g", filt).count() == 0


def test_probe_plan_broadcasts_and_never_shuffles_big_side(spark, small):
    # distinct key name on the big side so the assertion can tell big-
    # side exchanges (must not exist) from build-side ones (expected)
    bigb = spark.range(0, 2000).select(
        F.concat(F.lit("k"), (F.col("id") % 700).cast("string")).alias("gbig")
    )
    filt = bloom.bloom_build(small.select("g").distinct(), "g", m_bits=1 << 14, k=3)
    plan = explain_str(bloom.bloom_probe(bigb, "gbig", filt, m_bits=1 << 14, k=3))
    # formatted explain lists each node once in the detail section
    n_bhj = sum(
        1
        for line in plan.splitlines()
        if line.startswith("(") and "BroadcastHashJoin" in line
    )
    assert n_bhj == 3
    # the big side streams scan -> 3 chained probe joins; no exchange
    # is ever keyed on its probe column
    assert "hashpartitioning(gbig" not in plan


def test_word_table_is_sparse_and_bounded(spark, small):
    m_bits = 1 << 10
    filt = bloom.bloom_build(small.select("g").distinct(), "g", m_bits=m_bits, k=3)
    n = filt.count()
    assert 0 < n <= m_bits // 64
    # word_idx unique: probe joins must stay 1:1
    assert filt.select("word_idx").distinct().count() == n


def test_bloom_distributed_path_above_local_relation_ceiling(spark):
    """Review fix regression: past LOCAL_RELATION_MAX_BITS the word
    table stays distributed but MATERIALIZED — semi-join results must
    be identical to the LocalRelation path (the sparse lane table is
    tiny for a small key set regardless of m_bits)."""
    from google_sheets_etl_spark.operators import bloom as B

    big = spark.range(0, 2000).selectExpr("id AS k")
    small = spark.createDataFrame(
        [(i * 37 % 2000,) for i in range(50)], "k long"
    )
    want = sorted(
        r["k"] for r in big.join(small, "k", "left_semi").collect()
    )
    got = sorted(
        r["k"]
        for r in B.bloom_semi_join(
            big, small, "k", m_bits=B.LOCAL_RELATION_MAX_BITS * 2, k=3
        ).collect()
    )
    assert got == want
