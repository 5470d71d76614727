"""Scale parameterisation of the session factory (r12).

The static ``spark.sql.shuffle.partitions`` hint and AQE's
``initialPartitionNum`` must be derivable per deployment via env
(production: input bytes / 100-500 MB per partition) while the LOCAL
defaults stay exactly the harness contract: shuffle partitions = core
count, initialPartitionNum unset so Spark keeps tracking the runtime
``shuffle.partitions`` value (partition-sensitivity tests rely on
that). Pure-derivation tests only — no extra SparkSession builds.
"""
from __future__ import annotations

from google_sheets_etl_spark.session import (
    _env_positive_int,
    derive_shuffle_partitions,
)


def test_default_is_core_count(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", raising=False)
    assert derive_shuffle_partitions(32) == 32
    assert derive_shuffle_partitions(4) == 4


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4096")
    assert derive_shuffle_partitions(32) == 4096


def test_garbage_env_falls_back(monkeypatch):
    # a bad value must fall back to the local default, never crash
    # session construction or pass zero/negative into Spark
    for bad in ("", "0", "-5", "lots", "1e3"):
        monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", bad)
        assert derive_shuffle_partitions(32) == 32


def test_initial_partitions_env_parse(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INITIAL_PARTITIONS", "8192")
    assert _env_positive_int("SPARK_GRAFT_INITIAL_PARTITIONS") == 8192
    monkeypatch.setenv("SPARK_GRAFT_INITIAL_PARTITIONS", "nope")
    assert _env_positive_int("SPARK_GRAFT_INITIAL_PARTITIONS") is None
    monkeypatch.delenv("SPARK_GRAFT_INITIAL_PARTITIONS", raising=False)
    assert _env_positive_int("SPARK_GRAFT_INITIAL_PARTITIONS") is None
