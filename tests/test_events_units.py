"""Data-shape regression matrix for the events ``ts`` column.

Round 2 regenerated ``events.parquet`` from int64-nanos to
``timestamp[us]`` (NTZ) and three queries silently broke.  This matrix
pins every branch of :func:`events_ts_unit` / :func:`t`'s adaptive read:
the SAME logical instants are written in each physical encoding the
sniffer claims to handle, and every encoding must produce identical
query results — batch (``unix_micros`` path + ``date_trunc`` path) and
the Structured Streaming reader alike.
"""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from google_sheets_etl_spark.queries import (
    QUERIES,
    _TS_UNIT_CACHE,
    events_ts_unit,
    t,
)

# canonical micro-second epochs: 2024-01-01T00:00:00Z + offsets spanning
# three hours, three users, the funnel event types
_BASE_US = 1_704_067_200_000_000
_ROWS = [
    # (event_id, us_offset, user_id, event_type)
    (1, 0, 1, "view"),
    (2, 5_000_000, 1, "click"),
    (3, 12_000_000, 1, "purchase"),
    (4, 3_600_000_000, 2, "view"),
    (5, 3_605_000_000, 2, "click"),
    (6, 7_200_000_000, 3, "view"),
    (7, 7_200_000_001, 3, "error"),
    # a gap > 30 min to split user 1 into two sessions
    (8, 9_000_000_000, 1, "view"),
    # +16 µs: a residue where double division of the ns epoch rounds
    # DOWN (int(float(us*1000)/1000) == us-1) — pins the integer-`div`
    # conversion; double-based ns→µs silently loses 1 µs here
    (9, 16, 1, "view"),
]
_US = [_BASE_US + off for (_, off, _, _) in _ROWS]


def _table(ts_array: pa.Array) -> pa.Table:
    return pa.table({
        "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
        "ts": ts_array,
        "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
        "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
        "value": pa.array([float(r[0]) for r in _ROWS], pa.float64()),
        "props": pa.array(['{"k":1}'] * len(_ROWS), pa.string()),
    })


# name -> (arrow ts array builder, expected events_ts_unit verdict)
VARIANTS = {
    "us_ntz": (lambda: pa.array(_US, pa.timestamp("us")), "us"),
    "us_utc": (lambda: pa.array(_US, pa.timestamp("us", tz="UTC")), "us"),
    "ms_ntz": (
        lambda: pa.array([u // 1000 for u in _US], pa.timestamp("ms")),
        "ms",
    ),
    "ns_annotated": (
        lambda: pa.array([u * 1000 for u in _US], pa.timestamp("ns")),
        "ns",
    ),
    "i64_ns": (lambda: pa.array([u * 1000 for u in _US], pa.int64()), "i64:ns"),
    "i64_us": (lambda: pa.array(_US, pa.int64()), "i64:us"),
    "i64_ms": (
        lambda: pa.array([u // 1000 for u in _US], pa.int64()),
        "i64:ms",
    ),
    "i64_s": (
        lambda: pa.array([u // 1_000_000 for u in _US], pa.int64()),
        "i64:s",
    ),
}

# every events-only query shape that must survive a re-encoding:
# unix_micros call sites, date_trunc aggregation, and the streaming path
_QUERIES_UNDER_TEST = [
    "events_sessionize",
    "funnel_view_click_purchase",
    "events_hourly",
    "streaming_hourly_counts",
]


@pytest.fixture(scope="module")
def variant_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("events_units")
    dirs = {}
    for name, (build, _) in VARIANTS.items():
        d = root / name
        d.mkdir()
        pq.write_table(_table(build()), d / "events.parquet", version="2.6")
        dirs[name] = str(d)
    return dirs


@pytest.mark.parametrize("variant", list(VARIANTS))
def test_unit_sniff_classifies_each_encoding(variant, variant_dirs):
    expected = VARIANTS[variant][1]
    assert events_ts_unit(f"{variant_dirs[variant]}/events.parquet") == expected


@pytest.mark.parametrize("variant", list(VARIANTS))
def test_t_always_yields_tz_timestamp(spark, variant, variant_dirs):
    df = t(spark, variant_dirs[variant], "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(
        (r.event_id, r.us) for r in
        df.selectExpr("event_id", "unix_micros(ts) AS us").collect()
    )
    # coarser encodings floor sub-unit offsets at write time
    scale = {"i64_s": 1_000_000, "i64_ms": 1000, "ms_ntz": 1000}.get(variant, 1)
    want = sorted(
        (r[0], (u // scale) * scale) for r, u in zip(_ROWS, _US)
    )
    assert got == want


@pytest.mark.parametrize("qname", _QUERIES_UNDER_TEST)
def test_query_results_identical_across_encodings(spark, qname, variant_dirs):
    """The same instants in any physical encoding → byte-identical rows."""
    fn = QUERIES[qname]

    def rows(sf_dir):
        df = fn(spark, sf_dir)
        return sorted(tuple(str(v) for v in r) for r in df.collect())

    reference = rows(variant_dirs["us_ntz"])
    assert reference, f"{qname} returned no rows on the fixture"
    # i64_s truncates sub-second offsets — sessionization/funnel deltas
    # change, so second-precision variants only assert non-crash + shape
    for variant in VARIANTS:
        got = rows(variant_dirs[variant])
        if variant == "i64_s":
            assert len(got) > 0
        else:
            assert got == reference, f"{qname} diverged under {variant}"


def test_resniff_after_regeneration(tmp_path):
    """Cache is (path, mtime)-keyed: rewriting the file with a different
    unit must re-classify, not serve the stale verdict."""
    d = tmp_path / "regen"
    d.mkdir()
    path = str(d / "events.parquet")
    pq.write_table(_table(pa.array(_US, pa.timestamp("us"))), path)
    assert events_ts_unit(path) == "us"
    # regenerate as raw int64 nanos with a strictly newer mtime
    os.remove(path)
    pq.write_table(
        _table(pa.array([u * 1000 for u in _US], pa.int64())), path
    )
    os.utime(path, (time.time() + 5, time.time() + 5))
    assert events_ts_unit(path) == "i64:ns"


def test_directory_of_parts_layout_batch_and_streaming(spark, tmp_path):
    """events.parquet as a DIRECTORY of part files: the batch read,
    the unit sniff, and — regression — the STREAMING read must all see
    the data (pathGlobFilter matches leaf names, so naively filtering
    on 'events.parquet' lists zero part files)."""
    d = tmp_path / "dirvar"
    inner = d / "events.parquet"
    inner.mkdir(parents=True)
    pq.write_table(
        _table(pa.array(_US, pa.timestamp("us"))),
        inner / "part-00000.parquet",
    )
    assert events_ts_unit(str(inner)) == "us"
    df = t(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() == len(_ROWS)
    batch = sorted(
        tuple(str(v) for v in r)
        for r in df.selectExpr(
            "date_trunc('hour', ts) AS window_start", "event_type"
        ).groupBy("window_start", "event_type").count().collect()
    )
    stream = sorted(
        tuple(str(v) for v in r)
        for r in QUERIES["streaming_hourly_counts"](spark, str(d)).collect()
    )
    assert batch and stream == batch


def test_resniff_after_inplace_part_rewrite(spark, tmp_path):
    """Rewriting a PART file in place (directory mtime unchanged) must
    still invalidate the unit cache — the key includes the newest
    entry mtime, not just the directory's."""
    d = tmp_path / "inplace"
    inner = d / "events.parquet"
    inner.mkdir(parents=True)
    part = inner / "part-00000.parquet"
    pq.write_table(_table(pa.array(_US, pa.timestamp("us"))), part)
    assert events_ts_unit(str(inner)) == "us"
    dir_mtime = os.path.getmtime(inner)
    pq.write_table(
        _table(pa.array([u * 1000 for u in _US], pa.int64())), part
    )
    os.utime(part, (time.time() + 5, time.time() + 5))
    os.utime(inner, (dir_mtime, dir_mtime))  # pin the dir mtime
    assert events_ts_unit(str(inner)) == "i64:ns"


def test_fallback_not_cached(tmp_path):
    """An unreadable footer warns and returns ns WITHOUT caching, so a
    later valid file at the same path gets a real verdict."""
    d = tmp_path / "fb"
    d.mkdir()
    path = str(d / "events.parquet")
    with open(path, "wb") as f:
        f.write(b"not a parquet file")
    with pytest.warns(UserWarning, match="footer sniff failed"):
        assert events_ts_unit(path) == "ns"
    assert all(p != path for (p, _) in _TS_UNIT_CACHE)
    os.remove(path)
    pq.write_table(_table(pa.array(_US, pa.timestamp("us"))), path)
    os.utime(path, (time.time() + 5, time.time() + 5))
    assert events_ts_unit(path) == "us"


def test_ns_fallback_verified_against_engine(spark, tmp_path, monkeypatch):
    """When the footer sniff blindly falls back to 'ns' (pyarrow gone,
    stats missing), the resolver must verify against Spark's own
    reader instead of reading a microsecond file as nanos (which lands
    every timestamp in 1970)."""
    from google_sheets_etl_spark import queries as q

    d = tmp_path / "fbv"
    d.mkdir()
    path = str(d / "events.parquet")
    pq.write_table(_table(pa.array(_US, pa.timestamp("us"))), path)
    # patch the DEFINING module (queries._core): since the round-9
    # package split, _resolve_events_unit resolves events_ts_unit in
    # its own module globals, not through the package re-export
    monkeypatch.setattr(q._core, "events_ts_unit", lambda p: "ns")
    assert q._resolve_events_unit(spark, path) == "us"
    df = q.t(spark, str(d), "events")
    got = sorted(
        r.us for r in df.selectExpr("unix_micros(ts) AS us").collect()
    )
    assert got == sorted(_US)
    # raw int64 µs with a forced-'ns' sniff: magnitude check fixes it
    path2_dir = tmp_path / "fbv2"
    path2_dir.mkdir()
    pq.write_table(
        _table(pa.array(_US, pa.int64())), path2_dir / "events.parquet"
    )
    assert q._resolve_events_unit(
        spark, str(path2_dir / "events.parquet")
    ) == "i64:us"
