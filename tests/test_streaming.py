"""Structured Streaming tests via availableNow over file sources."""

from __future__ import annotations

import datetime as dt

import pytest

from google_sheets_etl_spark.streaming import events_stream as es

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_events(spark, path):
    rows = [
        # user 1: two sessions (gap of 2h between e2 and e3)
        (1, BASE, 1, "click"),
        (2, BASE + dt.timedelta(minutes=10), 1, "view"),
        (3, BASE + dt.timedelta(hours=2, minutes=30), 1, "click"),
        # user 2: one session
        (4, BASE + dt.timedelta(minutes=5), 2, "click"),
        (5, BASE + dt.timedelta(minutes=20), 2, "error"),
    ]
    df = spark.createDataFrame(rows, es.EVENTS_STREAM_SCHEMA)
    df.write.mode("overwrite").parquet(path)


def test_windowed_counts_available_now(spark, tmp_path):
    src = str(tmp_path / "events_in")
    out = str(tmp_path / "agg_out")
    ckpt = str(tmp_path / "ckpt1")
    _mk_events(spark, src)

    stream = es.windowed_counts(
        es.read_event_stream(spark, src), watermark="30 minutes"
    )
    es.run_available_now(stream, out, ckpt)

    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    # hour-0 window is below the final watermark (02:30 - 30min) → emitted
    assert got[(BASE, "click")] == 2          # u1 + u2 in hour 0
    assert got[(BASE, "view")] == 1
    # hour-2 window is NOT yet finalized (window end 03:00 > watermark
    # 02:00) → append mode holds it back: late-data semantics visible
    assert (BASE + dt.timedelta(hours=2), "click") not in got


def test_dedup_stream_drops_duplicates_within_watermark(spark, tmp_path):
    src = str(tmp_path / "events_dup_in")
    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "ckpt_dedup")
    rows = [
        (1, BASE, 1, "click"),
        (1, BASE + dt.timedelta(minutes=1), 1, "click"),   # dup key, in horizon
        (2, BASE + dt.timedelta(minutes=5), 2, "view"),
        (2, BASE + dt.timedelta(minutes=6), 2, "view"),    # dup key, in horizon
        (3, BASE + dt.timedelta(minutes=7), 1, "error"),
    ]
    spark.createDataFrame(rows, es.EVENTS_STREAM_SCHEMA).write.mode(
        "overwrite"
    ).parquet(src)

    stream = es.dedup_stream(es.read_event_stream(spark, src))
    es.run_available_now(stream, out, ckpt)

    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]

    # a replay of key 1 in a later micro-batch, still inside the
    # horizon, is also dropped (state carried across batches)
    spark.createDataFrame(
        [(1, BASE + dt.timedelta(minutes=8), 1, "click")],
        es.EVENTS_STREAM_SCHEMA,
    ).write.mode("append").parquet(src)
    es.run_available_now(stream, out, ckpt)
    got2 = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got2 == [1, 2, 3]


def test_sessionize_sorts_across_arrow_chunks(spark, tmp_path):
    """A group's batch rows arrive as MULTIPLE Arrow chunks; the gap
    scan must sort the WHOLE batch, not each chunk independently —
    chunk-local sorting with carried state silently loses sessions
    when file order isn't time-sorted (found in review, pinned here
    by forcing 2-row chunks over a deliberately time-shuffled file)."""
    import datetime as _dt

    src = str(tmp_path / "events_chunked")
    out_name = "sess_chunked"
    # one user, 9 events in 3 sessions (gaps of 2h), written in
    # SHUFFLED time order so chunk-local sorting breaks monotonicity
    times = [BASE + _dt.timedelta(hours=2 * s, minutes=m)
             for s in range(3) for m in (0, 5, 10)]
    shuffled = [times[i] for i in (4, 0, 7, 2, 8, 1, 5, 3, 6)]
    rows = [(i, ts, 1, "view") for i, ts in enumerate(shuffled)]
    spark.createDataFrame(rows, es.EVENTS_STREAM_SCHEMA).coalesce(1).write.parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
        q = (
            es.sessionize_stream(es.read_event_stream(spark, src), gap_s=1800)
            .writeStream.outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_chunked"))
            .format("memory").queryName(out_name)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = {r["user_id"]: r["n_sessions"]
           for r in spark.table(out_name).groupBy("user_id")
           .agg({"n_sessions": "max"})
           .withColumnRenamed("max(n_sessions)", "n_sessions").collect()}
    assert got == {1: 3}


def test_sessionize_stream_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "events_in2")
    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "ckpt2")
    _mk_events(spark, src)

    # foreachBatch parquet sink: checkpoint-recoverable (memory sink is
    # not), so the second run resumes per-user state
    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    def run_once():
        q = (
            es.sessionize_stream(es.read_event_stream(spark, src), gap_s=1800)
            .writeStream.outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .start()
        )
        q.awaitTermination()

    run_once()
    latest = {
        r["user_id"]: r["n_sessions"]
        for r in spark.read.parquet(out)
        .groupBy("user_id").agg({"n_sessions": "max"})
        .withColumnRenamed("max(n_sessions)", "n_sessions").collect()
    }
    assert latest == {1: 2, 2: 1}

    # second drop 6h later: user 1 gains a session; state carried over
    rows2 = [(6, BASE + dt.timedelta(hours=6), 1, "click")]
    spark.createDataFrame(rows2, es.EVENTS_STREAM_SCHEMA).write.mode("append").parquet(src)
    run_once()
    latest2 = {
        r["user_id"]: r["n_sessions"]
        for r in spark.read.parquet(out)
        .groupBy("user_id").agg({"n_sessions": "max"})
        .withColumnRenamed("max(n_sessions)", "n_sessions").collect()
    }
    assert latest2[1] == 3


def test_upsert_stream_latest_wins_and_partition_scoped(spark, tmp_path):
    from pyspark.sql import functions as F

    from google_sheets_etl_spark.streaming import upsert_sink as us

    src = str(tmp_path / "upsert_in")
    tbl = str(tmp_path / "upsert_tbl")
    schema = "key long, day string, seq long, payload string"

    # batch 1: keys 1-3 across two day-partitions
    spark.createDataFrame(
        [(1, "d1", 10, "a"), (2, "d1", 10, "b"), (3, "d2", 10, "c")], schema
    ).write.mode("overwrite").parquet(src)
    q = us.upsert_stream(
        spark.readStream.schema(schema).parquet(src), tbl,
        str(tmp_path / "ck1"), ["key"], "day", "seq",
    )
    q.awaitTermination()

    # batch 2: replace key 2 (newer seq), stale update for key 1
    # (older seq within ONE batch vs a fresh one — latest wins), new
    # key 4 on d2; d1 partition rewritten, d2 rewritten, no loss
    spark.createDataFrame(
        [(2, "d1", 20, "b2"), (1, "d1", 5, "stale"), (1, "d1", 30, "a2"),
         (4, "d2", 20, "d")], schema
    ).write.mode("append").parquet(src)
    q = us.upsert_stream(
        spark.readStream.schema(schema).parquet(src), tbl,
        str(tmp_path / "ck1"), ["key"], "day", "seq",
    )
    q.awaitTermination()

    got = {r["key"]: (r["payload"], r["seq"])
           for r in spark.read.parquet(tbl).collect()}
    assert got == {1: ("a2", 30), 2: ("b2", 20), 3: ("c", 10), 4: ("d", 20)}


def test_upsert_batch_idempotent_redelivery(spark, tmp_path):
    from google_sheets_etl_spark.streaming.upsert_sink import upsert_batch

    tbl = str(tmp_path / "idem_tbl")
    schema = "key long, day string, seq long, payload string"
    b = spark.createDataFrame([(1, "d1", 10, "x"), (2, "d2", 10, "y")], schema)
    upsert_batch(spark, b, tbl, ["key"], "day", "seq")
    before = sorted(map(tuple, spark.read.parquet(tbl).collect()))
    upsert_batch(spark, b, tbl, ["key"], "day", "seq")  # re-delivery
    after = sorted(map(tuple, spark.read.parquet(tbl).collect()))
    assert before == after


def test_rocksdb_state_store_parity(spark, tmp_path):
    """The 100 TB state backend: the same watermarked window + the
    same stateful sessionization produce IDENTICAL results under the
    RocksDB state store provider as under the default heap-backed
    one — certifying the engine surface the real deployment flips on
    (bounded executor memory, disk-spilled keyed state)."""
    src = str(tmp_path / "rocks_in")
    _mk_events(spark, src)

    def run(provider_tag: str):
        out = str(tmp_path / f"out_{provider_tag}")
        ckpt = str(tmp_path / f"ck_{provider_tag}")
        stream = es.windowed_counts(
            es.read_event_stream(spark, src), watermark="30 minutes"
        )
        es.run_available_now(stream, out, ckpt)
        return sorted(
            (str(r["window_start"]), r["event_type"], r["n"])
            for r in spark.read.parquet(out).collect()
        )

    baseline = run("heap")
    prev = es.use_rocksdb_state(spark)
    try:
        assert spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        ) == es.ROCKSDB_PROVIDER
        rocks = run("rocksdb")
    finally:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", prev
        )
    assert rocks == baseline and baseline  # identical, non-empty


def test_sessionize_ignores_null_timestamps(spark, tmp_path):
    """Review fix (round 4): a NULL ts casts to INT64_MIN as NaT and
    phantom-incremented the per-user session count; null rows must be
    dropped before the gap scan."""
    import datetime as dt

    src = str(tmp_path / "null_ts_in")
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 7, "click"),
        (2, None, 7, "click"),                      # NULL ts
        (3, base + dt.timedelta(minutes=5), 7, "click"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).write.parquet(src)
    sink_out = str(tmp_path / "null_ts_out")
    ckpt = str(tmp_path / "null_ts_ck")

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink_out)

    q = (
        es.sessionize_stream(es.read_event_stream(spark, src), gap_s=1800)
        .writeStream.outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination()
    got = {r["user_id"]: r["n_sessions"]
           for r in spark.read.parquet(sink_out).collect()}
    # two real events 5 min apart -> exactly ONE session
    assert got[7] == 1


def test_upsert_batch_schema_evolution_both_directions(spark, tmp_path):
    """Review fix (round 4): a batch missing a table column must not
    DROP that column for kept rows; a batch with a NEW column must
    widen the table instead of crashing."""
    from google_sheets_etl_spark.streaming.upsert_sink import upsert_batch

    tbl = str(tmp_path / "evolve_tbl")
    b1 = spark.createDataFrame(
        [(1, "p0", 1, "keepme"), (2, "p0", 1, "other")],
        "k long, part string, seq long, legacy string",
    )
    upsert_batch(spark, b1, tbl, ["k"], "part", "seq")
    # batch 2: no 'legacy' column, new 'extra' column, updates k=2 only
    b2 = spark.createDataFrame(
        [(2, "p0", 2, "fresh")], "k long, part string, seq long, extra string"
    )
    upsert_batch(spark, b2, tbl, ["k"], "part", "seq")
    rows = {r["k"]: r.asDict() for r in spark.read.option(
        "mergeSchema", "true").parquet(tbl).collect()}
    assert rows[1]["legacy"] == "keepme"       # kept row keeps its column
    assert rows[2]["extra"] == "fresh"         # new column landed
    assert rows[2].get("legacy") is None       # evolved, null-padded


def test_stream_etl_end_to_end_with_cursor(spark, tmp_path):
    """The full reference pipeline as a stream: discovery feed →
    accounting upsert → change-filtered loads per micro-batch. A
    second drain after a sheet edit reloads ONLY the edited sheet
    (hash short-circuit spares the untouched one), with the cursor
    carried by the streaming checkpoint."""
    import json as _json

    from google_sheets_etl_spark.config import EtlJob
    from google_sheets_etl_spark.etl import SheetsEtlEngine
    from google_sheets_etl_spark.sources import (
        FixtureSheetSource, SpreadsheetMeta,
    )
    from google_sheets_etl_spark.streaming.etl_stream import stream_etl

    ssa, ssb = "SSA" + "a" * 41, "SSB" + "b" * 41
    src = FixtureSheetSource()
    src.put_sheet(
        SpreadsheetMeta(ssa, "2026-01-02T00:00:00.000Z", "A"),
        "Tab1", [["Name", "Amount"], ["alice", "1"], ["bob", "2"]],
    )
    src.put_sheet(
        SpreadsheetMeta(ssb, "2026-01-03T00:00:00.000Z", "B"),
        "Tab2", [["Id"], ["x"]],
    )
    engine = SheetsEtlEngine(spark, str(tmp_path / "wh_stream"), src)
    engine.set_up_accounting()
    jobs = [
        EtlJob(ssa, "Tab1", "stream_a", {"name": "Name", "amount": "Amount"}),
        EtlJob(ssb, "Tab2", "stream_b", {"id": "Id"}),
    ]
    disc = str(tmp_path / "disc_feed.json")
    ckpt = str(tmp_path / "etl_stream_ck")
    with open(disc, "w") as f:
        _json.dump([
            {"id": ssa, "modifiedTime": "2026-01-02T00:00:00.000Z"},
            {"id": ssb, "modifiedTime": "2026-01-03T00:00:00.000Z"},
        ], f)

    stream_etl(engine, disc, ckpt, jobs).awaitTermination()
    a1 = {r["name"]: r["amount"]
          for r in engine.target("stream_a").read().collect()}
    assert a1 == {"alice": "1", "bob": "2"}
    assert engine.target("stream_b").read().count() == 1

    # edit sheet A, advance ONLY its discovery mtime
    src.put_sheet(
        SpreadsheetMeta(ssa, "2026-01-04T00:00:00.000Z", "A"),
        "Tab1", [["Name", "Amount"], ["alice", "9"]],
    )
    with open(disc, "w") as f:
        _json.dump([
            {"id": ssa, "modifiedTime": "2026-01-04T00:00:00.000Z"},
            {"id": ssb, "modifiedTime": "2026-01-03T00:00:00.000Z"},
        ], f)
    stream_etl(engine, disc, ckpt, jobs).awaitTermination()
    a2 = {r["name"]: r["amount"]
          for r in engine.target("stream_a").read().collect()}
    assert a2 == {"alice": "9"}          # reloaded, old partition replaced
    assert engine.target("stream_b").read().count() == 1  # untouched


def test_stream_etl_failed_load_fails_batch_then_retries(spark, tmp_path):
    """Round-5 advisory fix: a failed per-sheet load must FAIL the
    micro-batch (continue_on_error=False) so the checkpoint does not
    commit past the update — the stream only re-emits a file when its
    modifiedTime changes, so a swallowed one-off failure would lose
    the load until the sheet's next edit. After the source heals, a
    re-drain retries the SAME offset and the load lands."""
    import json as _json

    import pytest

    from google_sheets_etl_spark.config import EtlJob
    from google_sheets_etl_spark.etl import SheetsEtlEngine
    from google_sheets_etl_spark.sources import (
        FixtureSheetSource, SpreadsheetMeta,
    )
    from google_sheets_etl_spark.streaming.etl_stream import stream_etl

    ssa = "SSF" + "f" * 41
    src = FixtureSheetSource()
    src.put_sheet(
        SpreadsheetMeta(ssa, "2026-02-01T00:00:00.000Z", "A"),
        "Tab1", [["Name"], ["alice"]],
    )
    engine = SheetsEtlEngine(spark, str(tmp_path / "wh_flaky"), src)
    engine.set_up_accounting()
    jobs = [EtlJob(ssa, "Tab1", "flaky_tgt", {"name": "Name"})]
    disc = str(tmp_path / "disc_flaky.json")
    ckpt = str(tmp_path / "flaky_ck")
    with open(disc, "w") as f:
        _json.dump([{"id": ssa,
                     "modifiedTime": "2026-02-01T00:00:00.000Z"}], f)

    orig_get = src.get_sheet
    calls = {"n": 0}

    def flaky_get(spreadsheet_id, sheet_name):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient fetch failure")
        return orig_get(spreadsheet_id, sheet_name)

    src.get_sheet = flaky_get
    with pytest.raises(Exception, match="transient fetch failure"):
        stream_etl(engine, disc, ckpt, jobs).awaitTermination()

    # the checkpoint must NOT have committed past the update: the next
    # drain replays the same offset and the (now healthy) load lands
    stream_etl(engine, disc, ckpt, jobs).awaitTermination()
    assert calls["n"] >= 2
    got = [r["name"] for r in engine.target("flaky_tgt").read().collect()]
    assert got == ["alice"]


def test_admission_stream_dedups_across_micro_batches(spark, tmp_path):
    """Continuous semantic admission: the admitted corpus is the
    accumulating state — a vector admitted in drain 1 rejects its
    near-duplicate in drain 2; novel vectors keep admitting."""
    import json as _json
    import math

    from google_sheets_etl_spark.streaming.admission_stream import (
        admit_stream,
    )

    def unit(deg, axis=0):
        r = math.radians(deg)
        v = [0.0] * 4
        v[axis] = math.cos(r)
        v[axis + 1] = math.sin(r)
        return v

    cents = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (200, [0.0, 0.0, 1.0, 0.0])],
        "cent_id long, cv array<double>",
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    corpus = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "adm_ck")

    def drain(rows, name):
        with open(feed / name, "w") as f:
            for vid, vec in rows:
                f.write(_json.dumps({"vec_id": vid, "embedding": vec}) + "\n")
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .json(str(feed))
        )
        admit_stream(stream, corpus, cents, ckpt, threshold=0.7
                     ).awaitTermination()

    # drain 1: novel (1), internal dup of 1 (2), novel other cell (3)
    drain([(1, unit(0)), (2, unit(5)), (3, unit(0, axis=2))], "b1.json")
    got1 = {r["vec_id"] for r in spark.read.parquet(corpus).collect()}
    assert got1 == {1, 3}

    # drain 2: near-dup of ADMITTED 1 (10), novel (11)
    drain([(10, unit(8)), (11, unit(80))], "b2.json")
    rows = spark.read.parquet(corpus).collect()
    got2 = {r["vec_id"]: r["cell"] for r in rows}
    assert set(got2) == {1, 3, 11}
    assert got2[11] == 100  # 80deg still nearest axis-0 centroid


def test_admission_stream_corpus_read_failure_fails_batch(spark, tmp_path):
    """A corpus that EXISTS but cannot be read (corrupt footer, store
    error) must FAIL the micro-batch so the checkpoint retries it —
    the pre-r6 bare `except` treated any read failure as 'first
    trigger, empty corpus' and silently admitted the whole batch
    without cross-corpus dedup, permanently polluting the corpus."""
    import json as _json

    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from google_sheets_etl_spark.streaming.admission_stream import (
        admit_stream,
        _corpus_exists,
    )

    cents = spark.createDataFrame(
        [(100, [1.0, 0.0])], "cent_id long, cv array<double>"
    )
    feed = tmp_path / "feed_fail"
    feed.mkdir()
    corpus = tmp_path / "admitted_fail"
    # corpus path EXISTS but holds garbage — not a readable parquet table
    corpus.mkdir()
    (corpus / "part-00000.parquet").write_bytes(b"NOT A PARQUET FILE")
    assert _corpus_exists(spark, str(corpus))

    with open(feed / "b1.json", "w") as f:
        f.write(_json.dumps({"vec_id": 1, "embedding": [1.0, 0.0]}) + "\n")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .json(str(feed))
    )
    q = admit_stream(
        stream, str(corpus), cents, str(tmp_path / "fail_ck"), threshold=0.7
    )
    with _pytest.raises(StreamingQueryException):
        q.awaitTermination()
    # nothing was admitted — the batch failed instead of polluting state
    files = [p for p in corpus.iterdir() if p.suffix == ".parquet"]
    assert len(files) == 1  # only the planted garbage file


def test_corpus_exists_probe(spark, tmp_path):
    from google_sheets_etl_spark.streaming.admission_stream import (
        _corpus_exists,
    )

    missing = tmp_path / "nope"
    assert not _corpus_exists(spark, str(missing))
    # a dir with only uncommitted state (_temporary from a crashed
    # FIRST append) must read as "no corpus yet", not livelock the
    # retry on a footerless parquet read
    crashed = tmp_path / "crashed_first_append"
    (crashed / "_temporary" / "0").mkdir(parents=True)
    assert not _corpus_exists(spark, str(crashed))
    present = tmp_path / "yep"
    present.mkdir()
    (present / "part-00000.parquet").write_bytes(b"x")
    assert _corpus_exists(spark, str(present))


def test_quality_gate_stream_scores_and_dedups(spark, tmp_path):
    """Composed ingest gate (streaming/quality_gate_stream.py): a
    fluent document admits with its score; in-distribution text
    re-delivered in a LATER drain rejects by content hash; OOV
    gibberish rejects on the bits threshold; a sub-2-token doc
    rejects for lack of bigram evidence; batch-internal dup keeps the
    lowest id."""
    import json as _json
    import math

    from google_sheets_etl_spark.operators.text import bigram_lm_fit
    from google_sheets_etl_spark.streaming.quality_gate_stream import (
        quality_gate_stream,
    )

    train = spark.createDataFrame(
        [("the cat sat on the mat",), ("the cat ate the fish",)],
        "text string",
    )
    model = bigram_lm_fit(train)
    # OOV gibberish floor = log2(V) bits; fluent text scores below it
    v = 7
    max_bits = math.log2(v) - 0.2

    feed = tmp_path / "qfeed"
    feed.mkdir()
    corpus = str(tmp_path / "qcorpus")
    ckpt = str(tmp_path / "qck")

    def drain(rows, name):
        with open(feed / name, "w") as f:
            for did, text in rows:
                f.write(_json.dumps({"doc_id": did, "text": text}) + "\n")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .json(str(feed))
        )
        quality_gate_stream(
            stream, corpus, model, ckpt, max_bits=max_bits
        ).awaitTermination()

    drain(
        [
            (1, "the cat sat on the mat"),   # fluent -> admit
            (2, "zx qy zx qy zx"),           # OOV -> reject (= log2 V)
            (3, "solo"),                     # no bigram -> reject
            (5, "the cat ate the fish"),     # fluent -> admit
            (4, "the cat ate the fish"),     # batch dup -> lowest id wins
        ],
        "q1.json",
    )
    got1 = {r["doc_id"]: r["bits_per_bigram"]
            for r in spark.read.parquet(corpus).collect()}
    assert set(got1) == {1, 4}
    assert all(b <= max_bits for b in got1.values())

    # drain 2: re-delivery of admitted content (new id) rejects by
    # hash; novel fluent text admits
    drain(
        [(10, "the cat sat on the mat"), (11, "the cat sat on the fish")],
        "q2.json",
    )
    got2 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert got2 == {1, 4, 11}


def test_sketch_stream_maintains_standing_sketch(spark, tmp_path):
    """Streaming CMS maintenance: drains accumulate into the standing
    sketch exactly (cell-wise sums match a batch-built sketch over
    everything seen); a re-drain with no new data changes nothing
    (batch-keyed overwrite + checkpoint = idempotent)."""
    import json as _json

    from google_sheets_etl_spark.operators import cms
    from google_sheets_etl_spark.streaming.sketch_stream import (
        read_sketch, sketch_stream,
    )

    feed = tmp_path / "skfeed"
    feed.mkdir()
    path = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "skck")

    def drain(items, name):
        with open(feed / name, "w") as f:
            for it in items:
                f.write(_json.dumps({"item": it}) + "\n")
        stream = spark.readStream.schema("item string").json(str(feed))
        sketch_stream(
            stream, path, ckpt, depth=2, width=4
        ).awaitTermination()

    drain(["a", "b", "a"], "s1.json")
    drain(["c", "a"], "s2.json")
    got = {(r["r"], r["b"]): r["cnt"]
           for r in read_sketch(spark, path).collect()}
    full = cms.cms_build(
        spark.createDataFrame([("a",), ("b",), ("a",), ("c",), ("a",)],
                              "item string"),
        depth=2, width=4,
    )
    want = {(r["r"], r["b"]): r["cnt"] for r in full.collect()}
    assert got == want

    # no new files: a re-drain must not change the standing sketch
    stream = spark.readStream.schema("item string").json(str(feed))
    sketch_stream(stream, path, ckpt, depth=2, width=4).awaitTermination()
    again = {(r["r"], r["b"]): r["cnt"]
             for r in read_sketch(spark, path).collect()}
    assert again == want


def test_suffix_admission_stream_cross_batch_and_redelivery(spark, tmp_path):
    """Streaming suffix admission: (1) a span duplicated only ACROSS
    batches is found when the second copy arrives (cross-batch state
    works); (2) a batch-internal duplicate is found on arrival;
    (3) redelivering an already-admitted document appends NOTHING
    (left_anti healing) — spans and corpus are unchanged after a
    replay drain."""
    import json as _json

    from google_sheets_etl_spark.streaming.suffix_stream import (
        read_spans, suffix_admission_stream,
    )

    # APERIODIC 45-char runs (a repeated-char run self-matches: its
    # overlapping 40-grams are identical within one document)
    dup = "qwertyuiopasdfghjklzxcvbnm1234567890QWERTYUIO"
    solo = "QAZWSXEDCRFVTGBYHNUJMIKOLP0987654321qazwsxed!"
    assert len(dup) == 45 and len(solo) == 45
    feed = tmp_path / "feed"
    feed.mkdir()
    corpus = str(tmp_path / "corpus")
    spans = str(tmp_path / "spans")
    ckpt = str(tmp_path / "ck")

    def drain(rows, name):
        with open(feed / name, "w") as f:
            for did, text in rows:
                f.write(_json.dumps({"doc_id": did, "text": text}) + "\n")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        suffix_admission_stream(
            stream, corpus, spans, ckpt, min_len=40
        ).awaitTermination()

    # batch 1: doc 1 carries the run; docs 2+3 duplicate each other.
    # pads are distinct per role AND aperiodic — a shared or periodic
    # pad would itself be a duplicated >=40-char span
    pad = "".join(chr(33 + (i * 11) % 90) for i in range(90))
    pad1 = "".join(chr(33 + (i * 7) % 90) for i in range(90))
    drain([(1, "A" + solo + pad1),
           (2, "B" + pad + dup),
           (3, "B" + pad + dup)], "b1.json")
    got1 = {(r.doc_id, r.span_start) for r in
            read_spans(spark, spans).collect()}
    # batch-internal: docs 2 and 3 share text beyond 40 chars from
    # position 1; doc 1's run has no second occurrence YET
    assert {d for d, _ in got1} == {2, 3}

    # batch 2: doc 4 repeats doc 1's run -> BOTH get nothing new for
    # doc 1 (its spans were computed when fresh) but doc 4's copy is
    # found against the admitted corpus
    pad4 = "".join(chr(33 + (i * 13) % 94) for i in range(100))
    drain([(4, "C" + pad4 + solo)], "b2.json")
    got2 = {(r.doc_id, r.span_start) for r in
            read_spans(spark, spans).collect()}
    assert (4, 102) in got2  # solo starts after "C" + 100 pad chars

    # redelivery: replaying batch 1's rows must change nothing
    before_spans = sorted(map(tuple, read_spans(spark, spans).collect()))
    before_corpus = sorted(
        r.doc_id for r in spark.read.parquet(corpus).collect()
    )
    drain([(1, "A" + solo + pad1),
           (2, "B" + pad + dup),
           (3, "B" + pad + dup)], "b1_replay.json")
    assert sorted(map(tuple, read_spans(spark, spans).collect())) \
        == before_spans
    assert sorted(
        r.doc_id for r in spark.read.parquet(corpus).collect()
    ) == before_corpus
