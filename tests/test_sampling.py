"""Semantic tests for the deterministic sampling/splitting/packing
operators and the round-2 text sketches (repetition, winnowing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from google_sheets_etl_spark.operators import sampling
from google_sheets_etl_spark.operators.text import (
    repetition_stats, winnowing_fingerprints,
)


def docs_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_hash_split_deterministic_partition(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sampling.hash_split(docs).select("doc_id", "split")
    b = sampling.hash_split(docs).select("doc_id", "split")
    ra = {r["doc_id"]: r["split"] for r in a.collect()}
    rb = {r["doc_id"]: r["split"] for r in b.collect()}
    assert ra == rb  # reproducible
    assert set(ra.values()) <= {"train", "val", "test"}
    n = len(ra)
    assert sum(1 for v in ra.values() if v == "train") >= 0.9 * n
    # a different salt moves rows; the split stays total
    salted = {r["doc_id"]: r["split"]
              for r in sampling.hash_split(docs, salt="v2").collect()}
    assert set(salted) == set(ra)


def test_capped_per_key(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    capped = sampling.capped_per_key(docs, key_col="lang", cap=7)
    per = {r["lang"]: r["n"] for r in
           capped.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(7, full[lang])
    # deterministic choice, and a subset of the corpus
    again = sampling.capped_per_key(docs, key_col="lang", cap=7)
    assert sorted(r["doc_id"] for r in capped.collect()) == sorted(
        r["doc_id"] for r in again.collect())


def test_pack_shards_budget(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    packed = sampling.pack_shards(docs, budget=5000, group_col="source",
                                  size_col="n_chars")
    sums = packed.groupBy("source", "shard").agg(
        F.sum("n_chars").alias("tot"), F.max("n_chars").alias("mx")).collect()
    for r in sums:
        # greedy packing: a shard never exceeds budget + one doc
        assert r["tot"] < 5000 + r["mx"]
    # shards are 0-based and contiguous per group
    for src_row in packed.groupBy("source").agg(
            F.min("shard").alias("lo"), F.max("shard").alias("hi"),
            F.countDistinct("shard").alias("n")).collect():
        assert src_row["lo"] == 0
        assert src_row["n"] == src_row["hi"] + 1


def test_repetition_stats_detects_degenerate_doc(spark):
    docs = docs_df(spark, [
        "spam spam spam spam spam spam",
        "one two three four five six",
    ])
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[0]["dup_token_frac"] > 0.8
    assert got[0]["top_bigram_frac"] == 1.0
    assert got[1]["dup_token_frac"] == 0.0
    # all bigrams distinct -> top share = 1/n_grams
    assert abs(got[1]["top_bigram_frac"] - 1 / 5) < 1e-6


def test_winnowing_guarantee(spark):
    """Schleimer et al. guarantee: any shared token run of length
    >= w + k - 1 (here 4+3-1=6) yields at least one shared
    fingerprint; disjoint-vocabulary docs share none."""
    shared = "alpha beta gamma delta epsilon zeta"
    docs = docs_df(spark, [
        f"intro words {shared} tail one",
        f"other prefix {shared} closing",
        "completely different vocabulary without any overlap here",
    ])
    fp = {r["doc_id"]: set(r["fingerprints"])
          for r in winnowing_fingerprints(docs, k=3, w=4).collect()}
    assert fp[0] & fp[1]
    assert not (fp[0] & fp[2])
    # short doc (< k tokens) -> empty fingerprint set
    short = docs_df(spark, ["just two"])
    got = winnowing_fingerprints(short).collect()
    assert got[0]["fingerprints"] == []


def test_decontaminate_eval_flags_cross_split_dups(spark):
    """A val doc that duplicates a train doc's text must be flagged;
    vocabulary-disjoint docs must not."""
    from google_sheets_etl_spark.queries import QUERIES
    import google_sheets_etl_spark.queries as Q
    from google_sheets_etl_spark.operators import sampling as S

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    flagged = {r["doc_id"] for r in Q.QUERIES["decontaminate_eval"](
        spark, "/root/testdata/sf0.001").collect()}
    split = {r["doc_id"]: r["split"]
             for r in S.hash_split(docs).select("doc_id", "split").collect()}
    # every flagged doc is an eval doc by construction
    assert all(split[d] != "train" for d in flagged)


def test_gopher_filter_rules(spark):
    from google_sheets_etl_spark.operators.text import gopher_quality_filter

    good = " ".join(["the", "a", "of"] + [f"tok{i}" for i in range(40)])
    short = "the a of tok"                        # fails token count
    no_stop = " ".join(f"tok{i}" for i in range(40))   # fails stopwords
    degenerate = " ".join(["the", "a"] + ["dup"] * 48)  # fails unique frac
    longwords = " ".join(["the", "a"] + ["x" * 40] * 38)  # fails mean len
    rows = [good, short, no_stop, degenerate, longwords]
    out = {r["doc_id"]: r.asDict() for r in
           gopher_quality_filter(docs_df(spark, rows), min_tokens=20).collect()}
    assert out[0]["keep"] is True
    assert out[1]["keep"] is False and out[1]["rule_token_count"] is False
    assert out[2]["keep"] is False and out[2]["rule_stopwords"] is False
    assert out[3]["keep"] is False and out[3]["rule_unique_frac"] is False
    assert out[4]["keep"] is False and out[4]["rule_mean_word_len"] is False


def test_vocab_coverage_minimal_prefix(spark):
    from google_sheets_etl_spark.operators.text import vocab_coverage

    # freq: aa x10, bb x5, cc x4, dd x1  -> total 20; 95% cut = 19
    rows = [" ".join(["aa"] * 10 + ["bb"] * 5 + ["cc"] * 4 + ["dd"])]
    kept = vocab_coverage(docs_df(spark, rows)).collect()
    by_rank = sorted((r["rank"], r["token"], r["freq"]) for r in kept)
    # aa+bb covers 15 (<19 before cc) -> cc kept; before dd cum=19 -> cut
    assert by_rank == [(1, "aa", 10), (2, "bb", 5), (3, "cc", 4)]


def test_mixture_weights_uniform_target(spark):
    from google_sheets_etl_spark.operators.sampling import mixture_weights

    df = spark.createDataFrame(
        [(0, "en", 300), (1, "en", 300), (2, "de", 200), (3, "fr", 100),
         (4, "fr", 100)],
        "doc_id long, lang string, n_chars long",
    )
    out = {r["lang"]: r for r in mixture_weights(df).collect()}
    total, k = 1000, 3
    assert out["en"]["sample_rate"] == round(total / (k * 600), 6)
    assert out["de"]["sample_rate"] == 1.0   # under-represented: keep all
    assert out["fr"]["sample_rate"] == 1.0


def test_heavy_hitters_sketch_equals_exact(spark):
    from google_sheets_etl_spark.operators.text import heavy_hitter_tokens

    # zipf-ish corpus with a long tail of singletons: hot1 x300,
    # hot2 x120, then 600 distinct rare tokens (none above 1/10)
    body = ["hot1"] * 300 + ["hot2"] * 120 + [f"rare{i}" for i in range(600)]
    rows = [" ".join(body[i::10]) for i in range(10)]  # 10 docs
    got = {r["token"]: r["freq"]
           for r in heavy_hitter_tokens(docs_df(spark, rows), k=10).collect()}
    assert got == {"hot1": 300, "hot2": 120}  # total=1020; >102 only


def test_quality_classifier_null_and_boundary(spark):
    from google_sheets_etl_spark.operators.text import quality_classifier

    df = spark.createDataFrame(
        [(0, "the a of and to in is that it for"),   # all stopwords
         (1, "zzzzz yyyyy xxxxx wwwww vvvvv"),        # zero stopwords
         (2, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in quality_classifier(df).collect()}
    # doc 0: nt=10, sh=10, mx=4 -> 10000 - 360 - 200 = 9440, keep
    assert out[0]["quality_score"] == 9440 and out[0]["keep"] is True
    # doc 1: nt=5, sh=0, mx=5 -> 0 - 180 - 125 = -305, drop
    assert out[1]["quality_score"] == -305 and out[1]["keep"] is False
    # NULL text: NULL score, keep must be FALSE (never silently kept)
    assert out[2]["quality_score"] is None and out[2]["keep"] is False


def test_pack_context_chunks_invariants(spark):
    from google_sheets_etl_spark.operators.sampling import pack_context_chunks

    df = spark.createDataFrame(
        [(0, "s1", " ".join(["w"] * 200)),   # 4 chunks: 64,64,64,8
         (1, "s1", " ".join(["w"] * 64)),    # exactly one full chunk
         (2, "s1", "w"),                     # single token
         (3, "s2", None)],                   # NULL text -> 1 empty chunk
        "doc_id long, source string, text string",
    )
    rows = pack_context_chunks(df, ctx_len=64, seq_budget=128).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # chunk lengths tile the token count, each <= ctx_len
    assert sorted(r["chunk_len"] for r in by_doc[0]) == [8, 64, 64, 64]
    assert [r["chunk_len"] for r in by_doc[1]] == [64]
    assert [r["chunk_len"] for r in by_doc[2]] == [1]
    assert [r["chunk_len"] for r in by_doc[3]] == [0]
    # packing: running sum within s1 (doc order 0..2) div 128 ->
    # chunks at cum starts 0,64,128,192,200,264 -> seqs 0,0,1,1,1,2
    s1 = sorted(
        ((r["doc_id"], r["chunk_idx"]), r["seq"])
        for r in rows if r["source"] == "s1"
    )
    assert [s for _, s in s1] == [0, 0, 1, 1, 1, 2]


def test_pack_context_chunks_rejects_non_pow2(spark):
    import pytest as _pytest

    from google_sheets_etl_spark.operators.sampling import pack_context_chunks

    df = spark.createDataFrame([(0, "s", "w")], "doc_id long, source string, text string")
    with _pytest.raises(ValueError):
        pack_context_chunks(df, ctx_len=60, seq_budget=512)


def test_zorder_files_bound_both_dims(spark):
    from google_sheets_etl_spark.operators.layout import zorder_file_stats

    n = 1 << 12
    side = 1 << 6  # 64x64 grid of (x, y)
    grid = spark.range(n).selectExpr(
        "CAST(id % 64 AS BIGINT) AS x", "CAST(id / 64 AS BIGINT) AS y"
    )
    stats = zorder_file_stats(grid, "x", "y", file_bits=4).collect()
    assert sum(r["n_rows"] for r in stats) == n
    # 16 files over a 64x64 grid: top 4 morton bits fix 2 top bits of
    # each normalized dim -> every file is a quarter-by-quarter tile;
    # BOTH dims bounded at ~side/4, never one full-width stripe
    for r in stats:
        assert r["max_x"] - r["min_x"] <= 16
        assert r["max_y"] - r["min_y"] <= 16


def test_bm25_orders_by_term_presence(spark):
    from google_sheets_etl_spark.operators.text import bm25_scores

    df = spark.createDataFrame(
        [(0, "spark spark table"), (1, "spark table row"), (2, "table row agg")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, ["spark"]).collect()}
    # doc 0 (tf=2) > doc 1 (tf=1) > doc 2 (tf=0, score exactly 0)
    assert out[0] > out[1] > out[2] == 0.0


def test_zorder_exact_at_huge_spans(spark):
    """Spans past ~2^47 are where a multiply-then-divide
    normalization silently leaves double precision (review finding,
    round 4); the shift-only scheme must keep quadrant clusters in
    separate, tightly-bounded files at any span."""
    from google_sheets_etl_spark.operators.layout import zorder_file_stats

    span = 1 << 50
    pts = []
    for qx in (0, 1):
        for qy in (0, 1):
            for j in range(50):
                pts.append((qx * span + j * 1000, qy * span + j * 7777))
    df = spark.createDataFrame(pts, "x long, y long")
    stats = zorder_file_stats(df, "x", "y", file_bits=2).collect()
    assert sum(r["n_rows"] for r in stats) == 200
    assert len(stats) == 4  # one file per quadrant
    for r in stats:
        # each file's span stays within its cluster, nowhere near the
        # full 2^50 spread
        assert r["max_x"] - r["min_x"] < 10 ** 6
        assert r["max_y"] - r["min_y"] < 10 ** 6
