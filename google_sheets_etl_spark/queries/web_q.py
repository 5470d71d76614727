"""Query registry — web_q section: the END-TO-END web-pretraining
pipeline (round-10 verdict directive #1): raw gz-WARC bytes to packed
training sequences, composing the round-9 web front door with the
certified curation back half, with per-stage accounting.

Reference parity note: the reference engine (PHP ETL; see
``GoogleSheetsAgent.php``) has no web/text surface — this module is
part of the training-data-pipeline extension set."""

from __future__ import annotations

from pyspark.sql import Window

from ._core import *  # noqa: F401,F403 — shared registry/helpers
from .analytics_q import _MOJI_CLEAN, _MOJI_CP1252, _sqlq

#: exact-duplicate class body (doc_id % 5 == 3): passes every Gopher
#: gate (24 tokens, 22 distinct, stopwords present, mean word length
#: in [3,10]) so the exact-dedup stage — not a quality gate — is what
#: collapses the class.
_E2E_CONST = (
    "the quick brown fox jumps over a lazy dog while seven wizards "
    "brew strong coffee for every patient guest in the old stone tower"
)
#: shared suffix-class tail (doc_id % 3 == 1): 82 chars >= the 40-char
#: suffix-dedup window, vocabulary disjoint from the corpus so the
#: duplicated region is exactly the planted one plus the shared moji
#: appendix it abuts.
_E2E_TAIL = (
    "repeated boilerplate disclaimer all rights reserved "
    "contact admin example dot com"
)
#: blocklist term (doc_id % 7 == 0 docs carry it); not in the corpus
#: vocabulary, so the C4 gate's kept set is exactly the non-residue.
_E2E_BLOCK_TERM = "jackpot"
_E2E_HOSTS = (
    "example.com", "news.bbc.co.uk", "shop.com.au", "docs.example.io"
)

#: Gopher stopword list (mirrors operators/text.py gopher filter)
_GOPHER_STOPS = "'the','a','of','and','to','in','is','that','it','for'"


def _e2e_clean_text_sql() -> str:
    """The CLEAN per-doc body the pipeline must recover, by
    construction (corrupt differs from clean only in non-space chars,
    so every token count downstream is computable from this form)."""
    return (
        "(CASE WHEN doc_id % 5 = 3 THEN " + _sqlq(_E2E_CONST)
        + " ELSE text END)"
        + " || (CASE WHEN doc_id % 7 = 0 THEN ' " + _E2E_BLOCK_TERM
        + "' ELSE '' END)"
        + " || (CASE WHEN doc_id % 3 = 1 THEN ' " + _E2E_TAIL
        + "' ELSE '' END)"
        + " || " + _sqlq(_MOJI_CLEAN)
    )


_WEB_E2E_ORACLE = f"""WITH clean AS (
         SELECT doc_id, {_e2e_clean_text_sql()} AS text
         FROM documents),
       page AS (
         SELECT doc_id,
                '<html><body><div><a href=h>Home</a> <a href=a>About'
                || '</a> <a href=c>Contact us</a></div><p>' || text
                || '</p><div><a>Privacy</a> | <a>Terms</a> | '
                || '<a>Imprint</a></div></body></html>' AS html
         FROM clean),
       kept4 AS (
         SELECT doc_id, text FROM (
           SELECT doc_id, text,
                  ROW_NUMBER() OVER (PARTITION BY doc_id // 2
                                     ORDER BY doc_id) AS rn
           FROM clean) WHERE rn = 1),
       kept5 AS (SELECT doc_id, text FROM kept4 WHERE doc_id % 7 <> 0),
       gop AS (
         SELECT doc_id, text,
                len(string_split(text, ' ')) AS nt,
                len(list_distinct(string_split(text, ' '))) AS nu,
                list_sum(list_transform(string_split(text, ' '),
                                        w -> length(w))) AS sl,
                len(list_filter(string_split(text, ' '),
                    w -> list_contains([{_GOPHER_STOPS}], w))) AS sh
         FROM kept5),
       kept6 AS (
         SELECT doc_id, text FROM gop
         WHERE nt >= 20 AND nt <= 100000 AND sl >= 3 * nt
           AND sl <= 10 * nt AND sh >= 2 AND nu * 2 >= nt),
       s7 AS (
         SELECT doc_id, text FROM (
           SELECT doc_id, text,
                  ROW_NUMBER() OVER (PARTITION BY sha256(text)
                                     ORDER BY doc_id) AS rn
           FROM kept6) WHERE rn = 1),
       sfx_pos AS (
         SELECT doc_id, UNNEST(range(1, length(text) - 40 + 2)) AS i,
                text
         FROM s7),
       sfx_grams AS (
         SELECT doc_id, CAST(i AS BIGINT) AS i,
                substr(text, CAST(i AS INT), 40) AS gram
         FROM sfx_pos),
       sfx_dup AS (SELECT gram FROM sfx_grams GROUP BY gram
                   HAVING count(*) >= 2),
       sfx_marked AS (SELECT g.doc_id, g.i FROM sfx_grams g
                      JOIN sfx_dup d USING (gram)),
       sfx_lagged AS (
         SELECT doc_id, i,
                CASE WHEN i - lag(i) OVER
                       (PARTITION BY doc_id ORDER BY i) > 40
                     THEN 1 ELSE 0 END AS brk
         FROM sfx_marked),
       sfx_isl AS (
         SELECT doc_id, i,
                SUM(brk) OVER
                  (PARTITION BY doc_id ORDER BY i) AS grp
         FROM sfx_lagged),
       sfx_spans AS (
         SELECT doc_id, min(i) AS span_start,
                max(i) + 39 AS span_end
         FROM sfx_isl GROUP BY doc_id, grp),
       sfx_tail AS (
         SELECT s.doc_id, max(s.span_end) + 1 AS seg_start
         FROM sfx_spans s GROUP BY s.doc_id),
       sfx_segs AS (
         SELECT doc_id,
                coalesce(lag(span_end) OVER
                           (PARTITION BY doc_id ORDER BY span_start)
                         + 1, 1) AS seg_start,
                span_start - 1 AS seg_end
         FROM sfx_spans
         UNION ALL
         SELECT tl.doc_id, tl.seg_start,
                CAST(length(d.text) AS BIGINT) AS seg_end
         FROM sfx_tail tl JOIN s7 d USING (doc_id)),
       sfx_rebuilt AS (
         SELECT g.doc_id,
                string_agg(
                  substr(d.text, CAST(g.seg_start AS INT),
                         CAST(greatest(g.seg_end - g.seg_start + 1,
                                       0) AS INT)),
                  '' ORDER BY g.seg_start) AS text_clean
         FROM sfx_segs g JOIN s7 d USING (doc_id)
         GROUP BY g.doc_id),
       s8 AS (
         SELECT d.doc_id, coalesce(r.text_clean, d.text) AS text
         FROM s7 d LEFT JOIN sfx_rebuilt r USING (doc_id)),
       ev AS (
         SELECT DISTINCT
                unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            || ' ' || w[i+3] || ' ' || w[i+4])) AS g
         FROM (SELECT string_split(text, ' ') AS w FROM documents
               WHERE doc_id % 11 = 5)),
       g9 AS (
         SELECT doc_id,
                unnest(list_transform(range(1, greatest(len(w) - 3, 1)),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                            || ' ' || w[i+3] || ' ' || w[i+4])) AS g
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM s8)),
       contam AS (SELECT DISTINCT g9.doc_id FROM g9 JOIN ev USING (g)),
       s9 AS (SELECT * FROM s8
              WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
       split_ AS (
         SELECT doc_id, text,
                CASE WHEN b < 98 THEN 'train'
                     WHEN b < 99 THEN 'val'
                     ELSE 'test' END AS split
         FROM (SELECT doc_id, text,
                      ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                        % 100 AS b
               FROM s9)),
       tokc AS (SELECT doc_id, split,
                       CASE WHEN text IS NULL THEN 0
                            ELSE len(string_split(text, ' ')) END::BIGINT
                         AS ntk
                FROM split_),
       ch AS (SELECT doc_id, split, ntk,
                     greatest(1, (ntk + 63) // 64)::BIGINT AS nc
              FROM tokc),
       rows_ AS (SELECT doc_id, split, ntk, nc,
                        unnest(range(0, nc)) AS chunk_idx
                 FROM ch),
       lens AS (SELECT doc_id, split, chunk_idx,
                       (CASE WHEN chunk_idx < nc - 1 THEN 64
                             ELSE ntk - 64 * (nc - 1) END)::BIGINT
                         AS chunk_len
                FROM rows_),
       packed AS (SELECT split, doc_id, chunk_idx, chunk_len,
                         CAST(FLOOR((SUM(chunk_len) OVER (
                                       PARTITION BY split
                                       ORDER BY doc_id, chunk_idx
                                       ROWS UNBOUNDED PRECEDING)
                                     - chunk_len)
                                    / 512.0) AS BIGINT) AS seq
                  FROM lens)
       SELECT CAST(1 AS BIGINT) AS stage_ord, 'ingested' AS stage,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(len(string_split(html, ' '))) AS BIGINT)
                AS n_tokens
       FROM page
       UNION ALL
       SELECT 2, 'main_content', CAST(COUNT(*) AS BIGINT),
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
       FROM clean
       UNION ALL
       SELECT 3, 'mojibake_repaired', CAST(COUNT(*) AS BIGINT),
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
       FROM clean
       UNION ALL
       SELECT 4, 'url_deduped', CAST(COUNT(*) AS BIGINT),
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
       FROM kept4
       UNION ALL
       SELECT 5, 'blocklist_gated', CAST(COUNT(*) AS BIGINT),
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
       FROM kept5
       UNION ALL
       SELECT 6, 'quality_gated', CAST(COUNT(*) AS BIGINT),
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
       FROM kept6
       UNION ALL
       SELECT 7, 'exact_deduped', CAST(COUNT(*) AS BIGINT),
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
       FROM s7
       UNION ALL
       SELECT 8, 'suffix_deduped', CAST(COUNT(*) AS BIGINT),
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
       FROM s8
       UNION ALL
       SELECT 9, 'decontaminated', CAST(COUNT(*) AS BIGINT),
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
       FROM s9
       UNION ALL
       SELECT 10, 'packed_' || split, CAST(COUNT(DISTINCT doc_id)
              AS BIGINT), CAST(SUM(chunk_len) AS BIGINT)
       FROM packed GROUP BY split"""


@q("web_pretraining_pipeline_e2e", _WEB_E2E_ORACLE)
def web_pretraining_pipeline_e2e(spark: SparkSession, sf: str) -> DataFrame:
    """The WHOLE web-pretraining pipeline in one query — raw
    Common-Crawl-format bytes to packed training sequences, the shape
    a real pretraining user runs first (round-10 directive #1):

      gz-WARC bytes → strict member walk (cleaning.py gunzip_members)
      → Content-Length record walk (warc_response_records) → density
      main-content extraction (main_content_extract: nav + footer
      link-farms dropped) → mojibake repair (the ftfy pass) → CCNet
      URL dedup (url_normalize + keep-first) → C4 blocklist gate
      (term-table join) → Gopher quality gates → exact sha256 dedup
      → Lee-et-al variable-length suffix dedup (operators/suffix.py,
      40-char windows, spans cut from every copy) → 5-gram benchmark
      decontamination → deterministic 98/1/1 hash split →
      context-length chunk + sequence packing — with PER-STAGE
      accounting (the dataset_card_report discipline): one row per
      stage, ``(stage_ord, stage, n_docs, n_tokens)``.

    Plants exercise every stage: doc_id%5==3 docs share one body
    (exact-dup class), %3==1 docs share an 82-char tail (suffix
    class), %7==0 docs carry a blocklist term, every doc's body is
    CP1252-mojibake-corrupted in the capture, and paired doc_ids
    carry messy/clean variants of one URL. The oracle replays the
    back half stage-for-stage in SQL and states the FRONT half
    (WARC walk → main content → repair) BY CONSTRUCTION — the
    recovered text must equal the clean plant exactly (corruption
    changes no space bytes, so every stage's token accounting is
    computable from the clean form; the front-door replay itself is
    certified by warc_html_ingest / warc_content_length_walk /
    main_content_extract_stats / mojibake_repair_stats).

    Shape: the front door materializes ONCE (persisted after the
    record walk — the only Python/Arrow stage; everything after is
    codegen, windows, and uniform-key shuffles); per-doc gate
    verdicts compose multiplicatively in one wide frame, so stages
    1-7 cost ONE aggregation pass; suffix dedup checkpoint-cuts its
    rounds internally. At 100 TB each stage boundary would be a
    parquet checkpoint; parallelism at the front is WARC file count
    (Common Crawl's grain), at the back uniform hash keys."""
    docs = t(spark, sf, "documents")
    import pandas as pd

    def kernel(batches):
        import zlib

        crlf = "\r\n"
        for pdf in batches:
            ids, gzs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                base = _E2E_CONST if doc_id % 5 == 3 else text
                bt = (
                    base
                    + (" " + _E2E_BLOCK_TERM if doc_id % 7 == 0 else "")
                    + (" " + _E2E_TAIL if doc_id % 3 == 1 else "")
                    + _MOJI_CP1252
                )
                page = (
                    "<html><body><div><a href=h>Home</a> "
                    "<a href=a>About</a> <a href=c>Contact us</a></div>"
                    "<p>" + bt + "</p>"
                    "<div><a>Privacy</a> | <a>Terms</a> | "
                    "<a>Imprint</a></div></body></html>"
                )
                http = (
                    "HTTP/1.1 200 OK" + crlf
                    + "Content-Type: text/html" + crlf + crlf + page
                )
                records = [
                    "WARC/1.0" + crlf + "WARC-Type: warcinfo" + crlf
                    + "Content-Length: 11" + crlf + crlf
                    + "software: x" + crlf + crlf,
                    "WARC/1.0" + crlf + "WARC-Type: response" + crlf
                    + f"WARC-Target-URI: http://ex.com/{doc_id}" + crlf
                    + f"Content-Length: {len(http.encode('utf-8'))}"
                    + crlf + crlf + http + crlf + crlf,
                ]
                members = []
                for rec in records:
                    c = zlib.compressobj(9, zlib.DEFLATED, 31)
                    members.append(c.compress(rec.encode()) + c.flush())
                ids.append(doc_id)
                gzs.append(b"".join(members))
            yield pd.DataFrame({"doc_id": ids, "warc_gz": gzs})

    gz = docs.select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(
        kernel, "doc_id long, warc_gz binary"
    )
    warcs = cleaning.warc_gz_to_text(gz)
    recs = (
        cleaning.warc_response_records(warcs)
        .filter(F.col("warc_type") == "response")
        .select("doc_id", F.col("payload").alias("html"))
        .persist()
    )

    def tok(c) -> "F.Column":
        return F.size(F.split(c, " ")).cast("long")

    try:
        # cut the extraction outputs ONCE (r12): ``wide`` references
        # the extract→repair chain directly AND under rep, and wide
        # itself fans out three ways (direct, blocklist, gopher) —
        # un-cut, the regex-heavy HTML block extraction evaluated ~6x
        # inside the wide3 materialization job (persist doesn't help:
        # branches within one job race the cache). The cut tables are
        # one narrow (doc_id, text) row per page.
        main = cleaning.main_content_extract(recs, html_col="html").select(
            "doc_id", "main_text"
        ).localCheckpoint(eager=True)
        rep = cleaning.mojibake_repair(
            main.select("doc_id", F.col("main_text").alias("text"))
        ).select("doc_id", "text_clean").localCheckpoint(eager=True)
        site = F.expr("doc_id div 2")
        host = F.element_at(
            F.array(*[F.lit(h) for h in _E2E_HOSTS]),
            (site % 4 + 1).cast("int"),
        )
        url = F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("HTTPS://WWW."), F.upper(host), F.lit(":443/p/"),
                site.cast("string"), F.lit("/?utm_source=a&id="),
                site.cast("string"), F.lit("#x"),
            ),
        ).otherwise(
            F.concat(
                F.lit("https://"), host, F.lit("/p/"),
                site.cast("string"), F.lit("?id="), site.cast("string"),
            )
        )
        wide = (
            recs
            .join(main, "doc_id")
            .join(rep, "doc_id")
            .withColumn("url_norm", cleaning.url_normalize(url))
        )
        terms = spark.createDataFrame(
            [(_E2E_BLOCK_TERM,)], "term string"
        )
        # the gates only read text_clean — feed them the narrow cut
        # table instead of the wide join (r12), so neither gate
        # re-evaluates the join or the url projection
        bl = text_ops.blocklist_gate(
            rep.select("doc_id", F.col("text_clean").alias("text")),
            terms, max_hits=0,
        ).select("doc_id", F.col("keep").alias("_bl"))
        gq = text_ops.gopher_quality_filter(
            rep.select("doc_id", F.col("text_clean").alias("text"))
        ).select("doc_id", F.col("keep").alias("_gq"))
        w_url = Window.partitionBy("url_norm").orderBy("doc_id")
        wide3 = (
            wide.join(bl, "doc_id").join(gq, "doc_id")
            .withColumn("_url", F.row_number().over(w_url) == 1)
            .withColumn("_s456", F.col("_url") & F.col("_bl") & F.col("_gq"))
        )
        w_sha = Window.partitionBy(
            "_s456", F.sha2(F.col("text_clean"), 256)
        ).orderBy("doc_id")
        wide3 = wide3.withColumn(
            "_exact", F.col("_s456") & (F.row_number().over(w_sha) == 1)
        ).persist()

        a = wide3.agg(
            F.count(F.lit(1)).alias("n1"),
            F.sum(tok(F.col("html"))).alias("t1"),
            F.sum(tok(F.col("main_text"))).alias("t2"),
            F.sum(tok(F.col("text_clean"))).alias("t3"),
            F.sum(F.when(F.col("_url"), 1).otherwise(0)).alias("n4"),
            F.sum(F.when(F.col("_url"), tok(F.col("text_clean")))
                  .otherwise(0)).alias("t4"),
            F.sum(F.when(F.col("_url") & F.col("_bl"), 1)
                  .otherwise(0)).alias("n5"),
            F.sum(F.when(F.col("_url") & F.col("_bl"),
                         tok(F.col("text_clean"))).otherwise(0))
            .alias("t5"),
            F.sum(F.when(F.col("_s456"), 1).otherwise(0)).alias("n6"),
            F.sum(F.when(F.col("_s456"), tok(F.col("text_clean")))
                  .otherwise(0)).alias("t6"),
            F.sum(F.when(F.col("_exact"), 1).otherwise(0)).alias("n7"),
            F.sum(F.when(F.col("_exact"), tok(F.col("text_clean")))
                  .otherwise(0)).alias("t7"),
        ).first()

        from ..operators.suffix import apply_span_removal, duplicate_spans

        s7 = wide3.filter("_exact").select(
            "doc_id", F.col("text_clean").alias("text")
        )
        s8 = apply_span_removal(
            s7, duplicate_spans(s7, min_len=40)
        ).select("doc_id", F.col("text_clean").alias("text")).persist()
        b = s8.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(tok(F.col("text"))).alias("t"),
        ).first()

        ev = (
            docs.filter(F.col("doc_id") % 11 == 5)
            .select(
                F.explode(
                    word_shingles(words_of(F.col("text")), 5)
                ).alias("g")
            )
            .distinct()
        )
        contam = (
            s8.select(
                "doc_id",
                F.explode(
                    word_shingles(words_of(F.col("text")), 5)
                ).alias("g"),
            )
            .join(ev, "g", "left_semi")
            .select("doc_id")
            .distinct()
        )
        # persist: the decontaminated set feeds TWO actions (the
        # stage-9 accounting and the packing pass) — without the
        # cache the 5-gram shingle explode + semi-join re-ran in the
        # packing job (r12)
        s9 = s8.join(contam, "doc_id", "left_anti").persist()
        c = s9.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(tok(F.col("text"))).alias("t"),
        ).first()

        packed = sampling.pack_context_chunks(
            sampling.hash_split(s9),
            ctx_len=64, seq_budget=512, group_col="split",
        )
        d = (
            packed.groupBy("split")
            .agg(
                F.countDistinct("doc_id").alias("n"),
                F.sum("chunk_len").cast("long").alias("t"),
            )
            .collect()
        )

        rows = [
            (1, "ingested", int(a["n1"]), int(a["t1"])),
            (2, "main_content", int(a["n1"]), int(a["t2"])),
            (3, "mojibake_repaired", int(a["n1"]), int(a["t3"])),
            (4, "url_deduped", int(a["n4"]), int(a["t4"])),
            (5, "blocklist_gated", int(a["n5"]), int(a["t5"])),
            (6, "quality_gated", int(a["n6"]), int(a["t6"])),
            (7, "exact_deduped", int(a["n7"]), int(a["t7"])),
            (8, "suffix_deduped", int(b["n"]), int(b["t"])),
            (9, "decontaminated", int(c["n"]), int(c["t"])),
        ] + [
            (10, "packed_" + r["split"], int(r["n"]), int(r["t"]))
            for r in sorted(d, key=lambda r: r["split"])
        ]
    finally:
        recs.unpersist()
        try:
            wide3.unpersist()
            s8.unpersist()
            s9.unpersist()
        except NameError:
            pass
    return spark.createDataFrame(
        rows, "stage_ord long, stage string, n_docs long, n_tokens long"
    )


@q(
    "robots_url_gate",
    """WITH urls AS (
         SELECT doc_id AS url_id, doc_id % 3 AS domain,
                CASE doc_id % 5
                  WHEN 0 THEN '/public/page' || doc_id
                  WHEN 1 THEN '/private/page' || doc_id
                  WHEN 2 THEN '/private/ok/' || doc_id
                  WHEN 3 THEN '/tmp/x' || doc_id
                  ELSE '/dup/x' || doc_id END AS path
         FROM documents),
       rules(domain, directive, path_prefix) AS (VALUES
         (0, 'disallow', '/private/'), (0, 'allow', '/private/ok/'),
         (0, 'allow', '/dup/'), (0, 'disallow', '/dup/'),
         (0, 'disallow', '/tmp/'),
         (1, 'disallow', '/private/'), (1, 'allow', '/private/ok/'),
         (1, 'allow', '/dup/'), (1, 'disallow', '/dup/'),
         (2, 'disallow', '/private/'), (2, 'allow', '/private/ok/'),
         (2, 'allow', '/dup/'), (2, 'disallow', '/dup/'),
         (2, 'disallow', '/tmp/')),
       m AS (SELECT u.url_id, u.domain, u.path, r.directive,
                    r.path_prefix,
                    CASE WHEN r.path_prefix IS NOT NULL
                              AND starts_with(u.path, r.path_prefix)
                         THEN len(r.path_prefix) ELSE -1 END AS mlen
             FROM urls u LEFT JOIN rules r USING (domain)),
       best AS (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY url_id
                  ORDER BY mlen DESC,
                           CASE WHEN directive = 'allow'
                                THEN 0 ELSE 1 END) AS rk
                FROM m)
       SELECT url_id, domain, path,
              CASE WHEN mlen < 0 THEN TRUE
                   ELSE directive = 'allow' END AS allowed,
              CASE WHEN mlen < 0 THEN ''
                   ELSE path_prefix END AS matched_prefix
       FROM best WHERE rk = 1""",
)
def robots_url_gate(spark: SparkSession, sf: str) -> DataFrame:
    """robots.txt-style URL gating (cleaning.robots_url_gate) — the
    crawl-POLITENESS filter, completing the web front door's other
    gate axis (the C4 blocklist gates CONTENT after the fetch; this
    gates the FETCH itself, and re-audits an existing crawl): REP
    longest-match-wins (RFC 9309 §2.2.2) with the Allow-wins-ties
    tiebreak, default allow. The fixture exercises every branch:
    unmatched paths (default allow), a plain Disallow, a LONGER
    Allow overriding a shorter Disallow (/private/ok/ vs /private/),
    a domain-conditional rule (/tmp/ blocked on two of three
    domains), and an exact-length Allow/Disallow TIE on /dup/ that
    the tiebreak must resolve to allow. Rules broadcast (real robots
    files are KBs); prefix match is codegen startswith, the winner
    one window over the url key."""
    docs = t(spark, sf, "documents").select("doc_id")
    urls = docs.select(
        F.col("doc_id").alias("url_id"),
        (F.col("doc_id") % 3).alias("domain"),
        F.concat(
            F.element_at(
                F.array(
                    F.lit("/public/page"), F.lit("/private/page"),
                    F.lit("/private/ok/"), F.lit("/tmp/x"),
                    F.lit("/dup/x"),
                ),
                (F.col("doc_id") % 5 + 1).cast("int"),
            ),
            F.col("doc_id").cast("string"),
        ).alias("path"),
    )
    rule_rows = []
    for d in (0, 1, 2):
        rule_rows += [
            (d, "disallow", "/private/"),
            (d, "allow", "/private/ok/"),
            (d, "allow", "/dup/"),
            (d, "disallow", "/dup/"),
        ]
        if d != 1:
            rule_rows.append((d, "disallow", "/tmp/"))
    rules = spark.createDataFrame(
        rule_rows, "domain long, directive string, path_prefix string"
    )
    return cleaning.robots_url_gate(urls, rules)


@q(
    "wet_text_ingest",
    """SELECT doc_id, 2 AS record_idx,
              'http://ex' || (doc_id % 7) || '.com/wet/' || doc_id
                AS target_uri,
              substr(text, 1, 90) AS text,
              CAST(length(substr(text, 1, 90)) AS BIGINT) AS n_chars
       FROM documents
       UNION ALL
       SELECT doc_id, 3 AS record_idx,
              'http://ex' || (doc_id % 7) || '.com/wet/' || doc_id
                || 'b' AS target_uri,
              'part two of ' || doc_id || ': ' || substr(text, 91, 80)
                AS text,
              CAST(length('part two of ' || doc_id || ': '
                          || substr(text, 91, 80)) AS BIGINT) AS n_chars
       FROM documents""",
)
def wet_text_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """WET ingestion end-to-end (cleaning.wet_conversion_records —
    r10 verdict missing #6: Common Crawl's text-only sibling is what
    most text pipelines actually consume): per document a gzipped WET
    file is planted — one warcinfo record plus TWO conversion records
    (correct Content-Length, CRLF CRLF terminators, per-record gzip
    members) — and walked through the SAME certified member walk
    (warc_gz_to_text) and the shared ISO 28500 record fold, keeping
    ``WARC-Type: conversion`` rows with their WARC-Target-URI and
    plain-text body (no HTTP envelope — the grammar difference from
    WARC). Output feeds the quality/dedup back half directly; the
    oracle restates every (uri, text, n_chars) by construction of the
    plant. Parallelism = WET file count, Common Crawl's shard grain."""
    import pandas as pd

    docs = t(spark, sf, "documents")

    def kernel(batches):
        import zlib

        crlf = "\r\n"

        def rec(typ: str, body: str, uri: str | None = None) -> str:
            h = "WARC/1.0" + crlf + f"WARC-Type: {typ}" + crlf
            if uri is not None:
                h += f"WARC-Target-URI: {uri}" + crlf
            h += f"Content-Length: {len(body.encode('utf-8'))}" + crlf
            return h + crlf + body + crlf + crlf

        for pdf in batches:
            ids, gzs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                uri = f"http://ex{doc_id % 7}.com/wet/{doc_id}"
                records = [
                    rec("warcinfo", "software: wet-plant"),
                    rec("conversion", text[:90], uri),
                    rec(
                        "conversion",
                        f"part two of {doc_id}: " + text[90:170],
                        uri + "b",
                    ),
                ]
                members = []
                for r in records:
                    c = zlib.compressobj(9, zlib.DEFLATED, 31)
                    members.append(c.compress(r.encode()) + c.flush())
                ids.append(doc_id)
                gzs.append(b"".join(members))
            yield pd.DataFrame({"doc_id": ids, "warc_gz": gzs})

    gz = docs.select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(
        kernel, "doc_id long, warc_gz binary"
    )
    wets = cleaning.warc_gz_to_text(gz).withColumnRenamed("warc", "wet")
    return (
        cleaning.wet_conversion_records(wets)
        .filter(F.col("warc_type") == "conversion")
        .select(
            "doc_id",
            "record_idx",
            "target_uri",
            "text",
            F.length("text").cast("long").alias("n_chars"),
        )
    )


_WETC = "wet shared body alpha beta gamma delta epsilon zeta eta theta iota kappa"


@q(
    "wet_pipeline_e2e",
    f"""WITH ct AS (
         SELECT doc_id,
                CASE WHEN doc_id % 7 = 0
                     THEN substr(CASE WHEN doc_id % 5 = 3
                                      THEN '{_WETC}'
                                      ELSE substr(text, 1, 90) END, 1, 20)
                     ELSE CASE WHEN doc_id % 5 = 3
                               THEN '{_WETC}'
                               ELSE substr(text, 1, 90) END END AS t
         FROM documents),
       f AS (
         SELECT doc_id, t,
                len(string_split(t, ' ')) AS n_tok,
                len(string_split(t, ' ')) >= 10 AS q_pass
         FROM ct),
       k AS (
         SELECT doc_id, t, n_tok, q_pass,
                q_pass AND ROW_NUMBER() OVER (
                  PARTITION BY q_pass, t ORDER BY doc_id) = 1 AS kept
         FROM f)
       SELECT 1 AS stage_ord, 'wet_ingest' AS stage,
              COUNT(*) AS n_docs,
              CAST(SUM(n_tok) AS BIGINT) AS n_tokens FROM k
       UNION ALL
       SELECT 2, 'quality_gate', COUNT(*) FILTER (q_pass),
              CAST(COALESCE(SUM(n_tok) FILTER (q_pass), 0) AS BIGINT)
       FROM k
       UNION ALL
       SELECT 3, 'exact_dedup', COUNT(*) FILTER (kept),
              CAST(COALESCE(SUM(n_tok) FILTER (kept), 0) AS BIGINT)
       FROM k""",
)
def wet_pipeline_e2e(spark: SparkSession, sf: str) -> DataFrame:
    """WET-to-training-set composition (the verdict's "feeding the
    existing quality/dedup back half", the text-only sibling of
    web_pretraining_pipeline_e2e): gz-WET bytes → member walk →
    conversion-record fold → token-count quality gate (docs planted
    with doc_id % 7 == 0 are truncated below the 10-token floor) →
    exact keep-first dedup (doc_id % 5 == 3 docs share one planted
    body) — with per-stage accounting rows (stage_ord, stage, n_docs,
    n_tokens). Shape: the record walk materializes once; gates and
    the keep-first verdict compose in ONE frame (one window on the
    text key, one conditional aggregation) — three stage rows cost
    one pass, the dataset_card_report discipline."""
    import pandas as pd

    docs = t(spark, sf, "documents")

    def kernel(batches):
        import zlib

        crlf = "\r\n"
        for pdf in batches:
            ids, gzs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                base = _WETC if doc_id % 5 == 3 else text[:90]
                ct = base[:20] if doc_id % 7 == 0 else base
                body = ct
                rec = (
                    "WARC/1.0" + crlf + "WARC-Type: conversion" + crlf
                    + f"WARC-Target-URI: http://w.com/{doc_id}" + crlf
                    + f"Content-Length: {len(body.encode('utf-8'))}"
                    + crlf + crlf + body + crlf + crlf
                )
                c = zlib.compressobj(9, zlib.DEFLATED, 31)
                ids.append(doc_id)
                gzs.append(c.compress(rec.encode()) + c.flush())
            yield pd.DataFrame({"doc_id": ids, "warc_gz": gzs})

    gz = docs.select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(
        kernel, "doc_id long, warc_gz binary"
    )
    wets = cleaning.warc_gz_to_text(gz).withColumnRenamed("warc", "wet")
    recs = (
        cleaning.wet_conversion_records(wets)
        .filter(F.col("warc_type") == "conversion")
        .select("doc_id", F.col("text").alias("t"))
    )
    n_tok = F.size(F.split("t", " ")).cast("long")
    f = recs.select("doc_id", "t", n_tok.alias("n_tok")).withColumn(
        "q_pass", F.col("n_tok") >= 10
    )
    w = Window.partitionBy("q_pass", "t").orderBy("doc_id")
    k = f.withColumn(
        "kept", F.col("q_pass") & (F.row_number().over(w) == 1)
    )
    agg = k.agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum("n_tok").alias("t1"),
        F.sum(F.col("q_pass").cast("long")).alias("n2"),
        F.coalesce(
            F.sum(F.when(F.col("q_pass"), F.col("n_tok"))), F.lit(0)
        ).alias("t2"),
        F.sum(F.col("kept").cast("long")).alias("n3"),
        F.coalesce(
            F.sum(F.when(F.col("kept"), F.col("n_tok"))), F.lit(0)
        ).alias("t3"),
    )
    stages = F.array(
        F.struct(F.lit(1).cast("long").alias("stage_ord"),
                 F.lit("wet_ingest").alias("stage"),
                 F.col("n1").alias("n_docs"), F.col("t1").alias("n_tokens")),
        F.struct(F.lit(2).cast("long").alias("stage_ord"),
                 F.lit("quality_gate").alias("stage"),
                 F.col("n2").alias("n_docs"), F.col("t2").alias("n_tokens")),
        F.struct(F.lit(3).cast("long").alias("stage_ord"),
                 F.lit("exact_dedup").alias("stage"),
                 F.col("n3").alias("n_docs"), F.col("t3").alias("n_tokens")),
    )
    return agg.select(F.explode(stages).alias("s")).select(
        "s.stage_ord", "s.stage", "s.n_docs", "s.n_tokens"
    )


@q(
    "wat_metadata_ingest",
    """SELECT doc_id, 2 AS record_idx,
              'http://ex' || (doc_id % 7) || '.com/page/' || doc_id
                AS target_uri,
              'Title of doc ' || doc_id AS title,
              CAST(1 + doc_id % 4 AS BIGINT) AS n_links
       FROM documents""",
)
def wat_metadata_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """WAT ingestion — the third Common Crawl sibling (WARC captures,
    WET text, WAT per-URL METADATA as JSON envelopes), completing the
    container triple over the SAME ISO 28500 record fold: each
    document's gzipped WAT file carries a warcinfo record plus one
    ``WARC-Type: metadata`` record whose body is the CC-style JSON
    envelope (Envelope → Payload-Metadata → HTTP-Response-Metadata →
    HTML-Metadata with Head.Title and Links). The walk surfaces the
    JSON in the record-stream's text column; field extraction is
    JVM-side ``get_json_object`` + ``json_array_length`` — no Python
    past the gunzip kernel. Oracle states (uri, title, link count) by
    construction of the plant."""
    import json as _json

    import pandas as pd

    docs = t(spark, sf, "documents")

    def kernel(batches):
        import zlib

        crlf = "\r\n"

        def rec(typ: str, body: str, uri: str | None = None) -> str:
            h = "WARC/1.0" + crlf + f"WARC-Type: {typ}" + crlf
            if uri is not None:
                h += f"WARC-Target-URI: {uri}" + crlf
            h += f"Content-Length: {len(body.encode('utf-8'))}" + crlf
            return h + crlf + body + crlf + crlf

        for pdf in batches:
            ids, gzs = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                uri = f"http://ex{doc_id % 7}.com/page/{doc_id}"
                env = _json.dumps({
                    "Envelope": {
                        "WARC-Header-Metadata": {
                            "WARC-Target-URI": uri,
                            "WARC-Type": "response",
                        },
                        "Payload-Metadata": {
                            "HTTP-Response-Metadata": {
                                "HTML-Metadata": {
                                    "Head": {
                                        "Title": f"Title of doc {doc_id}",
                                    },
                                    "Links": [
                                        {"url": f"/l{k}"}
                                        for k in range(1 + doc_id % 4)
                                    ],
                                },
                            },
                        },
                    },
                })
                records = [
                    rec("warcinfo", "software: wat-plant"),
                    rec("metadata", env, uri),
                ]
                members = []
                for r in records:
                    c = zlib.compressobj(9, zlib.DEFLATED, 31)
                    members.append(c.compress(r.encode()) + c.flush())
                ids.append(doc_id)
                gzs.append(b"".join(members))
            yield pd.DataFrame({"doc_id": ids, "warc_gz": gzs})

    gz = docs.select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(kernel, "doc_id long, warc_gz binary")
    wats = cleaning.warc_gz_to_text(gz).withColumnRenamed("warc", "wet")
    recs = cleaning.wet_conversion_records(wats).filter(
        F.col("warc_type") == "metadata"
    )
    html_meta = (
        "$.Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata"
    )
    return recs.select(
        "doc_id",
        "record_idx",
        "target_uri",
        F.get_json_object("text", html_meta + ".Head.Title").alias("title"),
        F.json_array_length(
            F.get_json_object("text", html_meta + ".Links")
        ).cast("long").alias("n_links"),
    )
