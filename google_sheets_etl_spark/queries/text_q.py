"""Query registry — text_q section (split from the former
queries.py; see queries/__init__.py for the package map
and _core for shared helpers)."""

from ._core import *  # noqa: F401,F403 — shared registry/helpers

@q(
    "text_token_stats",
    """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
              len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
              length(text) AS n_chars_measured
       FROM documents""",
)
def text_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    return text_ops.token_stats(t(spark, sf, "documents"))


@q(
    "text_quality_features",
    """SELECT doc_id,
              len(string_split(text, ' ')) AS n_tokens,
              len(list_filter(string_split(text, ' '),
                  w -> list_contains(['the','a','of','and','to','in','is','that','it','for'], w)))
                AS stop_hits,
              list_max(list_transform(string_split(text, ' '), w -> length(w)))
                AS max_token_len,
              CASE WHEN len(list_filter(string_split(text, ' '),
                     w -> list_contains(['the','a','of','and','to','in','is','that','it','for'], w))) * 50
                     >= len(string_split(text, ' '))
                   THEN 'en' ELSE 'other' END AS lang_guess
       FROM documents""",
)
def text_quality_features(spark: SparkSession, sf: str) -> DataFrame:
    return text_ops.quality_features(t(spark, sf, "documents"))


@q(
    "text_bag_fingerprint",
    """SELECT doc_id,
              sha256(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
                AS bag_fp
       FROM documents""",
)
def text_bag_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    return text_ops.bag_fingerprint(t(spark, sf, "documents"))


@q(
    "lang_histogram",
    """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       FROM documents GROUP BY lang""",
)
def lang_histogram(spark: SparkSession, sf: str) -> DataFrame:
    return text_ops.lang_histogram(t(spark, sf, "documents"))


def _lang_id_oracle() -> str:
    from ..operators.text import LANG_PROFILES, lang_profile_regex

    score = {
        lang: (
            f"len(regexp_extract_all(lower(text), '{lang_profile_regex(sw)}'))"
        )
        for lang, sw in LANG_PROFILES.items()
    }
    return f"""
WITH s AS (
  SELECT doc_id,
         {score['en']} AS s_en, {score['de']} AS s_de,
         {score['fr']} AS s_fr, {score['es']} AS s_es
  FROM documents)
SELECT doc_id,
       CASE WHEN s_en + s_de + s_fr + s_es = 0 THEN 'unknown'
            WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
            WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
            WHEN s_fr >= s_es THEN 'fr'
            ELSE 'es' END AS pred_lang,
       CAST(greatest(s_en, s_de, s_fr, s_es) AS BIGINT) AS lang_score
FROM s"""


@q("lang_id", _lang_id_oracle())
def lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-profile language identification from raw text (argmax
    of per-language function-word hit counts)."""
    return text_ops.lang_id(t(spark, sf, "documents"))


@q(
    "langid_confusion_matrix",
    f"""WITH pred AS ({_lang_id_oracle()})
       SELECT d.lang AS true_lang, pred.pred_lang,
              COUNT(*) AS n,
              CAST(SUM(CASE WHEN d.lang = pred.pred_lang
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
       FROM pred JOIN documents d ON d.doc_id = pred.doc_id
       GROUP BY 1, 2""",
)
def langid_confusion_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """MODEL-EVALUATION tooling — the confusion matrix for the
    language-ID classifier against the corpus's stored labels:
    ``(true_lang, pred_lang, n, n_correct)`` where n_correct makes
    accuracy/precision/recall integer-derivable per class without a
    float in the relation. One classifier pass + one grouped count;
    the matrix is classes², metadata-scale at any corpus size. The
    oracle reuses the lang_id prediction CTE verbatim — classifier
    and evaluation certified together."""
    preds = text_ops.lang_id(t(spark, sf, "documents")).select(
        "doc_id", "pred_lang"
    )
    labels = t(spark, sf, "documents").select("doc_id", "lang")
    return (
        preds.join(labels, "doc_id")
        .groupBy(
            F.col("lang").alias("true_lang"), F.col("pred_lang")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("lang") == F.col("pred_lang")).cast("long")
            ).alias("n_correct"),
        )
    )


_EMB_NEAR_DUP_ORACLE = """
WITH p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(list_dot_product(a.embedding, b.embedding) /
               (sqrt(list_dot_product(a.embedding, a.embedding)) *
                sqrt(list_dot_product(b.embedding, b.embedding))), 4) AS cosine_r4
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
SELECT id_a, id_b, cosine_r4 FROM p WHERE cosine_r4 >= 0.45"""


@q("embedding_near_dup", _EMB_NEAR_DUP_ORACLE)
def embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup pairs — block-partitioned exact
    all-pairs (numpy matmul per batch; embedding_near_dup_lsh is the
    >10^6-vector path)."""
    return similarity.embedding_near_dup_pairs(
        t(spark, sf, "embeddings"), threshold=0.45
    )


@q("embedding_near_dup_lsh", _EMB_NEAR_DUP_ORACLE)
def embedding_near_dup_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """The >10^6-vector embedding near-dup path: hyperplane-bucketed
    candidate self-join + exact cosine verify, NO driver-side corpus
    collect. Output ⊆ the exact pair list by construction (every
    candidate is exactly verified); at (n_bits=2, n_tables=16) pair
    recall at the 0.45 threshold is ~0.9998 analytically and 1.0 on
    this corpus (tests), so the exact-pair oracle applies."""
    return similarity.embedding_near_dup_pairs_lsh(
        t(spark, sf, "embeddings"), threshold=0.45
    )


_HASHED_VEC_CNT = """
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
tv AS (
  SELECT doc_id,
         ('0x' || substr(md5(w), 1, 15))::BIGINT % 64 AS d,
         CASE WHEN ((('0x' || substr(md5(w), 1, 15))::BIGINT >> 53) & 1) = 1
              THEN 1 ELSE -1 END AS s
  FROM tok WHERE w != ''),
cnt AS (
  SELECT doc_id, d, CAST(SUM(s) AS BIGINT) AS v
  FROM tv GROUP BY doc_id, d)"""


@q(
    "hashed_doc_vectors_long",
    f"""WITH {_HASHED_VEC_CNT}
       SELECT doc.doc_id, CAST(g.d AS INTEGER) AS d,
              COALESCE(cnt.v, 0) AS v
       FROM (SELECT DISTINCT doc_id FROM documents) doc
       CROSS JOIN range(0, 64) g(d)
       LEFT JOIN cnt ON cnt.doc_id = doc.doc_id AND cnt.d = g.d""",
)
def hashed_doc_vectors_long(spark: SparkSession, sf: str) -> DataFrame:
    """Feature-hashing vectorization (operators/text.py
    hashed_doc_vectors; Weinberger et al. 2009): every document gets
    a 64-dim signed-count vector from token hashes alone — the
    model-free text→embedding bridge for ingest-time near-dup
    blocking, kNN labeling, and clustering. Coordinates are exact
    integers (md5 dimension + sign-bit hash, no FP), so the twin
    matches bit for bit; output exploded to scalar (doc, dim, value)
    rows including explicit zeros (the dense-rebuild contract)."""
    hv = text_ops.hashed_doc_vectors(t(spark, sf, "documents"))
    return hv.select(
        "doc_id", F.posexplode("vec").alias("d", "v")
    )


@q(
    "hashed_vector_near_dup",
    f"""WITH {_HASHED_VEC_CNT},
       vecs AS (
         SELECT doc.doc_id,
                list(CAST(COALESCE(cnt.v, 0) AS DOUBLE) ORDER BY g.d)
                  AS vec
         FROM (SELECT DISTINCT doc_id FROM documents) doc
         CROSS JOIN range(0, 64) g(d)
         LEFT JOIN cnt ON cnt.doc_id = doc.doc_id AND cnt.d = g.d
         GROUP BY doc.doc_id),
       p AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                ROUND(list_dot_product(a.vec, b.vec) /
                      (sqrt(list_dot_product(a.vec, a.vec)) *
                       sqrt(list_dot_product(b.vec, b.vec))), 4)
                  AS cosine_r4
         FROM vecs a JOIN vecs b ON a.doc_id < b.doc_id)
       SELECT id_a, id_b, cosine_r4 FROM p WHERE cosine_r4 >= 0.8""",
)
def hashed_vector_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Text near-dup through the hashed-vector bridge: documents →
    feature-hash vectors → exact cosine pairs ≥ 0.8 — the
    embedding-near-dup machinery applied to documents WITHOUT a
    model. Cross-engine exact in a way float embeddings can never
    be: integer coordinates make every dot product an
    exactly-representable integer, so the cosine is
    summation-order-free BEFORE rounding. (The blocked-matmul /
    LSH scale paths compose unchanged — same vec column contract.)"""
    hv = (
        text_ops.hashed_doc_vectors(t(spark, sf, "documents"))
        .withColumnRenamed("doc_id", "vec_id")
        .withColumnRenamed("vec", "embedding")
    )
    return similarity.embedding_near_dup_pairs(hv, threshold=0.8)


@q(
    "bpe_token_count",
    r"""SELECT doc_id,
               len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
                 AS n_bpe_tokens
        FROM documents""",
)
def bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    return text_ops.bpe_ish_token_count(t(spark, sf, "documents"))


_ROLLING_ORACLE = """
SELECT doc_id,
       list_reduce(
         list_transform(string_split(text, ' '),
                        w -> ('0x' || substr(md5(w), 1, 15))::BIGINT % 2147483647),
         (acc, x) -> (acc * 1000003 + x) % 2147483647) AS rolling_fp
FROM documents"""


@q("rolling_fingerprint", _ROLLING_ORACLE)
def rolling_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Order-sensitive Rabin-Karp fingerprint; md5 word hashes + exact
    integer fold arithmetic reproduce bit-for-bit in ANSI SQL."""
    return text_ops.rolling_fingerprint(t(spark, sf, "documents"))


_BLOCKLIST_TERMS = ["merge", "scan", "window", "error"]


@q(
    "blocklist_gate_stats",
    """WITH hits AS (
         SELECT doc_id, COUNT(*)::BIGINT AS n_hits,
                COUNT(DISTINCT tok)::BIGINT AS n_distinct_terms
         FROM (SELECT doc_id,
                      unnest(string_split(lower(text), ' ')) AS tok
               FROM documents)
         WHERE tok IN ('merge', 'scan', 'window', 'error')
         GROUP BY doc_id)
       SELECT d.doc_id,
              COALESCE(h.n_hits, 0) AS n_hits,
              COALESCE(h.n_distinct_terms, 0) AS n_distinct_terms,
              COALESCE(h.n_hits, 0) <= 2 AS keep
       FROM documents d LEFT JOIN hits h USING (doc_id)""",
)
def blocklist_gate_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Banned-term filtering (operators/text.py blocklist_gate — the
    C4 "bad words list" gate): per-document blocklist hit counts and
    the keep verdict at max_hits=2, over a term TABLE joined on the
    exploded-token key instead of a regex alternation — the shape
    that survives the 10^5-term lists real deployments carry
    (Catalyst broadcasts a small list, shuffle-joins a huge one on
    uniform token hashes, zero operator changes). Every document
    gets a verdict row, so kept set, reject set, and per-term triage
    derive from one relation."""
    docs = t(spark, sf, "documents")
    terms = spark.createDataFrame(
        [(w,) for w in _BLOCKLIST_TERMS], "term string"
    )
    return text_ops.blocklist_gate(docs, terms, max_hits=2)
