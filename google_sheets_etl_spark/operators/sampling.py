"""Deterministic sampling / splitting / packing for training-data
pipelines (north-star extension; no reference counterpart — the
reference moves whole sheets, these operators curate corpora).

Everything here is HASH-deterministic, never ``rand()``: a split must
be reproducible across runs, engines, and retries — at 100 TB a
re-executed task with a different random seed silently corrupts a
train/val boundary. md5 is the shared cross-engine hash (same trick as
``operators/text.rolling_fingerprint``), so every operator has an
exact ANSI-SQL twin.

All three are single narrow projections or one window shuffle:

- :func:`hash_split` — stable train/val/test assignment from the md5
  of the id: a narrow map, no shuffle, no state; adding rows never
  moves existing ones between splits.
- :func:`capped_per_key` — "at most N docs per language/source":
  row_number over (key, hash-order) keeps a deterministic, unbiased N
  per key. One shuffle on the key; skew-safe for |keys| ≫ cap because
  the window only ranks within each key's partition.
- :func:`pack_shards` — greedy token-budget shard assignment per
  group: running token sum over a deterministic order, shard index =
  cumsum div budget. One window shuffle partitioned by the group
  column — per-group sequential, cross-group parallel (the
  distributed-safe form of "pack the corpus into ~equal shards").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_bucket(col, n: int, salt: str = ""):
    """Uniform bucket in [0, n) from the md5 of ``col`` (+ salt) —
    reproducible in any engine with md5 + hex parsing."""
    h = F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 15), 16, 10
    ).cast("long")
    return h % n


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Assign each row a stable split label; ``weights`` maps label →
    share out of the total (default 98/1/1 train/val/test)."""
    weights = weights or {"train": 98, "val": 1, "test": 1}
    total = sum(weights.values())
    b = _hash_bucket(F.col(id_col), total, salt)
    expr = None
    lo = 0
    for label, w in weights.items():
        c = (b >= F.lit(lo)) & (b < F.lit(lo + w))
        expr = F.when(c, F.lit(label)) if expr is None else expr.when(c, F.lit(label))
        lo += w
    return docs.withColumn("split", expr)


def capped_per_key(
    docs: DataFrame,
    key_col: str,
    cap: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep at most ``cap`` rows per key, chosen by deterministic hash
    order (an unbiased fixed sample, not "first N by storage order")."""
    w = Window.partitionBy(key_col).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), F.col(id_col)
    )
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


def _running_pack(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    size_col: str,
    budget: int,
    out_col: str,
) -> DataFrame:
    """Shared packing invariant for :func:`pack_shards` and
    :func:`pack_context_chunks`: bucket = floor((running size sum -
    own size) / budget) over a deterministic order, windowed per
    group — per-group sequential, groups parallel, never a global
    single-reducer sort. One definition so the greedy-packing
    semantics (and its two SQL oracle twins) can't drift."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(size_col).over(w)
    return df.withColumn(
        out_col, ((running - F.col(size_col)) / F.lit(budget)).cast("long")
    )


def pack_shards(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy shard packing: within each group (deterministic id
    order), shard = floor((running token sum - own size) / budget) —
    every shard except the last holds ≥ budget-ish tokens. Window
    partitioned by group: per-group sequential scan, groups in
    parallel (never a global single-reducer sort)."""
    return _running_pack(docs, group_col, [id_col], size_col, budget, "shard")


def apply_mixture(
    docs: DataFrame,
    rates: DataFrame,
    key_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Materialize a planned mixture (:func:`mixture_weights` output —
    (key, sample_rate) rows) into an actual sampled corpus: broadcast
    the tiny rates dim onto the corpus and gate each row by its md5
    bucket — row kept iff ``bucket ∈ [0, 10⁶) < round(rate·10⁶)``.

    Deterministic (same salt → same sample under retries/engine moves),
    unbiased per key, and NARROW on the corpus side: the only join is a
    broadcast of |keys| rows, the gate fuses into the scan. The rate is
    applied through an integer threshold so the accept decision is
    exact and engine-portable (no float-comparison drift)."""
    b = _hash_bucket(F.col(id_col), 1_000_000, salt)
    return (
        docs.join(
            F.broadcast(rates.select(key_col, "sample_rate")), key_col
        )
        .filter(b < F.round(F.col("sample_rate") * 1_000_000, 0))
        .drop("sample_rate")
    )


def epoch_shuffle(
    docs: DataFrame,
    n_readers: int = 8,
    epochs: int = 2,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic per-epoch training shuffle: for each epoch, every
    document gets a reader assignment and an order key such that (a)
    each epoch is a DIFFERENT pseudo-random permutation, (b) the
    permutation is identical across runs/retries/engines (md5, never
    ``rand()``), and (c) readers stream their slice by sorting on the
    order key — no global shuffle service needed at train time.

    Narrow end to end: epochs explode is a per-row array of
    ``epochs`` elements; reader + order key are projections of the
    md5. The training loader does a per-reader local sort of its
    slice — this operator never sorts globally."""
    epoch = F.explode(F.sequence(F.lit(0), F.lit(epochs - 1))).alias("epoch")
    keyed = docs.select(F.col(id_col), epoch).withColumn(
        "order_key",
        F.md5(
            F.concat(
                F.col(id_col).cast("string"), F.lit(":"),
                F.col("epoch").cast("string"), F.lit(salt),
            )
        ),
    )
    reader = (
        F.conv(F.substring(F.col("order_key"), 1, 15), 16, 10).cast("long")
        % n_readers
    )
    return keyed.withColumn("reader", reader)


def mixture_weights(
    docs: DataFrame,
    key_col: str = "lang",
    size_col: str = "n_chars",
) -> DataFrame:
    """Training-mixture planning: per-domain sampling rates that
    re-balance the corpus toward a UNIFORM target mixture over
    ``key_col`` (the degenerate but standard case of "hit these
    mixture proportions"; a non-uniform target is the same plan with
    a broadcast weights dim). ``sample_rate = min(1, target_share /
    actual_share)`` — over-represented domains are downsampled, small
    domains kept whole; downstream, ``hash_split``-style md5 gating
    applies the rate deterministically.

    Plan: one partial-aggregated shuffle on the low-cardinality key,
    then a 1-row broadcast cross join for the corpus totals — the
    per-key aggregate never sees a second shuffle and nothing is
    collected. Rates are rounded to 6 dp (float-aggregate convention)
    for the cross-engine hash."""
    per_key = docs.groupBy(key_col).agg(
        F.sum(F.col(size_col).cast("long")).alias("domain_size")
    )
    totals = per_key.agg(
        F.sum("domain_size").alias("_total"),
        F.count(F.lit(1)).alias("_n_domains"),
    )
    return (
        per_key.crossJoin(F.broadcast(totals))
        .select(
            key_col,
            "domain_size",
            F.round(
                # zero-size domain (all-empty docs under one key):
                # keep it whole rather than DIVIDE_BY_ZERO under
                # Spark 4's default ANSI mode
                F.when(F.col("domain_size") <= 0, F.lit(1.0)).otherwise(
                    F.least(
                        F.lit(1.0),
                        F.col("_total")
                        / (F.col("_n_domains") * F.col("domain_size")),
                    )
                ),
                6,
            ).alias("sample_rate"),
        )
    )


def pack_context_chunks(
    docs: DataFrame,
    ctx_len: int = 64,
    seq_budget: int = 512,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-length packing: split each document into chunks of at
    most ``ctx_len`` tokens, then pack chunks into training sequences
    of ``seq_budget`` tokens by a running-sum window per group — the
    tokenize→chunk→pack pass that turns a curated corpus into
    fixed-length training sequences (remainder chunks are packed, not
    dropped).

    Output: one row per chunk — (id, group, chunk_idx, chunk_len,
    seq). Deterministic: chunk boundaries are arithmetic, sequence
    assignment is a windowed cumsum over (id, chunk_idx) order.

    Scale shape: the explode is narrow (chunk count = tokens /
    ctx_len, data volume unchanged); the only shuffle is the packing
    window, partitioned by ``group_col`` — per-group sequential,
    groups parallel, same distributed-safe form as
    :func:`pack_shards`. ``ctx_len`` and ``seq_budget`` must be
    powers of two: every division in the plan is then exact in
    binary floating point, so the cast-to-long floor is engine-exact
    (the ANSI-SQL twin reproduces it bit-for-bit).
    """
    if ctx_len & (ctx_len - 1) or seq_budget & (seq_budget - 1):
        raise ValueError("ctx_len and seq_budget must be powers of two")
    nt = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(F.split(F.col(text_col), " "))
    )
    base = docs.select(
        F.col(id_col), F.col(group_col), nt.cast("long").alias("_nt")
    )
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        ((F.col("_nt") + F.lit(ctx_len - 1)) / F.lit(ctx_len)).cast("long"),
    )
    chunks = base.withColumn("_nc", n_chunks).select(
        id_col,
        group_col,
        "_nt",
        "_nc",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("_nc") - 1)
        ).alias("chunk_idx"),
    )
    chunk_len = F.when(
        F.col("chunk_idx") < F.col("_nc") - 1, F.lit(ctx_len).cast("long")
    ).otherwise(F.col("_nt") - F.lit(ctx_len) * (F.col("_nc") - 1))
    with_len = chunks.withColumn("chunk_len", chunk_len.cast("long"))
    return _running_pack(
        with_len, group_col, [id_col, "chunk_idx"], "chunk_len",
        seq_budget, "seq",
    ).drop("_nt", "_nc")


def mixture_weights_temperature(
    docs: DataFrame,
    key_col: str = "lang",
    size_col: str = "n_chars",
) -> DataFrame:
    """Temperature-based mixture planning at T = 2 (α = 1/2): target
    share ∝ sqrt(actual share) — the standard softening between
    proportional (α=1) and uniform (α=0) sampling used for
    multilingual / multi-domain training mixes. α = 1/2 specifically
    because ``sqrt`` is IEEE-correctly-rounded (bit-identical in any
    engine) while a general ``pow`` is not — the one temperature with
    an exact cross-engine oracle.

    rate_k = min(1, c · sqrt(s_k) / s_k) with c = Σ s_j / Σ √(s_j·Σ s_j)
    normalized so expected sampled size sums to the original total.
    Same plan as :func:`mixture_weights`: one low-cardinality
    aggregate + a 1-row broadcast; rates rounded to 6 dp."""
    per_key = docs.groupBy(key_col).agg(
        F.sum(F.col(size_col).cast("long")).alias("domain_size")
    )
    # target_share_k = sqrt(size_k) / Σ sqrt(size_j); expected kept
    # size under rate_k = rate·size, so rate_k = total·target_k/size_k
    totals = per_key.agg(
        F.sum("domain_size").alias("_total"),
        F.sum(F.sqrt(F.col("domain_size").cast("double"))).alias("_sq_total"),
    )
    return (
        per_key.crossJoin(F.broadcast(totals))
        .select(
            key_col,
            "domain_size",
            F.round(
                # zero-size domain: keep whole (see mixture_weights)
                F.when(F.col("domain_size") <= 0, F.lit(1.0)).otherwise(
                    F.least(
                        F.lit(1.0),
                        (
                            F.col("_total")
                            * (
                                F.sqrt(F.col("domain_size").cast("double"))
                                / F.col("_sq_total")
                            )
                        )
                        / F.col("domain_size"),
                    )
                ),
                6,
            ).alias("sample_rate"),
        )
    )


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame,
    raw: DataFrame,
    dim: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, the method behind many modern pretraining-mix selections):
    score every document by how much more likely its hashed-feature
    bag is under a TARGET distribution (the domain you want more of)
    than under the RAW pool it came from,

        logw(doc) = Σ_tokens log2 p_target(bucket) − log2 p_raw(bucket)

    with tokens feature-hashed to ``dim`` buckets (the 60-bit-md5
    convention of :func:`~..operators.text.hashed_doc_vectors`, so
    any engine reproduces the buckets) and add-0.5 smoothing on both
    categorical models (the LM rows' convention; every bucket keeps
    positive mass, so unseen features penalize rather than NaN).

    Exactness: per-BUCKET log-ratios round half-up to integer
    micro-units ONCE (a dim-bounded table), and each document's
    weight is an exact int64 dot product of its integer bucket
    counts with that table — summation-order-free, hash-stable.

    Scale shape: both models are dim-bounded aggregates (≤ ``dim``
    rows each) joined into ONE broadcast log-ratio table built over
    ``spark.range(dim)`` (buckets unseen by both sides still get the
    smoothed ratio); scoring is one narrow explode + a (doc, bucket)
    partial-aggregated count + one broadcast join + one uniform
    doc-key aggregate. The corpus never shuffles wider than
    (doc × ≤dim) rows. Returns ``(id, n_tokens, dsir_logw_u6,
    bits_per_token)``; empty docs carry no evidence and are excluded.
    """
    from .typed_views import ensure_parallelism

    if dim < 1:
        raise ValueError("dim must be >= 1")

    def buckets(df: DataFrame, lead: list | None = None) -> DataFrame:
        lead = lead or []
        return (
            ensure_parallelism(df)
            .select(
                *lead,
                F.explode(F.split(F.col(text_col), " ")).alias("_w"),
            )
            .filter(F.col("_w") != "")
            .select(
                *lead,
                (
                    F.conv(
                        F.substring(F.md5(F.col("_w")), 1, 15), 16, 10
                    ).cast("long")
                    % dim
                ).alias("_b"),
            )
        )

    t_counts = buckets(target).groupBy("_b").agg(
        F.count(F.lit(1)).alias("_tc")
    )
    r_counts = buckets(raw).groupBy("_b").agg(
        F.count(F.lit(1)).alias("_rc")
    )
    t_total = buckets(target).count()
    r_total = buckets(raw).count()
    spark = docs.sparkSession
    table = (
        spark.range(dim).select(F.col("id").alias("_b"))
        .join(t_counts, "_b", "left")
        .join(r_counts, "_b", "left")
        .select(
            "_b",
            F.floor(
                (
                    F.log2(
                        (F.coalesce(F.col("_tc"), F.lit(0)) + F.lit(0.5))
                        / F.lit(t_total + 0.5 * dim)
                    )
                    - F.log2(
                        (F.coalesce(F.col("_rc"), F.lit(0)) + F.lit(0.5))
                        / F.lit(r_total + 0.5 * dim)
                    )
                )
                * F.lit(1e6)
                + F.lit(0.5)
            ).cast("long").alias("_lr_u6"),
        )
    )
    doc_counts = buckets(docs, [F.col(id_col)]).groupBy(
        id_col, "_b"
    ).agg(F.count(F.lit(1)).alias("_c"))
    return (
        doc_counts.join(F.broadcast(table), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_tokens"),
            F.sum(F.col("_c") * F.col("_lr_u6")).alias("dsir_logw_u6"),
            F.round(
                F.sum(F.col("_c") * F.col("_lr_u6"))
                / F.lit(1e6)
                / F.sum("_c"),
                4,
            ).alias("bits_per_token"),
        )
    )


def perplexity_bucket_sample(
    docs: DataFrame,
    train: DataFrame,
    rates: tuple = (1.0, 0.5, 0.0),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet's perplexity-bucket selection (Wenzek et al. 2020): rank
    every document by bits-per-bigram under a frozen LM trained on
    the reference corpus, split the ranking into equal-count
    head/middle/tail terciles, and keep each bucket at its own rate —
    the canonical "keep what reads like Wikipedia, downsample the
    middle, drop the tail" gate (CCNet keeps head+middle; the exact
    rates are policy, exposed as ``rates``).

    Determinism: the tercile is an exact NTILE over (bits, id) —
    computed as :func:`~.layout._exact_ntile` (per-bucket parallel
    ranking, r12; engine-identical to the window form) — bits are
    the micro-unit-exact values of the certified scoring row, so the
    ordering is engine-identical, and ties break on the id; the
    per-bucket keep is the md5 gate of :func:`hash_split` (never
    ``rand()``). Returns kept rows only:
    ``(id, n_bigrams, bits_per_bigram, bucket)`` with bucket ∈
    {'head', 'middle', 'tail'}.

    Scale shape: scoring is the LM row's broadcast-join pass; the
    tercile is ONE measurement sort over (doc, bits) pairs — doc-count
    rows, not corpus text (at 100 TB: ids + one double per doc; the
    write path's distributed equivalent is repartitionByRange on the
    score, same as the curve-locality row's tiling note)."""
    from .text import bigram_lm_fit, bigram_lm_score

    if len(rates) != 3:
        raise ValueError("rates must be (head, middle, tail)")
    model = bigram_lm_fit(train, text_col=text_col)
    # the scored table is (id, n_bigrams, bits) — doc-count rows, not
    # corpus text; cut it once because the parallel ntile below reads
    # it twice (ranking + bucket counts) and the scoring pipeline
    # (bigram explode + two broadcast joins) must not run per consumer
    scored = bigram_lm_score(
        docs, model, text_col=text_col, id_col=id_col
    ).localCheckpoint(eager=True)
    # r12 optimization round: the tercile ran as ntile(3) OVER one
    # GLOBAL window — every doc's score row through ONE task (guide
    # §2.5); _exact_ntile ranks in parallel within order-consistent
    # buckets instead. floor(bits*16) is a monotone coarsening of the
    # leading sort key, and its cardinality is model-bounded: bits-
    # per-bigram <= log2((max_c1 + kd*v)/kd), i.e. a few hundred
    # sixteenth-bit buckets for any real LM, independent of doc count.
    from .layout import _exact_ntile

    bucketed = _exact_ntile(
        scored,
        [F.col("bits_per_bigram"), F.col(id_col)],
        3,
        bucket=F.floor(F.col("bits_per_bigram") * 16).cast("long"),
        out_col="_t",
    ).withColumn(
        "bucket",
        F.when(F.col("_t") == 1, F.lit("head"))
        .when(F.col("_t") == 2, F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
    gate = _hash_bucket(F.col(id_col), 100, ":ccnet")
    keep = (
        F.when(F.col("_t") == 1, F.lit(int(rates[0] * 100)))
        .when(F.col("_t") == 2, F.lit(int(rates[1] * 100)))
        .otherwise(F.lit(int(rates[2] * 100)))
    )
    return (
        bucketed.filter(gate < keep)
        .select(id_col, "n_bigrams", "bits_per_bigram", "bucket")
    )
