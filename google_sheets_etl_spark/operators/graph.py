"""Distributed graph analytics over edge-list DataFrames.

PageRank here is the classic synchronous power iteration (Page,
Brin, Motwani, Winograd 1999), expressed as the standard
Spark/Pregel join-aggregate shape: per iteration, ranks join the
edge list on ``src`` (one shuffle, or ZERO exchanges when ranks and
edges are co-partitioned on ``src``), contributions partial-aggregate
on ``dst`` (map-side combined), and a left join back onto the node
set restores zero-in-degree nodes at the teleport floor. Nothing is
ever collected — the rank vector lives as a DataFrame end to end, so
the operator's ceiling is the cluster's, not the driver's.

Exactness contract: ranks are int64 **pico-units** (total initial
mass 10^12) and every step is integer arithmetic — ``div`` for the
per-edge split and the damping factor 85/100 — so the fixpoint
trajectory is bit-identical on any engine, any partitioning, any
parallelism (float PageRank would drift across summation orders;
the floor losses are deterministic and identical everywhere).
Dangling mass (out-degree-0 nodes) deliberately evaporates, exactly
as the SQL twin specifies; callers wanting the textbook
redistribution add a dangling term the same integer way.

Reference parity note: the reference engine (PHP ETL, see
``GoogleSheetsAgent.php``) has no graph surface — this module is
part of the training-data-pipeline extension set (link-graph
authority scoring for crawl/document corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: total initial rank mass: 10^12 integer pico-units.
MASS = 1_000_000_000_000


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 6,
    damping_pct: int = 85,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    materialize_every: int = 3,
) -> DataFrame:
    """``n_iter`` synchronous PageRank iterations in exact int64
    pico-units; returns ``(node, r)``.

    Shape per iteration: ranks ⋈ edges on src (hash join; at 100 TB
    pre-bucket both on src for a zero-exchange join), contributions
    ``r div out_degree`` partial-aggregated on dst, node-set left
    join restores sources nobody links to. The out-degree is folded
    into the edge list ONCE up front (it never changes), so each
    iteration is exactly one join + one aggregate + one restore join.
    ``n_iter`` is a small constant, so lineage stays bounded; the
    rank vector is persisted+materialized every ``materialize_every``
    iterations — on a big cluster each eager cut costs a full job
    launch, and a few lazily-chained iterations amortize that while
    keeping the plan shallow enough for Catalyst (set it to 1 for the
    classic checkpoint-per-step cadence, or higher when iterations
    are cheap relative to job overhead).
    """
    if materialize_every < 1:
        raise ValueError(
            "pagerank: materialize_every must be >= 1 (got "
            f"{materialize_every}); 1 = checkpoint every iteration, "
            "larger values amortize job-launch cost"
        )
    # r12: materialization switched from persist()+count() to eager
    # (local)checkpoint — the SAME single job per cut, but the
    # logical plan is TRUNCATED. persist stops recomputation yet
    # Catalyst still re-analyzes the full accumulated lineage at
    # every action: with an expensive edge derivation (the kNN build
    # in simgraph_pagerank) the 6-iteration final plan measured 384 KB
    # of explain text, and per-action planning dominated wall-clock
    # (guide §3.3: materialise to truncate; §7.3's
    # Optimizer/RuleExecutor signature). Blocks of superseded rounds
    # are freed explicitly (unpersist is a no-op on checkpoint
    # blocks, which belong to the RDD, not the cache manager).
    sc = nodes.sparkSession.sparkContext
    jsc = sc._jsc.sc()
    use_reliable = sc.getCheckpointDir() is not None

    def _pids() -> set:
        m = jsc.getPersistentRDDs()
        it = m.keysIterator()
        out = set()
        while it.hasNext():
            out.add(it.next())
        return out

    def _cut(df: DataFrame) -> tuple[DataFrame, set]:
        before = _pids()
        cut = (df.checkpoint(eager=True) if use_reliable
               else df.localCheckpoint(eager=True))
        return cut, _pids() - before

    def _free(ids: set) -> None:
        for rid in ids:
            jsc.unpersistRDD(rid, False)

    n = nodes.select(F.col(node_col).alias("node"))
    # materialize the weighted edge list ONCE — the iteration loop
    # joins it n_iter times, and an expensive edge derivation (a kNN
    # build, a candidate join) must not re-run per iteration; folding
    # out_deg in here removes a per-iteration join entirely
    e0 = edges.select(
        F.col(src_col).alias("node"), F.col(dst_col).alias("dst")
    )
    deg = e0.groupBy("node").agg(F.count(F.lit(1)).alias("out_deg"))
    e, e_ids = _cut(e0.join(deg, "node"))

    # the node set (with the broadcast count) anchors every
    # iteration's restore join — materialize it once instead of
    # re-scanning the node source per iteration
    init, init_ids = _cut(
        n.crossJoin(
            F.broadcast(n.agg(F.count(F.lit(1)).alias("_n")))
        ).select("node", F.expr(f"{MASS}L div _n").alias("r"), "_n")
    )
    teleport = F.expr(f"(({100 - damping_pct}) * ({MASS}L div _n)) div 100")

    ranks = init
    kept_ids: set = set()
    for i in range(n_iter):
        contrib = (
            ranks.select("node", "r")
            .join(e, "node")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("r div out_deg")).alias("s"))
        )
        ranks = (
            init.select("node", "_n")
            .join(contrib, "node", "left")
            .select(
                "node",
                (teleport + F.expr(
                    f"({damping_pct} * coalesce(s, 0L)) div 100"
                )).alias("r"),
                "_n",
            )
        )
        if (i + 1) % materialize_every == 0 and i + 1 < n_iter:
            ranks, nxt_ids = _cut(ranks)
            _free(kept_ids)
            kept_ids = nxt_ids
    out, _ = _cut(ranks.select("node", "r"))
    _free(kept_ids)
    _free(e_ids)
    _free(init_ids)
    return out


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node TRIANGLE counts over an undirected edge list — the
    clustering-density primitive (community detection, dedup-cluster
    diagnostics, spam-graph features). Input edges are canonicalized
    (src < dst, distinct) so each undirected edge appears once; each
    triangle {a < b < c} is then enumerated EXACTLY once as the
    ordered wedge (a,b)+(b,c) closed by the probe edge (a,c), and
    contributes 1 to each of its three corners.

    Scale shape: two equi-joins on node keys — the wedge join fans
    out Σ_b d⁻(b)·d⁺(b) rows (id-ordering splits each node's degree,
    the standard ~4× wedge reduction vs unordered; production systems
    order by DEGREE instead, which this operator accepts by relabeled
    input), and the closing probe is a hash join against the edge
    list itself. No state, no iteration, no driver participation —
    at 100 TB the edge list pre-buckets on the join keys and both
    joins are co-partitioned."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    wedges = (
        e.select(F.col("a").alias("wa"), F.col("b").alias("wb"))
        .join(
            e.select(F.col("a").alias("wb"), F.col("b").alias("wc")),
            on="wb",
        )
    )
    tri = wedges.join(
        e.select(F.col("a").alias("wa"), F.col("b").alias("wc")),
        on=["wa", "wc"],
    )
    return (
        tri.select(
            F.explode(F.array("wa", "wb", "wc")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
