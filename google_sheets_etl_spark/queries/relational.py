"""Query registry — relational section (split from the former
queries.py; see queries/__init__.py for the package map
and _core for shared helpers)."""

from ._core import *  # noqa: F401,F403 — shared registry/helpers

# =====================================================================
# Flagship relational queries (TPC-H-shaped, same primitives at scale)
# =====================================================================

@q(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              ROUND(SUM(l_quantity), 2) AS sum_qty,
              ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
              COUNT(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
       GROUP BY l_returnflag, l_linestatus""",
)
def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy partial aggregation; predicate and
    4-column projection push to the parquet scan."""
    li = t(spark, sf, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@q(
    "q3_shipping_priority",
    """SELECT l_orderkey,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              o_orderdate, o_orderpriority
       FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-03-15'
         AND l_shipdate > TIMESTAMP '1998-03-15'
       GROUP BY l_orderkey, o_orderdate, o_orderpriority
       ORDER BY revenue DESC, l_orderkey LIMIT 10""",
)
def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → top-k."""
    c = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15"))
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@q(
    "q5_region_revenue",
    """SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM customer
         JOIN orders   ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
       GROUP BY n_name""",
)
def q5_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: star join with small dims broadcast; only the
    orders⋈lineitem join shuffles."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@q(
    "q6_forecast_revenue",
    """SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
       FROM lineitem
       WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
         AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""",
)
def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: every predicate reaches the parquet scan
    (PushedFilters) and only 4 columns are read — the pure
    pushdown-and-prune aggregate."""
    li = t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount").between(0.04, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue")
        )
    )


@q(
    "q4_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS n_orders
       FROM orders o
       WHERE EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey
                       AND l.l_returnflag = 'R')
       GROUP BY o_orderpriority""",
)
def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape (predicate adapted to this corpus's lineitem
    columns): EXISTS as a left-semi join — the probe side is
    pre-filtered and deduplicated map-side by the semi-join itself
    (no distinct needed)."""
    o = t(spark, sf, "orders")
    returned = t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@q(
    "window_running_revenue",
    """SELECT o_custkey, o_orderkey,
              ROUND(SUM(o_totalprice) OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                AS running_total
       FROM orders""",
)
def window_running_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Analytic window: per-customer cumulative revenue. One exchange
    on the partition key, linear per-partition pass; deterministic
    (o_orderdate, o_orderkey) ordering."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@q(
    "matview_incremental_revenue",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
              ROUND(SUM(l_quantity), 2) AS sum_qty,
              ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
              epoch_us(MIN(l_shipdate)) AS min_ship_us,
              epoch_us(MAX(l_shipdate)) AS max_ship_us,
              ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_qty
       FROM lineitem GROUP BY 1, 2""",
)
def matview_incremental_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance
    (plans/matview.py): the standing rollup is kept in MERGEABLE form
    (count/sum/min/max), each new load is summarized down to keyspace
    scale, and summaries merge cell-wise — history is never rescanned.
    Here three disjoint 'loads' (orderkey mod-4 slices 0+2 as the
    standing table, 1 and 3 as two later deltas) are summarized
    independently and three-way merged; the oracle aggregates all raw
    rows in ONE pass — certifying the merge algebra (count cells ADD,
    min/max survive reordering) and the read-time avg derivation
    (avg = sum/n, never stored). Per load the cost is one delta scan
    + a keyspace-sized re-aggregation; at 100 TB the summaries are
    what lands per load (idempotent overwrite keyed by load id — the
    streaming-CMS discipline) and the standing table is their fold."""
    from ..plans import matview

    li = t(spark, sf, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    ms = {
        "n": matview.Measure("count"),
        "sum_qty": matview.Measure("sum", "l_quantity"),
        "sum_base_price": matview.Measure("sum", "l_extendedprice"),
        "min_ship": matview.Measure("min", "l_shipdate"),
        "max_ship": matview.Measure("max", "l_shipdate"),
    }
    loads = [
        matview.summarize(
            li.filter(F.col("l_orderkey") % 4 == m), keys, ms
        )
        for m in (0, 1, 3)
    ]
    standing = matview.summarize(
        li.filter(F.col("l_orderkey") % 4 == 2), keys, ms
    )
    merged = matview.merge([standing, *loads], keys, ms)
    return merged.select(
        *keys,
        "n",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("sum_base_price", 2).alias("sum_base_price"),
        # l_shipdate may arrive NTZ: wall-clock == UTC instant under
        # the pinned UTC session, so the cast is instant-preserving
        F.unix_micros(F.col("min_ship").cast("timestamp"))
        .alias("min_ship_us"),
        F.unix_micros(F.col("max_ship").cast("timestamp"))
        .alias("max_ship_us"),
        F.round(F.col("sum_qty") / F.col("n"), 6).alias("avg_qty"),
    )


@q(
    "matview_approx_distinct",
    """SELECT event_type, COUNT(*) AS n,
              COUNT(DISTINCT user_id)::BIGINT AS exact_distinct,
              TRUE AS merge_ok
       FROM events GROUP BY 1""",
)
def matview_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """COUNT DISTINCT made mergeable (plans/matview.py
    ``approx_distinct`` — the measure kind that closes the classic
    incremental-aggregate gap: distinct counts don't add, but their
    HLL sketches UNION losslessly): three disjoint event loads are
    summarized independently, each carrying a per-type
    distinct-users sketch cell, merged cell-wise like any other
    measure, and estimated at read time. ``merge_ok`` asserts the
    merged estimate lands within ±10% of exact (lgK=12 ~1.6% rsd) —
    a red row means the sketch path or its merge broke contract.
    Per load: one summary scan; the standing card never rescans
    history for its distinct counts."""
    from ..plans import matview

    ev = t(spark, sf, "events").select(
        "event_id", "event_type", "user_id"
    )
    keys = ["event_type"]
    ms = {
        "n": matview.Measure("count"),
        "du": matview.Measure("approx_distinct", "user_id"),
    }
    loads = [
        matview.summarize(
            ev.filter(F.col("event_id") % 3 == m), keys, ms
        )
        for m in (0, 1, 2)
    ]
    merged = matview.merge(loads, keys, ms)
    exact = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
    )
    est = merged.select(
        "event_type", "n",
        matview.estimate_distinct(merged, "du").alias("_est"),
    )
    joined = est.join(exact, "event_type")
    ok = (
        F.abs(F.col("_est") - F.col("exact_distinct"))
        <= F.lit(0.10) * F.col("exact_distinct")
    )
    return joined.select(
        "event_type", "n", "exact_distinct", ok.alias("merge_ok")
    )


@q(
    "rollup_order_revenue",
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
              coalesce(o_orderpriority, 'ALL') AS priority,
              COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS revenue
       FROM orders
       GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
)
def rollup_order_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP — one pass, grouping-set
    expansion handled by the engine (no self-union of aggregates)."""
    return (
        t(spark, sf, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "revenue",
        )
    )


@q(
    "q10_returned_items",
    """SELECT c_custkey, c_name,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON l_orderkey = o_orderkey
       WHERE l_returnflag = 'R'
       GROUP BY c_custkey, c_name
       ORDER BY revenue DESC, c_custkey LIMIT 20""",
)
def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: fact-side filter → two-level join → grouped
    top-k. The lineitem filter is pushed to the scan; customer joins
    after the aggregate has already shrunk the stream to ≤ one row
    per (custkey) — join small, not wide."""
    c = t(spark, sf, "customer").select("c_custkey", "c_name")
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = (
        t(spark, sf, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev_raw")
        )
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", F.round("rev_raw", 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@q(
    "q14_promo_revenue_pct",
    """SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                     THEN l_extendedprice * (1 - l_discount)
                                     ELSE 0 END)
                    / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'""",
)
def q14_promo_revenue_pct(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a broadcast dim
    join — part is the small side, no shuffle of lineitem."""
    p = t(spark, sf, "part").select("p_partkey", "p_type")
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                4,
            ).alias("promo_pct")
        )
    )


@q(
    "q18_large_volume_customers",
    """SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
              ROUND(SUM(l_quantity), 2) AS total_qty
       FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON o_orderkey = l_orderkey
       GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
       HAVING SUM(l_quantity) > 250""",
)
def q18_large_volume_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a grouped fact — the quantity
    aggregate runs on lineitem alone (partial map-side combine), the
    survivor set (~tens of rows) then joins to orders/customer. The
    threshold compares the *unrounded* sum: l_quantity values are
    integral doubles, so the sum is exact in both engines."""
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_raw"))
        .filter(F.col("qty_raw") > 250)
    )
    o = t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = t(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        F.broadcast(big)
        .join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            F.round("qty_raw", 2).alias("total_qty"),
        )
    )


@q(
    "q19_bracketed_revenue",
    """SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 25
              AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#9'  AND p_size BETWEEN 1 AND 35
              AND l_quantity BETWEEN 20 AND 30)""",
)
def q19_bracketed_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-table predicate. The part
    side is pre-filtered to the union of brands (pushed to its scan)
    and broadcast; the OR residual evaluates post-join inside
    whole-stage codegen."""
    p = t(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    li = t(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    brand_pred = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    p_pre = p.filter(F.col("p_brand").isin("Brand#12", "Brand#24", "Brand#9"))
    return (
        li.join(F.broadcast(p_pre), li.l_partkey == p_pre.p_partkey)
        .filter(brand_pred)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@q(
    "q7_nation_volume",
    """SELECT supp_nation, cust_nation, l_year,
              ROUND(SUM(volume), 2) AS revenue
       FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                    EXTRACT(year FROM l_shipdate) AS l_year,
                    l_extendedprice * (1 - l_discount) AS volume
             FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                  JOIN orders ON o_orderkey = l_orderkey
                  JOIN customer ON c_custkey = o_custkey
                  JOIN nation n1 ON s_nationkey = n1.n_nationkey
                  JOIN nation n2 ON c_nationkey = n2.n_nationkey
             WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
       GROUP BY supp_nation, cust_nation, l_year""",
)
def q7_nation_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume by year. Both nation
    dims and the (pre-filtered) supplier dim broadcast; the only
    shuffles are lineitem⋈orders and the final 4-group aggregate."""
    n = t(spark, sf, "nation").filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    s1 = s.join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
    c2 = c.join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
    return (
        li.join(F.broadcast(s1), li.l_suppkey == s1.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c2, o.o_custkey == c2.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@q(
    "cube_lineitem_status",
    """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
              coalesce(l_linestatus, 'ALL') AS lstatus,
              COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS gross
       FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
)
def cube_lineitem_status(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE grouping sets: all 2^2 subtotal combinations in one pass —
    the engine expands grouping sets; no self-union of aggregates."""
    return (
        t(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("gross"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "n",
            "gross",
        )
    )


@q(
    "pivot_daily_event_value",
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
              ROUND(SUM(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
              ROUND(SUM(CASE WHEN event_type = 'view'     THEN value END), 2) AS view,
              ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
              ROUND(SUM(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
              ROUND(SUM(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup
       FROM events GROUP BY day""",
)
def pivot_daily_event_value(spark: SparkSession, sf: str) -> DataFrame:
    """PIVOT: daily value by event type as columns. Explicit pivot
    values keep it one pass (no extra distinct-values job); nulls
    where a type is absent that day, matching SUM(CASE...) with no
    ELSE."""
    ev = t(spark, sf, "events")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", ["click", "view", "purchase", "error", "signup"])
        .agg(F.round(F.sum("value"), 2))
    )


@q(
    "top_supplier_per_nation",
    """SELECT n_name, s_suppkey AS best_supp, s_acctbal AS best_acctbal
       FROM (SELECT n_name, s_suppkey, s_acctbal,
                    ROW_NUMBER() OVER (PARTITION BY n_nationkey
                                       ORDER BY s_acctbal DESC, s_suppkey) AS rn
             FROM supplier JOIN nation ON s_nationkey = n_nationkey) t
       WHERE rn = 1""",
)
def top_supplier_per_nation(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 flavor (argmax-per-group; this corpus has no partsupp):
    best supplier per nation via ranking window with a deterministic
    tie-break. One exchange on the group key; float passes through
    unrounded (stored value, bit-identical across engines)."""
    s = t(spark, sf, "supplier")
    n = t(spark, sf, "nation")
    w = Window.partitionBy("n_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "n_name",
            F.col("s_suppkey").alias("best_supp"),
            F.col("s_acctbal").alias("best_acctbal"),
        )
    )


@q(
    "events_asof_error",
    """SELECT l.event_id, l.user_id,
              COALESCE(r.event_id, -1) AS prior_event_id,
              COALESCE(r.value, -1.0) AS prior_value
       FROM (SELECT * FROM events WHERE event_type = 'click') l
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
         ON l.user_id = r.user_id AND l.ts >= r.ts""",
)
def events_asof_error(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each click annotated with the user's most recent
    error at-or-before it (union–carry-forward; one shuffle on the
    key). DuckDB's native ASOF JOIN is the oracle. No-match rows
    coalesce to -1 sentinels on BOTH engines: a nullable BIGINT column
    round-trips through the harness's pandas fetch as float64+NaN and
    can never value-match Spark's long+NULL."""
    ev = t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    errors = ev.filter(F.col("event_type") == "error")
    joined = asof.as_of_join(
        clicks.select("event_id", "user_id", "ts"),
        errors.select("user_id", "ts", "event_id", "value"),
        key="user_id",
        payload_cols=["event_id", "value"],
        prefix="prior_",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.coalesce(F.col("prior_event_id"), F.lit(-1)).alias("prior_event_id"),
        F.coalesce(F.col("prior_value"), F.lit(-1.0)).alias("prior_value"),
    )


@q(
    "range_join_clicks_after_error",
    """SELECT r.event_id AS err_event_id, COUNT(*) AS n_clicks
       FROM events l JOIN events r
         ON l.user_id = r.user_id
        AND l.event_type = 'click' AND r.event_type = 'error'
        AND l.ts >= r.ts AND l.ts <= r.ts + INTERVAL 1 HOUR
       GROUP BY r.event_id""",
)
def range_join_clicks_after_error(spark: SparkSession, sf: str) -> DataFrame:
    """Range join: clicks within one hour after each error, per user —
    bucketized equi-join + exact filter (see
    operators.asof.point_in_interval_join), never a nested loop."""
    ev = t(spark, sf, "events")
    points = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    intervals = (
        ev.filter(F.col("event_type") == "error")
        .select(
            "user_id",
            F.col("event_id").alias("err_event_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
        )
    )
    return (
        asof.point_in_interval_join(
            points, intervals, key="user_id",
            point_time="ts", start="start_ts", end="end_ts",
        )
        .groupBy("err_event_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )


@q(
    "distinct_users_by_type",
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
       FROM events GROUP BY event_type""",
)
def distinct_users_by_type(spark: SparkSession, sf: str) -> DataFrame:
    """COUNT(DISTINCT) — two-phase (partial distinct map-side) under
    AQE; the exact counterpart of approx_count_distinct at scale."""
    return (
        t(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.count_distinct(F.col("user_id")).alias("n_users"))
    )


@q(
    "users_clicked_and_errored",
    """SELECT user_id FROM events WHERE event_type = 'click'
       INTERSECT
       SELECT user_id FROM events WHERE event_type = 'error'""",
)
def users_clicked_and_errored(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT — planned as an aggregate + semi-join, one shuffle."""
    ev = t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    errors = ev.filter(F.col("event_type") == "error").select("user_id")
    return clicks.intersect(errors)


@q(
    "orders_without_lineitems",
    """SELECT o_orderkey FROM orders
       EXCEPT
       SELECT l_orderkey AS o_orderkey FROM lineitem""",
)
def orders_without_lineitems(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT — distinct + anti-join in one plan (non-empty on this
    corpus: some orders carry no lineitems)."""
    o = t(spark, sf, "orders").select("o_orderkey")
    li = t(spark, sf, "lineitem").select(F.col("l_orderkey").alias("o_orderkey"))
    return o.subtract(li)


@q(
    "mktsegment_stats",
    """SELECT c_mktsegment, COUNT(*) AS n_customers,
              ROUND(SUM(c_acctbal), 2) AS acctbal_sum
       FROM customer GROUP BY c_mktsegment""",
)
def mktsegment_stats(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("acctbal_sum"),
        )
    )


@q(
    "q13_order_count_histogram",
    """SELECT c_count, COUNT(*) AS custdist
       FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
             FROM customer c LEFT JOIN orders o
               ON c.c_custkey = o.o_custkey
              AND o.o_orderpriority <> '1-URGENT'
             GROUP BY c.c_custkey) cc
       GROUP BY c_count""",
)
def q13_order_count_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with a join-side residual predicate,
    then a double aggregation (per-customer count → histogram of
    counts). The second groupBy's cardinality is tiny (distinct order
    counts), so the expensive shuffle is only the first one, keyed on
    the uniform c_custkey."""
    c = t(spark, sf, "customer").select("c_custkey")
    o = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@q(
    "q22_idle_rich_customers",
    """SELECT c_mktsegment AS segment, COUNT(*) AS numcust,
              ROUND(SUM(c_acctbal), 2) AS totacctbal
       FROM customer c
       WHERE c_acctbal > (SELECT ROUND(AVG(c_acctbal), 4) FROM customer
                          WHERE c_acctbal > 0.0)
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderpriority = '1-URGENT')
       GROUP BY c_mktsegment""",
)
def q22_idle_rich_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: global-average scalar subquery (one-row
    broadcast, no per-row recompute) + anti-join against the fact
    table + final aggregate. The scalar side is a cross join with a
    1-row DataFrame — Catalyst plans BroadcastNestedLoopJoin, so the
    customer scan streams once."""
    cust = t(spark, sf, "customer")
    o = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    # threshold rounded to 4 dp on BOTH engines: a raw float AVG's last
    # ulps depend on summation order, and a customer sitting between
    # the two engines' averages would flip row membership — the same
    # float-aggregate convention every other oracle follows
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).select(
        F.round(F.avg("c_acctbal"), 4).alias("_avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, cust.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@q(
    "q15_top_revenue_supplier",
    """WITH rev AS (SELECT l_suppkey AS supplier_no,
                           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                               AS total_revenue
                    FROM lineitem
                    WHERE l_shipdate >= DATE '1996-01-01'
                      AND l_shipdate < DATE '1996-04-01'
                    GROUP BY l_suppkey)
       SELECT s_suppkey, s_name, total_revenue
       FROM supplier JOIN rev ON s_suppkey = supplier_no
       WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)""",
)
def q15_top_revenue_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: the scalar max over the revenue aggregate is
    an empty-frame window max on the SAME aggregate output — one
    lineitem scan, one shuffle, no persist/cache barrier (the window's
    single-partition exchange carries one rounded double per supplier,
    not lineitem rows). Comparison is on the *rounded* revenue in both
    engines (bit-stable equality)."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    w = Window.partitionBy()  # global frame over the per-supplier aggregate
    s = t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.withColumn("_max_rev", F.max("total_revenue").over(w))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@q(
    "q8_market_share",
    """SELECT o_year,
              ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                    / SUM(volume), 4) AS mkt_share
       FROM (SELECT EXTRACT(year FROM o_orderdate) AS o_year,
                    l_extendedprice * (1 - l_discount) AS volume,
                    n2.n_name AS nation
             FROM part JOIN lineitem ON p_partkey = l_partkey
                  JOIN supplier ON s_suppkey = l_suppkey
                  JOIN orders ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation n1 ON c_nationkey = n1.n_nationkey
                  JOIN region ON n1.n_regionkey = r_regionkey
                  JOIN nation n2 ON s_nationkey = n2.n_nationkey
             WHERE r_name = 'ASIA' AND p_type = 'PROMO') v
       GROUP BY o_year""",
)
def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of regional revenue
    per year. Seven-table join where every dimension (part, supplier,
    customer-in-region, both nation roles) broadcasts; the fact tables
    meet in a single lineitem⋈orders shuffle. The share is a
    conditional-sum ratio in one aggregate pass — no self-join."""
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    # customers restricted to the target region (filter pushed through
    # the two-level dim join before it ever meets a fact table)
    cust_in_region = (
        t(spark, sf, "customer")
        .join(
            F.broadcast(
                n.join(
                    F.broadcast(r), n.n_regionkey == r.r_regionkey
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    p = t(spark, sf, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    supp_nation = (
        t(spark, sf, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_in_region), o.o_custkey == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@q(
    "q9_profit_by_nation_year",
    """SELECT nation, o_year,
              CAST(ROUND(SUM(CAST(amount AS DECIMAL(18,4))), 2) AS DOUBLE)
                  AS sum_profit
       FROM (SELECT n_name AS nation,
                    EXTRACT(year FROM o_orderdate) AS o_year,
                    l_extendedprice * (1 - l_discount)
                      - 0.1 * p_retailprice * l_quantity AS amount
             FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                  JOIN part ON p_partkey = l_partkey
                  JOIN orders ON o_orderkey = l_orderkey
                  JOIN nation ON s_nationkey = n_nationkey
             WHERE p_name LIKE '%widget%') profit
       GROUP BY nation, o_year""",
)
def q9_profit_by_nation_year(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape (supply cost proxied as 10% of retail price — the
    corpus has no partsupp table): profit by supplier nation and order
    year. part/supplier/nation broadcast; lineitem⋈orders is the one
    big shuffle; the LIKE filter prunes parts before the fact join.

    The mixed-sign per-row amounts make the float sum land exactly on
    a cent boundary for some groups, where summation order flips the
    rounded digit — so the aggregate runs over exact DECIMAL(18,4)
    (identical per-row doubles → identical decimal quantization →
    order-independent exact sum in both engines)."""
    p = (
        t(spark, sf, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    sn = (
        t(spark, sf, "supplier")
        .join(
            F.broadcast(t(spark, sf, "nation").select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.cast("decimal(18,4)").alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.round(F.sum("amount"), 2).cast("double").alias("sum_profit")
        )
    )


@q(
    "q12_late_shipment_priority",
    """SELECT l_linestatus,
              CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       WHERE epoch_us(l_shipdate) > epoch_us(o_orderdate) + 5184000000000
       GROUP BY l_linestatus""",
)
def q12_late_shipment_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (ship-vs-commit lateness proxied by
    shipdate > orderdate + 60d — the corpus has no commit/receipt
    dates): join + cross-table predicate + conditional counts. The
    lateness predicate references both sides, so it runs post-join;
    everything else is one shuffle and a 2-group aggregate.

    Cross-engine contract notes (the r01 hash mismatch): the lateness
    boundary is exact integer µs arithmetic on BOTH engines (interval
    day-addition on timestamps is session-timezone-dependent in Spark),
    and DuckDB's ``SUM(int)`` (HUGEINT → float64 via pandas) is cast
    back to BIGINT to match Spark's long."""
    o = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ntz = dict(o.dtypes)["o_orderdate"] == "timestamp_ntz"
    # epoch µs of a naive timestamp: unix_micros needs TimestampType;
    # for NTZ columns, to_utc_timestamp-free exact epochs come from
    # casting through TimestampType in UTC — t() pinned the session tz,
    # but stay integer-exact regardless by casting NTZ → long µs.
    def epoch_us(col: str) -> F.Column:
        c = F.col(col)
        if ntz:
            # NTZ has no tz to adjust: its wall-clock == UTC instant
            c = c.cast("timestamp")
        return F.unix_micros(c)

    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(
            epoch_us("l_shipdate")
            > epoch_us("o_orderdate") + F.lit(60 * 86400 * 1000000)
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )
