"""Analytic join/aggregation queries over the TPC-H-ish star schema.

The reference has no relational joins (SURVEY §2.5 — its J1/J2 are
latest-value lookup joins), but exposing the archived event tables to SQL
is explicitly the point of its Hive sink (HiveQueryExecutor.java:39-48).
These queries are the engine's general analytic surface over such archive
tables, written the way they should run on 100 TB:

- **Dimension joins are broadcast.**  region/nation/customer/supplier/part
  are the small side at any realistic scale ratio; `F.broadcast()` pins a
  BroadcastHashJoin so the fact table never shuffles for enrichment.
- **Fact-fact joins (orders⋈lineitem) shuffle on the join key** — that is
  the one unavoidable shuffle; AQE handles skew.  On a curated lakehouse
  both sides would be bucketed by orderkey, removing it entirely
  (sinks/archive.py::write_bucketed; shuffle-freeness pinned by
  tests/test_sinks_frames.py::test_bucketed_join_is_shuffle_free).
- **Filters precede joins** textually and in the optimized plan
  (predicate pushdown into the parquet scan).
- **Aggregates are partial-first**: groupBy on post-join columns gets
  map-side combine for free.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from garmadon_spark.session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str):
    return load_table(spark, sf_dir, name)


# --- Q1-style pricing summary --------------------------------------------

def tpch_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy aggregate, no join.  Single shuffle on a
    2-value × 3-value grouping key; whole-stage-codegen'd arithmetic."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


TPCH_PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3-style shipping priority ------------------------------------------

def tpch_top_orders(spark, sf_dir):
    """Q3 shape: broadcast(customer-filter) ⋈ orders ⋈ lineitem, top-10
    revenue.  customer is broadcast (no shuffle of orders for the dim);
    orders⋈lineitem shuffles on orderkey; top-k via TakeOrdered."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


TPCH_TOP_ORDERS_SQL = """
SELECT l_orderkey, o_orderdate,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1999-01-01'
  AND l_shipdate > TIMESTAMP '1999-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- Q5-style regional revenue -------------------------------------------

def tpch_region_revenue(spark, sf_dir):
    """Q5 shape: 6-way join; every dimension (region→nation→customer,
    supplier) broadcast, lineitem⋈orders is the only shuffle join.
    The c_nationkey = s_nationkey correlation rides on the broadcast side.
    """
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")

    dim = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    cust_dim = cust.join(
        F.broadcast(dim), cust.c_nationkey == dim.n_nationkey
    ).select("c_custkey", "c_nationkey", "n_name")
    supp_dim = supp.select("s_suppkey", "s_nationkey")

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_dim), orders.o_custkey == cust_dim.c_custkey)
        .join(F.broadcast(supp_dim), li.l_suppkey == supp_dim.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


TPCH_REGION_REVENUE_SQL = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND c_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# --- Q4-style semi-join ---------------------------------------------------

def tpch_order_priority(spark, sf_dir):
    """Q4 shape: EXISTS ⇒ left-semi join.  Spark's left_semi avoids
    materializing the (huge) matched lineitem side — only orderkeys flow.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    returned = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


TPCH_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
"""


# --- Q13-style distribution ----------------------------------------------

def tpch_customer_distribution(spark, sf_dir):
    """Q13 shape: left outer join + two-level aggregation (orders per
    customer → customers per order-count).  The second agg's input is one
    row per customer — trivially small; only the first join shuffles."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


TPCH_CUSTOMER_DISTRIBUTION_SQL = """
WITH per_cust AS (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
"""


# --- Q10-style top returners ---------------------------------------------

def tpch_top_returners(spark, sf_dir):
    """Q10 shape: revenue lost to returns per customer, top 20.  nation is
    broadcast; orders⋈lineitem shuffles; customer⋈(agg result) is a
    broadcast of the *aggregated* side under AQE."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.round(F.max("c_acctbal"), 2).alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


TPCH_TOP_RETURNERS_SQL = """
SELECT c_custkey, c_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       ROUND(MAX(c_acctbal), 2) AS c_acctbal
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- window-function ranking ---------------------------------------------

def tpch_nation_top_suppliers(spark, sf_dir):
    """Per-nation top-3 suppliers by shipped revenue — dense ranking over a
    broadcast-enriched aggregate.  The window input is one row per
    supplier (post-agg), so the rank shuffle is tiny at any scale."""
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    enriched = rev.join(
        F.broadcast(supp), rev.l_suppkey == supp.s_suppkey
    ).join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    w = Window.partitionBy("n_name").orderBy(
        F.desc("revenue"), F.asc("s_suppkey")
    )
    return (
        enriched.select(
            "n_name",
            "s_name",
            "revenue",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 3)
    )


TPCH_NATION_TOP_SUPPLIERS_SQL = """
WITH rev AS (
    SELECT l_suppkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    GROUP BY l_suppkey
)
SELECT n_name, s_name, revenue, rank FROM (
    SELECT n_name, s_name, revenue,
           ROW_NUMBER() OVER (PARTITION BY n_name
                              ORDER BY revenue DESC, s_suppkey ASC) AS rank
    FROM rev, supplier, nation
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
) WHERE rank <= 3
"""


# --- Q7-style volume shipping --------------------------------------------

def tpch_volume_shipping(spark, sf_dir):
    """Q7 shape: revenue flowing between two nations by ship year, both
    directions.  supplier⋈nation and customer⋈nation are broadcast
    (dimension chains); lineitem⋈orders is the one fact-fact shuffle on
    orderkey.  The two-nation predicate is applied as a pair filter
    AFTER the joins (it references both sides) but the per-side nation
    filters are pushed into the broadcast dims, so only candidate rows
    reach the pair check."""
    nations = ("NATION_1", "NATION_2")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*nations))
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


TPCH_VOLUME_SHIPPING_SQL = """
SELECT supp_nation, cust_nation, ship_year,
       ROUND(SUM(volume), 2) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS ship_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
"""


# --- Q8-style market share ------------------------------------------------

def tpch_market_share(spark, sf_dir):
    """Q8 shape: NATION_1 suppliers' share of yearly revenue among
    EUROPE-region customers.  Conditional aggregation (share = sum(case)/sum)
    over the joined fact; all dimension chains broadcast."""
    nat = _t(spark, sf_dir, "nation")
    reg_nat = nat.join(
        F.broadcast(
            _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
        ),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(reg_nat),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat.filter(F.col("n_name") == "NATION_1")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
        .withColumn("is_target", F.lit(1))
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey, "left")
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("is_target") == 1, vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
        .orderBy("order_year")
    )


TPCH_MARKET_SHARE_SQL = """
SELECT order_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
             / SUM(volume), 4) AS mkt_share
FROM (
    SELECT EXTRACT(year FROM o_orderdate) AS order_year,
           l_extendedprice * (1 - l_discount) AS volume,
           n2.n_name AS supp_nation
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'EUROPE'
)
GROUP BY order_year
ORDER BY order_year
"""


# --- Q14-style promo revenue ----------------------------------------------

def tpch_promo_revenue(spark, sf_dir):
    """Q14 shape: promotion revenue share for one ship month.  part is
    broadcast; the date-range filter is pushed into the lineitem scan
    (min/max row-group stats skip everything outside the month)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-02-01"))
    )
    part = _t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("promo_revenue_pct")
        )
    )


TPCH_PROMO_REVENUE_SQL = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4)
       AS promo_revenue_pct
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-02-01'
"""


# --- Q19-style discounted revenue (disjunctive predicates) ----------------

def tpch_discounted_revenue(spark, sf_dir):
    """Q19 shape: revenue under an OR of brand/size/quantity branch
    predicates.  The disjunction references both sides, so it evaluates
    post-join, but each branch's part-only conjuncts could be pushed as
    a scan-level OR-filter on the broadcast dim; lineitem never
    shuffles (part is broadcast)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    b1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 20))
    )
    b2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(1, 30))
        & (F.col("l_quantity").between(10, 40))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(b1 | b2)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


TPCH_DISCOUNTED_REVENUE_SQL = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 1 AND 20)
    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30
        AND l_quantity BETWEEN 10 AND 40))
"""


def tpch_small_qty_revenue(spark, sf_dir):
    """Q17 shape — correlated per-group aggregate as a filter: yearly
    revenue lost to small orders of Brand#1 parts, where 'small' means
    quantity below 20 % of that part's average.

    Plan: the per-part averages are an aggregate of the fact table that
    is tiny (one row per part) — joined back BROADCAST, so the
    correlated-subquery shape costs one extra scan + a broadcast, not a
    shuffle join (at 100 TB the agg side is still part-cardinality)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    avg_qty = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_brand") == "Brand#1")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(avg_qty), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.count(F.lit(1)).alias("n_small_orders"),
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        )
    )


TPCH_SMALL_QTY_REVENUE_SQL = """
SELECT COUNT(*) AS n_small_orders,
       ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


def tpch_idle_customers(spark, sf_dir):
    """Q22 shape — anti-join + scalar subquery: well-funded customers
    (account balance above the positive-balance average) with NO urgent
    orders, grouped by market segment.  (Every fixture customer has
    SOME order, so the anti-join discriminates on the priority-filtered
    order set — a 0-row query would pass its oracle vacuously.)

    Plan: the scalar average is a one-row broadcast; the NOT EXISTS is
    a left_anti join on o_custkey — Spark's native anti-join, with the
    priority filter pushed to the orders scan before it."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("cut")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("cut"))
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


TPCH_IDLE_CUSTOMERS_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       ROUND(SUM(c_acctbal), 2) AS total_acctbal
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                     WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


# --- Q6-style filtered revenue --------------------------------------------

def tpch_filtered_revenue(spark, sf_dir):
    """Q6 shape: pure filter→global-aggregate, the predicate-pushdown
    benchmark.  Every predicate (date range, discount band, quantity cap)
    reaches the parquet scan as a PushedFilter; the aggregate is a
    map-side partial + single-row final — no data ever shuffles, only
    per-partition sums."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


TPCH_FILTERED_REVENUE_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --- Q9-style product-line profit -----------------------------------------

def tpch_nation_profit(spark, sf_dir):
    """Q9 shape: profit by supplier nation × ship year for one product
    line (substring match on part name), 4-way join.  The testdata has no
    partsupp table, so supply cost is proxied as 60 % of the part's
    retail price — deterministic and oracle-replicated, preserving the
    query SHAPE (fact ⋈ three broadcast dims, derived profit expression,
    two-level grouping) rather than the TPC-H constant.

    Plan: part is filtered BEFORE the broadcast (name predicate pushed to
    its scan), so the lineitem side is semi-filtered by the join itself;
    supplier and nation are broadcast; the single shuffle is the final
    nation×year aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - F.col("p_retailprice") * 0.6 * F.col("l_quantity")
                ),
                2,
            ).alias("sum_profit")
        )
    )


TPCH_NATION_PROFIT_SQL = """
SELECT n_name AS nation,
       EXTRACT(year FROM l_shipdate) AS o_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)
                 - p_retailprice * 0.6 * l_quantity), 2) AS sum_profit
FROM lineitem, part, supplier, nation
WHERE l_partkey = p_partkey
  AND l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey
  AND p_name LIKE '%red%'
GROUP BY n_name, EXTRACT(year FROM l_shipdate)
"""


# --- Q12-style conditional counts ------------------------------------------

def tpch_late_shipments(spark, sf_dir):
    """Q12 shape: conditional aggregation (CASE-WHEN counts) over the
    orders⋈lineitem join.  The testdata lineitem has no
    shipmode/commitdate/receiptdate, so "late" is l_shipdate more than
    90 days after o_orderdate, bucketed by ship year — same shape
    (fact-fact join, two branch counts per group), different predicate.

    Plan: one orderkey shuffle for the join (removed entirely on a
    bucketed archive), the lateness predicate evaluated post-join in
    codegen, one small shuffle for the per-year aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(late)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


TPCH_LATE_SHIPMENTS_SQL = """
SELECT EXTRACT(year FROM l_shipdate) AS ship_year,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem, orders
WHERE l_orderkey = o_orderkey
  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY EXTRACT(year FROM l_shipdate)
"""


# --- Q15-style max-over-aggregate ------------------------------------------

def tpch_top_supplier(spark, sf_dir):
    """Q15 shape: aggregate-then-argmax — quarterly revenue per supplier,
    return the supplier(s) hitting the global maximum (TPC-H's
    revenue-view + MAX subquery).

    Plan: one suppkey shuffle builds the per-supplier revenue table
    (supplier-cardinality rows); the global max is a one-row aggregate
    broadcast back over it, so the argmax costs no second full shuffle;
    supplier enrichment is a broadcast join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.col("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


TPCH_TOP_SUPPLIER_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue, supplier
WHERE l_suppkey = s_suppkey
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- Q18-style large-volume orders -----------------------------------------

def tpch_large_orders(spark, sf_dir):
    """Q18 shape: HAVING-filtered aggregate used as a semi-filter — orders
    whose total line quantity exceeds 300 (top ~0.5 % of the fixture
    distribution), enriched with customer and order detail.

    Plan: the quantity rollup is one orderkey shuffle producing a TINY
    surviving set; that set drives the orders join (orderkey shuffle,
    both removed on a bucketed archive) and customer is broadcast.  The
    big table is aggregated FIRST, never joined at full width."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


TPCH_LARGE_ORDERS_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 300
) big, orders, customer
WHERE big.l_orderkey = o_orderkey
  AND o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# --- Q21-style exists / not-exists -----------------------------------------

def tpch_waiting_suppliers(spark, sf_dir):
    """Q21 shape: the double-correlated EXISTS / NOT EXISTS — suppliers
    who were the SOLE late shipper on a multi-supplier finalized order.
    The testdata has no commit/receipt dates, so "late" is shipping more
    than 60 days after the order date (oracle-replicated); the
    shape — l1 late, EXISTS l2 (another supplier on the order), NOT
    EXISTS l3 (another LATE supplier on the order) — is intact.

    Plan: EXISTS ⇒ left_semi, NOT EXISTS ⇒ left_anti, both native Spark
    join types on the orderkey — no correlated per-row subquery ever
    executes.  All three legs derive from one shared late/all lineitem
    scan; nation and supplier are broadcast; final count is a
    supplier-cardinality aggregate with a deterministic top-20."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    l1 = late.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    ).join(
        late_others,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    return (
        l1.join(F.broadcast(supp), l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


TPCH_WAITING_SUPPLIERS_SQL = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem, orders
  WHERE l_orderkey = o_orderkey
    AND o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM late l1, supplier
WHERE l1.l_suppkey = s_suppkey
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


# --- bucketized range join -------------------------------------------------

def tpch_window_shipments(spark, sf_dir):
    """Point-in-interval analytics: shipments landing inside ANY urgent
    order's first week (the interval table is UNRELATED to the point's
    own order — a true non-equi range join, not a filter).  Expressed
    through operators/rangejoin.py::point_in_interval_join: buckets
    make it an equi-join + residual filter, so the plan is a hash join
    on the bucket id — never the BroadcastNestedLoopJoin Spark would
    pick for a raw BETWEEN join (plan-pinned in
    tests/test_plan_shapes.py).  Week-wide windows, 7-day buckets: each
    interval explodes to ≤2 buckets."""
    from garmadon_spark.operators.rangejoin import point_in_interval_join

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    day = lambda c: F.datediff(F.col(c), F.lit("1970-01-01"))  # noqa: E731
    windows = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1996-02-01"))
        )
        .select(
            F.col("o_orderkey").alias("w_orderkey"),
            F.col("o_orderdate"),
            day("o_orderdate").alias("w_start"),
            (day("o_orderdate") + 7).alias("w_end"),
        )
    )
    points = li.select(day("l_shipdate").alias("ship_day"))
    return (
        point_in_interval_join(
            points, windows, "ship_day", "w_start", "w_end",
            bucket_width=7,
        )
        .groupBy("w_orderkey", "o_orderdate")
        .agg(F.count(F.lit(1)).alias("n_shipments"))
        .orderBy(F.desc("n_shipments"), F.asc("w_orderkey"))
        .limit(25)
    )


TPCH_WINDOW_SHIPMENTS_SQL = """
SELECT o_orderkey AS w_orderkey, o_orderdate, COUNT(*) AS n_shipments
FROM orders, lineitem
WHERE o_orderpriority = '1-URGENT'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-02-01'
  AND l_shipdate >= o_orderdate
  AND l_shipdate <= o_orderdate + INTERVAL 7 DAY
GROUP BY o_orderkey, o_orderdate
ORDER BY n_shipments DESC, w_orderkey ASC
LIMIT 25
"""


QUERIES = {
    "tpch_pricing_summary": (tpch_pricing_summary, TPCH_PRICING_SUMMARY_SQL),
    "tpch_top_orders": (tpch_top_orders, TPCH_TOP_ORDERS_SQL),
    "tpch_region_revenue": (tpch_region_revenue, TPCH_REGION_REVENUE_SQL),
    "tpch_order_priority": (tpch_order_priority, TPCH_ORDER_PRIORITY_SQL),
    "tpch_customer_distribution": (
        tpch_customer_distribution,
        TPCH_CUSTOMER_DISTRIBUTION_SQL,
    ),
    "tpch_top_returners": (tpch_top_returners, TPCH_TOP_RETURNERS_SQL),
    "tpch_nation_top_suppliers": (
        tpch_nation_top_suppliers,
        TPCH_NATION_TOP_SUPPLIERS_SQL,
    ),
    "tpch_volume_shipping": (tpch_volume_shipping, TPCH_VOLUME_SHIPPING_SQL),
    "tpch_market_share": (tpch_market_share, TPCH_MARKET_SHARE_SQL),
    "tpch_promo_revenue": (tpch_promo_revenue, TPCH_PROMO_REVENUE_SQL),
    "tpch_small_qty_revenue": (
        tpch_small_qty_revenue, TPCH_SMALL_QTY_REVENUE_SQL
    ),
    "tpch_idle_customers": (tpch_idle_customers, TPCH_IDLE_CUSTOMERS_SQL),
    "tpch_discounted_revenue": (
        tpch_discounted_revenue,
        TPCH_DISCOUNTED_REVENUE_SQL,
    ),
    "tpch_filtered_revenue": (tpch_filtered_revenue,
                              TPCH_FILTERED_REVENUE_SQL),
    "tpch_nation_profit": (tpch_nation_profit, TPCH_NATION_PROFIT_SQL),
    "tpch_late_shipments": (tpch_late_shipments, TPCH_LATE_SHIPMENTS_SQL),
    "tpch_top_supplier": (tpch_top_supplier, TPCH_TOP_SUPPLIER_SQL),
    "tpch_large_orders": (tpch_large_orders, TPCH_LARGE_ORDERS_SQL),
    "tpch_waiting_suppliers": (tpch_waiting_suppliers,
                               TPCH_WAITING_SUPPLIERS_SQL),
    "tpch_window_shipments": (tpch_window_shipments,
                              TPCH_WINDOW_SHIPMENTS_SQL),
}
