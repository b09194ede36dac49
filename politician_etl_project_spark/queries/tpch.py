"""Headline analytical queries (bench workload).

TPC-H-shaped queries over the driver testdata exercising the reference's
core query shape — fact ⋈ dims → group → aggregate → top-k (SURVEY §3.1:
`app/app.py:127-188` financial metrics ≡ donations ⋈ politicians ⋈ donors
→ SUM/top-10/timeline).  These four are the bench workload: scan-heavy
aggregation (q1), selective mid-join top-k (q3), 6-way broadcast-dim join
(q5), scalar predicate-pushdown aggregate (q6).

Scale notes per query are in the docstrings; all aggregation is exact
DECIMAL, all plans should show parquet `PushedFilters` and broadcast
joins for the bounded dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from politician_etl_project_spark.catalog import load_table
from politician_etl_project_spark.functions.scalar import disc_price, charge, money
from politician_etl_project_spark.queries.registry import declared_query

# -- q1: pricing summary -----------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DECIMAL(18,6)) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) / COUNT(*) AS DECIMAL(18,6)) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) / COUNT(*) AS DECIMAL(18,6)) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) / COUNT(*) AS DECIMAL(18,6)) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@declared_query(
    "q01_pricing_summary",
    oracle=_Q1_ORACLE,
    ops=("A2", "A8", "F8", "P5"),
    doc="Full-scan grouped aggregate with exact decimal math (reference "
    "metric-bundle shape app/metrics.py:50-58). Scale: map-side partial "
    "aggregation on 4 groups makes shuffle negligible; bottleneck is the "
    "scan, which prunes to 7 columns.",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(money("l_quantity")).cast("decimal(18,2)").alias("sum_qty"),
            F.sum(money("l_extendedprice")).cast("decimal(18,2)").alias("sum_base_price"),
            F.sum(disc_price()).cast("decimal(18,4)").alias("sum_disc_price"),
            F.sum(charge()).cast("decimal(18,6)").alias("sum_charge"),
            (F.sum(money("l_quantity")) / F.count("*")).cast("decimal(18,6)").alias("avg_qty"),
            (F.sum(money("l_extendedprice")) / F.count("*")).cast("decimal(18,6)").alias("avg_price"),
            (F.sum(money("l_discount")) / F.count("*")).cast("decimal(18,6)").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# -- q3: top-k revenue -------------------------------------------------------

_Q3_ORACLE = """
SELECT
  l_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS revenue,
  STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@declared_query(
    "q03_shipping_priority",
    oracle=_Q3_ORACLE,
    ops=("J1", "A3", "O3", "P2", "P5"),
    doc="Selective 3-way join + grouped top-k (reference top-10 donors, "
    "app/app.py:155-171 / app/metrics.py:63-67). Scale: segment filter "
    "prunes customer before the join; top-k executes as "
    "TakeOrderedAndProject — no full sort of the aggregate.",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price()).cast("decimal(18,4)").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# -- q5: regional volume -----------------------------------------------------

_Q5_ORACLE = """
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1994-01-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@declared_query(
    "q05_region_volume",
    oracle=_Q5_ORACLE,
    ops=("J1", "J2", "A2", "P2", "P5"),
    doc="6-way star join with bounded dims broadcast (reference's multi-dim "
    "metric joins, app/app.py:270-302). Scale: region/nation/supplier are "
    "broadcast so only the customer⋈orders⋈lineitem chain shuffles; the "
    "region filter cascades through nation to prune suppliers/customers "
    "before the fact join.",
)
def q05_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # dims pruned by region first; broadcast markers keep the fact chain shuffle-free
    asia_nations = F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey))
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").join(
            asia_nations, F.col("s_nationkey") == F.col("n_nationkey")
        )
    )
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supp.s_nationkey))
        .groupBy("n_name")
        .agg(F.sum(disc_price()).cast("decimal(18,4)").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# -- q6: pushdown aggregate --------------------------------------------------

_Q6_ORACLE = """
SELECT
  CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))), 0) AS DECIMAL(18,4)) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@declared_query(
    "q06_forecast_revenue",
    oracle=_Q6_ORACLE,
    ops=("A1", "P5", "F8"),
    doc="Scalar COALESCE(SUM, 0) with range predicates (reference "
    "total-donations scalar, app/metrics.py:50 / app/app.py:127-135). "
    "Scale: all four predicates push into the parquet scan "
    "(PushedFilters), and the single-row aggregate needs no shuffle "
    "beyond the final 1-partition exchange.",
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        F.coalesce(F.sum(money("l_extendedprice") * money("l_discount")), F.lit(0))
        .cast("decimal(18,4)")
        .alias("revenue")
    )


# -- q4-shape: EXISTS semi join + grouped count -------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND CAST(l_discount AS DECIMAL(12,2)) > 0.05
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@declared_query(
    "q04_order_priority",
    oracle=_Q4_ORACLE,
    ops=("P8", "J6", "A7"),
    doc="EXISTS-subquery grouped count (TPC-H Q4 shape; testdata has no "
    "commit/receipt dates so the inner predicate is a discount filter). "
    "Catalyst decorrelates EXISTS into a left-semi hash join; the date "
    "range prunes orders at the scan before the join.",
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = load_table(spark, sf_dir, "lineitem").filter(money("l_discount") > 0.05)
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# -- q14-shape: conditional promo share ---------------------------------------

_Q14_ORACLE = """
SELECT CAST(
  100.00 * SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
                    ELSE 0 END)
  / SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))))
  AS DECIMAL(18,6)) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01' AND l_shipdate < TIMESTAMP '1995-10-01'
"""


@declared_query(
    "q14_promo_effect",
    oracle=_Q14_ORACLE,
    ops=("A6", "J1", "A10"),
    doc="Conditional aggregation over a broadcast join (TPC-H Q14 shape): "
    "promo share = CASE-gated sum / total sum, ONE pass — the reference "
    "computes such shares in Python after two queries "
    "(app/metrics.py:58-60). part broadcasts (2k rows); the month filter "
    "pushes into the lineitem scan.",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    part = F.broadcast(load_table(spark, sf_dir, "part").select("p_partkey", "p_type"))
    joined = li.join(part, li.l_partkey == part.p_partkey)
    rev = disc_price()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return joined.agg(
        (F.lit(100.00) * F.sum(promo) / F.sum(rev)).cast("decimal(18,6)").alias("promo_revenue_pct")
    )


# -- q17-shape: correlated scalar subquery (decorrelated) ---------------------

_Q17_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS small_order_revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN per_part ON per_part.l_partkey = lineitem.l_partkey
WHERE p_brand = 'Brand#1'
  AND CAST(l_quantity AS DECIMAL(12,2)) * cnt * 5 < sq
"""


@declared_query(
    "q17_small_quantity",
    oracle=_Q17_ORACLE,
    ops=("J10", "A1", "A8"),
    doc="Correlated scalar subquery — l_quantity < 0.2 * AVG(qty) per part "
    "(TPC-H Q17 shape) — decorrelated into a per-part aggregate join. The "
    "threshold compares as 5*qty*cnt < sum(qty): exact decimal/integer "
    "arithmetic on both engines, no float-boundary flakiness. At scale "
    "the per-part aggregate reuses the fact's partitioning on l_partkey.",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(money("l_quantity")).alias("sq"), F.count("*").alias("cnt")
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, "l_partkey")
        .filter(money("l_quantity") * F.col("cnt") * 5 < F.col("sq"))
        .agg(
            F.sum(money("l_extendedprice")).cast("decimal(18,2)").alias("small_order_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# -- q18-shape: HAVING subquery join ------------------------------------------

_Q18_ORACLE = """
SELECT c_name, customer.c_custkey, orders.o_orderkey,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(o_totalprice AS DECIMAL(12,2)) AS totalprice,
       CAST(big.sq AS DECIMAL(18,2)) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
) big ON big.l_orderkey = orders.o_orderkey
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
"""


@declared_query(
    "q18_large_orders",
    oracle=_Q18_ORACLE,
    ops=("J10", "A3", "O3"),
    doc="HAVING-subquery join (TPC-H Q18 shape): orders whose line "
    "quantities sum past a threshold, joined back to customers, top-100 "
    "by price. The HAVING aggregate shrinks lineitem to a tiny key set "
    "BEFORE the join — at 100 TB the order matters enormously.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 300)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            money("o_totalprice").alias("totalprice"),
            F.col("sq").cast("decimal(18,2)").alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# -- q7-shape: two-nation shipping volume by year -----------------------------

_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice, l_discount
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@declared_query(
    "q07_nation_volume",
    oracle=_Q7_ORACLE,
    ops=("J1", "J2", "A4", "F9"),
    doc="Bilateral trade volume (TPC-H Q7 shape): 6-way join with BOTH "
    "nation roles (supplier's and customer's) + an OR-of-pairs predicate "
    "+ year bucketing. The nation filters prune supplier/customer before "
    "the fact join; nation broadcasts twice under different aliases.",
)
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ("NATION_3", "NATION_7")
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(
        nation.filter(F.col("n_name").isin(*pair)).select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        nation.filter(F.col("n_name").isin(*pair)).select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
        )
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        n1, F.col("s_nationkey") == F.col("s_nk")
    )
    cust = load_table(spark, sf_dir, "customer").join(
        n2, F.col("c_nationkey") == F.col("c_nk")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(F.sum(disc_price()).cast("decimal(18,4)").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# -- q10-shape: returned-item revenue per customer ----------------------------

_Q10_ORACLE = """
SELECT customer.c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS revenue,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY customer.c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@declared_query(
    "q10_returned_items",
    oracle=_Q10_ORACLE,
    ops=("J1", "A3", "O3", "P2"),
    doc="Top-20 customers by returned-item revenue in a quarter (TPC-H "
    "Q10 shape) — the reference's 'top donors for a window' pattern at "
    "fact scale. returnflag + date filters push to both scans; grouped "
    "top-k takes TakeOrderedAndProject.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(disc_price()).cast("decimal(18,4)").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# -- q13-shape: customer order-count distribution -----------------------------

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@declared_query(
    "q13_order_distribution",
    ops=("J6", "A2", "A7"),
    oracle=_Q13_ORACLE,
    doc="Customer order-count histogram (TPC-H Q13 shape): LEFT join so "
    "zero-order customers count, aggregate twice (per-customer count, "
    "then count-of-counts). Two shuffles; the second is on the tiny "
    "distinct-count domain.",
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy(cust.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )
