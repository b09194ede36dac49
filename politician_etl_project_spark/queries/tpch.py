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
