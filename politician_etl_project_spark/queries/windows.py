"""Window-function family (SURVEY.md §2.5).

The reference carries window semantics in Python loops (best-match-per-
group, running vars); the engine exposes the full ranking/offset/frame
family as native ``pyspark.sql.Window`` specs.  All partition orders
include a unique key so results are total-ordered and hash-stable.

Scale note: every window here partitions by a key (custkey) — no global
single-partition window except q_pct_of_total's scalar total (25 rows).
Partitioned windows scale linearly; an unpartitioned ORDER BY window over
a fact table would serialize onto one task and is designed out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from politician_etl_project_spark.catalog import load_table
from politician_etl_project_spark.functions.scalar import money
from politician_etl_project_spark.queries.registry import declared_query


@declared_query(
    "q_window_rank",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(o_totalprice AS DECIMAL(12,2)) AS totalprice,
       rn, rnk, drnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         RANK()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
         DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS drnk
  FROM orders
)
WHERE rn <= 3
ORDER BY o_custkey, rn
""",
    ops=("W1", "W2"),
    doc="Ranking family: top-3 orders per customer via row_number/rank/"
    "dense_rank (reference best-fuzzy-match-per-politician loop, "
    "scripts/ingest_fec_links.py:121-137, generalized).",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            money("o_totalprice").alias("totalprice"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@declared_query(
    "q_window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(o_totalprice AS DECIMAL(12,2)) AS totalprice,
       CAST(COALESCE(LAG(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), -1) AS DECIMAL(12,2)) AS prev_price,
       CAST(COALESCE(LEAD(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), -1) AS DECIMAL(12,2)) AS next_price
FROM orders
WHERE o_custkey < 100
ORDER BY o_custkey, o_orderkey
""",
    ops=("W1",),
    doc="lag/lead offsets over per-entity event order (no reference "
    "equivalent — required window capability per SURVEY §2.5 note). "
    "Partition-edge offsets are coalesced to -1 on BOTH sides: a "
    "NULLable numeric at the projection boundary is a driver hazard "
    "(pandas floats a nullable int64 and renders NULL as NaN while "
    "Spark keeps int/NULL — found in the r02 sf0.01 driver sim).",
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    price = money("o_totalprice")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        price.alias("totalprice"),
        F.coalesce(F.lag(price).over(w), F.lit(-1)).cast("decimal(12,2)").alias("prev_price"),
        F.coalesce(F.lead(price).over(w), F.lit(-1)).cast("decimal(12,2)").alias("next_price"),
    ).orderBy("o_custkey", "o_orderkey")


@declared_query(
    "q_window_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS running_total
FROM orders
WHERE o_custkey < 100
ORDER BY o_custkey, o_orderkey
""",
    ops=("W1",),
    doc="Cumulative frame (rowsBetween unboundedPreceding..currentRow) — "
    "running donation totals per entity, the frame-spec capability from "
    "SURVEY §2.5.",
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(money("o_totalprice")).over(w).cast("decimal(18,2)").alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")


@declared_query(
    "q_window_moving_avg",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS DECIMAL(18,6)) AS moving_avg3
FROM orders
WHERE o_custkey < 100
ORDER BY o_custkey, o_orderkey
""",
    ops=("W1",),
    doc="Bounded moving frame (3-row moving average) built as exact "
    "decimal sum/count so both engines agree bit-for-bit.",
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(money("o_totalprice")).over(w) / F.count("*").over(w))
        .cast("decimal(18,6)")
        .alias("moving_avg3"),
    ).orderBy("o_custkey", "o_orderkey")


@declared_query(
    "q_window_ntile",
    oracle="""
SELECT c_custkey, c_mktsegment,
       NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
FROM customer
ORDER BY c_custkey
""",
    ops=("W2",),
    doc="NTILE bucketing per group (committee-rank style ordered display, "
    "app/metrics.py:635, generalized to distribution buckets).",
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("c_custkey")


@declared_query(
    "q_window_range_frame",
    oracle="""
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS daynum,
         SUM(CAST(value AS DECIMAL(18,2))) AS total
  FROM events
  GROUP BY 1, 2, 3
)
SELECT event_type, day,
       CAST(SUM(total) OVER (PARTITION BY event_type ORDER BY daynum
                             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS DECIMAL(18,2)) AS trailing_7d
FROM daily
ORDER BY event_type, day
""",
    ops=("W1", "A4"),
    doc="Time-RANGE window frame: per event type, the trailing-7-DAY "
    "value total over the daily rollup — a VALUE-based frame "
    "(rangeBetween on the epoch-day ordinal), not a row-count frame, "
    "so gaps in the calendar shrink the window exactly as wall-clock "
    "time would.  The rows-frame family (q_window_moving_avg) cannot "
    "express this.  Decimal sums keep both engines exact.  Scale: the "
    "daily pre-aggregate contracts the fact FIRST (days x types rows), "
    "then the window sorts only the tiny rollup within each type "
    "partition — never the raw events.",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day"),
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias(
                "daynum"
            ),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("total"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("daynum")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        F.sum("total").over(w).cast("decimal(18,2)").alias("trailing_7d"),
    ).orderBy("event_type", "day")
