"""Relational operator inventory (SURVEY.md §2.2-2.4, 2.6-2.8).

Each declared query re-expresses one (or a small family of) reference
operators on the driver testdata, with a DuckDB oracle.  Reference
citations are in the ``doc=`` of each registration.

Oracle-parity conventions: see queries/registry.py docstring.  Two
engine-difference traps handled throughout: DuckDB ``regexp_replace``
needs the ``'g'`` flag to match Spark's replace-all semantics, and DuckDB
``concat()`` skips NULLs while ``||`` propagates them (Spark ``concat``
propagates — so oracles use ``||``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from politician_etl_project_spark.catalog import load_table
from politician_etl_project_spark.functions.scalar import composite_key, money, normalize_name
from politician_etl_project_spark.operators.filters import build_predicate
from politician_etl_project_spark.queries.registry import declared_query

# --------------------------------------------------------------------------
# Projections / filters (P-family)
# --------------------------------------------------------------------------


@declared_query(
    "q_proj_concat",
    oracle="""
SELECT c_custkey,
       c_name || ' [' || lower(c_mktsegment) || ']' AS display_name,
       CAST(c_acctbal AS DECIMAL(12,2)) AS acctbal
FROM customer
ORDER BY c_custkey
""",
    ops=("P1", "F1", "F2"),
    doc="Projection + alias + concat (reference SELECT CONCAT(first_name,' ',last_name) AS name, app/app.py:66-77).",
)
def q_proj_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit(" ["), F.lower("c_mktsegment"), F.lit("]")).alias("display_name"),
        money("c_acctbal").alias("acctbal"),
    ).orderBy("c_custkey")


@declared_query(
    "q_filter_eq_range",
    oracle="""
SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus = 'F'
  AND o_totalprice BETWEEN 1000 AND 50000
ORDER BY o_orderkey
""",
    ops=("P2", "P5"),
    doc="Equality + range predicates (reference is_active=TRUE / amount>=min, "
    "app/app.py:74, app/main.py:229-232). Both predicates push into the "
    "parquet scan.",
)
def q_filter_eq_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter((F.col("o_orderstatus") == "F") & F.col("o_totalprice").between(1000, 50000))
        .select("o_orderkey", money("o_totalprice").alias("totalprice"), "o_orderpriority")
        .orderBy("o_orderkey")
    )


@declared_query(
    "q_dynamic_filters",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total
FROM orders
WHERE o_orderstatus = 'O'
  AND o_totalprice >= 10000
  AND o_totalprice <= 200000
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    ops=("P3", "P4", "P5"),
    doc="Dynamic predicate builder: a filters dict composed into Column "
    "predicates (reference build_filter_conditions f-string WHERE builder, "
    "app/app.py:94-117 — rebuilt injection-free, SURVEY §7 hard-part 7).",
)
def q_dynamic_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pred = build_predicate(
        {
            "o_orderstatus": "O",
            "o_totalprice__ge": 10000,
            "o_totalprice__le": 200000,
            "o_orderdate__ge": "1995-01-01",
            "o_orderpriority__in": ["1-URGENT", "2-HIGH"],
        }
    )
    return (
        orders.filter(pred)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(money("o_totalprice")).cast("decimal(18,2)").alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@declared_query(
    "q_in_list_dim",
    oracle="""
SELECT n_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE n_name IN ('NATION_1', 'NATION_5', 'NATION_9', 'NATION_13')
GROUP BY n_name
ORDER BY n_name
""",
    ops=("P4", "J1"),
    doc="IN-list filter on a broadcast dim (reference politician_id.in_(ids) "
    "/ CMTE_ID.isin, app/metrics.py:157-160, scripts/ingest_bulk_donations.py:92).",
)
def q_in_list_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_5", "NATION_9", "NATION_13")
    )
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("n_name")
    )


@declared_query(
    "q_like_keyword",
    oracle="""
SELECT p_partkey, p_name, p_brand
FROM part
WHERE lower(p_name) LIKE '%red%' OR lower(p_name) LIKE '%blue%'
ORDER BY p_partkey
""",
    ops=("P7",),
    doc="Case-insensitive OR-chained keyword LIKE (reference donor keyword "
    "search, app/app_old.py:132-149).",
)
def q_like_keyword(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    kws = ["red", "blue"]
    pred = F.lit(False)
    for kw in kws:
        pred = pred | F.lower(F.col("p_name")).contains(kw.lower())
    return part.filter(pred).select("p_partkey", "p_name", "p_brand").orderBy("p_partkey")


@declared_query(
    "q_semi_join",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey
""",
    ops=("P8", "J10"),
    doc="IN-subquery as left-semi join (reference committee-membership "
    "subquery, app/app.py:105-108; CTE sponsor-donors app/app_old.py:228-253).",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@declared_query(
    "q_anti_join",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    ops=("J6",),
    doc="Left-anti join: entities with no qualifying fact rows (reference "
    "bills with no cosponsors, scripts/update_cosponsors.py:60-79). "
    "Filtered to urgent orders so the result is non-empty at every sf.",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


@declared_query(
    "q_exists_probe",
    oracle="""
SELECT CAST(COUNT(*) > 0 AS BOOLEAN) AS found
FROM orders WHERE o_totalprice > 400000
""",
    ops=("P10",),
    doc="Existence probe (reference 404 checks query.first(), "
    "app/metrics.py:33-35). Spark: limit(1) short-circuits the scan.",
)
def q_exists_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_totalprice") > 400000)
        .limit(1)
        .agg((F.count("*") > 0).alias("found"))
    )


# --------------------------------------------------------------------------
# Joins (J-family)
# --------------------------------------------------------------------------


@declared_query(
    "q_fact_dim_rollup",
    oracle="""
SELECT r_name, n_name,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
""",
    ops=("J1", "J2", "A2"),
    doc="Fact ⋈ dim ⋈ dim ⋈ dim rollup — the reference's workhorse shape "
    "(donations ⋈ politicians ⋈ donors, app/app.py:127-188). nation/region "
    "broadcast; only orders⋈customer shuffles.",
)
def q_fact_dim_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(money("o_totalprice")).cast("decimal(18,2)").alias("total"),
        )
        .orderBy("r_name", "n_name")
    )


@declared_query(
    "q_left_join_coalesce",
    oracle="""
SELECT c_custkey,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DECIMAL(18,2)) AS total_spent,
       COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
ORDER BY c_custkey
""",
    ops=("J1", "A1", "P6", "F14"),
    doc="Left outer join + COALESCE(SUM,0) null-default (reference scalar "
    "total with 'or 0', app/metrics.py:50; COALESCE defaults app/app.py:140).",
)
def q_left_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.coalesce(F.sum(money("o_totalprice")), F.lit(0)).cast("decimal(18,2)").alias("total_spent"),
            F.count("o_orderkey").alias("n_orders"),
        )
        .orderBy("c_custkey")
    )


@declared_query(
    "q_composite_key_join",
    oracle="""
WITH seg AS (
  SELECT o_orderstatus || '|' || o_orderpriority AS seg_key,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) / COUNT(*) AS DECIMAL(18,6)) AS seg_avg
  FROM orders GROUP BY 1
)
SELECT o_orderkey,
       o_orderstatus || '|' || o_orderpriority AS seg_key,
       seg_avg
FROM orders JOIN seg ON o_orderstatus || '|' || o_orderpriority = seg_key
WHERE o_orderkey < 500
ORDER BY o_orderkey
""",
    ops=("J8", "F6", "A8"),
    doc="Join on a derived composite business key (reference bill key "
    "f'{TYPE}{number}-{congress}' built on both sides, "
    "scripts/ingest_votes.py:63,118-119; donor uid NAME|ZIP|EMPLOYER "
    "scripts/ingest_bulk_donations.py:98-100).",
)
def q_composite_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.withColumn("seg_key", composite_key("o_orderstatus", "o_orderpriority"))
    seg = keyed.groupBy("seg_key").agg(
        (F.sum(money("o_totalprice")) / F.count("*")).cast("decimal(18,6)").alias("seg_avg")
    )
    return (
        keyed.filter(F.col("o_orderkey") < 500)
        .join(F.broadcast(seg), "seg_key")
        .select("o_orderkey", "seg_key", "seg_avg")
        .orderBy("o_orderkey")
    )


@declared_query(
    "q_fuzzy_match_topk",
    oracle="""
WITH scored AS (
  SELECT s_suppkey, s_name, c_custkey,
         levenshtein(s_name, c_name) AS dist,
         ROW_NUMBER() OVER (PARTITION BY s_suppkey ORDER BY levenshtein(s_name, c_name), c_custkey) AS rn
  FROM supplier JOIN customer ON s_nationkey = c_nationkey
)
SELECT s_suppkey, s_name, c_custkey, dist
FROM scored WHERE rn = 1 AND dist <= 12
ORDER BY s_suppkey
""",
    ops=("J9", "W1", "D2"),
    doc="Blocked fuzzy similarity join + best-match-per-left-row: block on an "
    "equi key, score, threshold, keep top-1 (reference FEC entity resolution "
    "— block on state, fuzz.token_sort_ratio > 85, best match — "
    "scripts/ingest_fec_links.py:95-148). Native levenshtein keeps scoring "
    "JVM-side; blocking bounds the cross product exactly as the reference's "
    "state-blocking does (SURVEY §4 'Blocking to avoid O(n²)').",
)
def q_fuzzy_match_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    # Spread the STREAMED side of the blocked scoring join: at bench
    # scale the customer table is a single ~300 KB parquet split, so
    # the ~600k-pair levenshtein + sort + partial winner aggregate
    # otherwise all run as ONE task (r11 measured: 2.97 s isolated
    # before, 0.73 s after — the whole stage was that task).  The
    # repartition fires ONLY when the scan is narrower than the
    # session's parallelism — the regime where the shuffled table is
    # by definition tiny; at cluster scale the scan is already wide
    # and the plan is untouched (an unconditional repartition would
    # add a full shuffle of the streamed side, the §8 anti-pattern).
    # Keyed on c_custkey (hundreds of distinct keys per partition) so
    # the spread is deterministic and collision-proof.
    n_cores = spark.sparkContext.defaultParallelism
    if cust.rdd.getNumPartitions() < n_cores:
        cust = cust.repartition(n_cores, "c_custkey")
    scored = (
        supp.join(cust, supp.s_nationkey == cust.c_nationkey)
        .withColumn("dist", F.levenshtein("s_name", "c_name"))
    )
    # top-1-per-group as min(struct(dist, key)): lexicographic struct min ==
    # the window row_number()==1 result, but aggregates map-side (partial
    # combine) instead of sorting every scored pair through the shuffle
    best = F.min(F.struct("dist", "c_custkey")).alias("best")
    return (
        scored.groupBy("s_suppkey", "s_name")
        .agg(best)
        .filter(F.col("best.dist") <= 12)
        .select(
            "s_suppkey", "s_name", F.col("best.c_custkey").alias("c_custkey"),
            F.col("best.dist").alias("dist"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Aggregations (A-family)
# --------------------------------------------------------------------------


@declared_query(
    "q_topk_customers",
    oracle="""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total_spent,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey
LIMIT 10
""",
    ops=("A3", "O3", "J1"),
    doc="Grouped top-k by measure (reference top-10 donors, "
    "app/app.py:155-171). Executes as TakeOrderedAndProject after partial "
    "agg — no global sort.",
)
def q_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(money("o_totalprice")).cast("decimal(18,2)").alias("total_spent"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(10)
    )


@declared_query(
    "q_monthly_timeline",
    oracle="""
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
       o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total
FROM orders
GROUP BY 1, 2
ORDER BY month, o_orderstatus
""",
    ops=("A4", "F9", "F17"),
    doc="Time-bucketed group-by (reference DATE_TRUNC(date, MONTH) donation "
    "timeline, app/app.py:174-188). Month rendered as string: Spark "
    "date_trunc returns TIMESTAMP, DuckDB returns DATE.",
)
def q_monthly_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month"),
            "o_orderstatus",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(money("o_totalprice")).cast("decimal(18,2)").alias("total"),
        )
        .orderBy("month", "o_orderstatus")
    )


@declared_query(
    "q_conditional_split",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    ops=("A6", "P9"),
    doc="Conditional single-pass split counts (reference original-vs-not "
    "cosponsor counts done as two filtered queries, app/metrics.py:77-78 — "
    "collapsed to one scan with sum(when)).",
)
def q_conditional_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def flag(status: str):
        return F.sum(F.when(F.col("o_orderstatus") == status, 1).otherwise(0)).cast("bigint")

    return (
        orders.groupBy("o_orderpriority")
        .agg(
            flag("F").alias("n_fulfilled"),
            flag("O").alias("n_open"),
            flag("P").alias("n_partial"),
        )
        .orderBy("o_orderpriority")
    )


@declared_query(
    "q_count_distinct",
    oracle="""
SELECT n_name,
       COUNT(DISTINCT o_custkey) AS n_active_customers,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    ops=("A2", "A7"),
    doc="Grouped COUNT DISTINCT (reference COUNT(DISTINCT donation_id) per "
    "donor_type, app/app.py:138-152; committee member counts "
    "app/app.py:317-331). Spark expands distinct into a two-phase partial "
    "aggregate automatically.",
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("o_custkey").alias("n_active_customers"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("n_name")
    )


@declared_query(
    "q_avg_by_segment",
    oracle="""
SELECT c_mktsegment,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) / COUNT(*) AS DECIMAL(18,6)) AS avg_acctbal,
       COUNT(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    ops=("A8",),
    doc="AVG as exact decimal sum/count (reference AVG(donations.amount), "
    "app/app_old.py:141; SURVEY §7 hard-part 5 decimal fidelity).",
)
def q_avg_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            (F.sum(money("c_acctbal")) / F.count("*")).cast("decimal(18,6)").alias("avg_acctbal"),
            F.count("*").alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


@declared_query(
    "q_max_regex_extract",
    oracle="""
SELECT p_type,
       MAX(CAST(regexp_extract(p_brand, '[0-9]+') AS INTEGER)) AS max_brand_num,
       COUNT(*) AS n_parts
FROM part
GROUP BY p_type
ORDER BY p_type
""",
    ops=("A9", "F11"),
    doc="MAX over regex-extracted int (reference highest bill number "
    "MAX(CAST(SUBSTRING(...FROM '[0-9]+') AS INT)), "
    "scripts/update_bills.py:79-91). Spark regexp_extract group idx set "
    "to 0 explicitly (its default is 1; DuckDB's is 0).",
)
def q_max_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_type")
        .agg(
            F.max(F.regexp_extract("p_brand", "[0-9]+", 0).cast("int")).alias("max_brand_num"),
            F.count("*").alias("n_parts"),
        )
        .orderBy("p_type")
    )


@declared_query(
    "q_pct_of_total",
    oracle="""
WITH nat AS (
  SELECT n_name, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS nat_total
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name,
       CAST(nat_total AS DECIMAL(18,2)) AS total,
       CAST(nat_total * 100 / SUM(nat_total) OVER () AS DECIMAL(18,6)) AS pct
FROM nat
ORDER BY n_name
""",
    ops=("A10", "W2"),
    doc="Percent-of-total via unpartitioned window SUM (reference donation % "
    "by type computed in Python post-agg, app/metrics.py:58-60 — pushed "
    "into the engine as a window).",
)
def q_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    nat = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(money("o_totalprice")).alias("nat_total"))
    )
    w = Window.partitionBy()
    return nat.select(
        "n_name",
        F.col("nat_total").cast("decimal(18,2)").alias("total"),
        (F.col("nat_total") * 100 / F.sum("nat_total").over(w)).cast("decimal(18,6)").alias("pct"),
    ).orderBy("n_name")


@declared_query(
    "q_global_stats",
    oracle="""
SELECT 'customers' AS entity, COUNT(*) AS n FROM customer
UNION ALL SELECT 'orders', COUNT(*) FROM orders
UNION ALL SELECT 'lineitems', COUNT(*) FROM lineitem
UNION ALL SELECT 'suppliers', COUNT(*) FROM supplier
UNION ALL SELECT 'parts', COUNT(*) FROM part
ORDER BY entity
""",
    ops=("A5", "A11", "U1"),
    doc="Multi-table stats dashboard as one unioned job (reference 8 separate "
    "COUNT queries, app/main.py:144-168 — one Spark job, counts run in "
    "parallel stages).",
)
def q_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    def cnt(name: str, label: str) -> DataFrame:
        return load_table(spark, sf_dir, name).agg(F.count("*").alias("n")).select(
            F.lit(label).alias("entity"), "n"
        )

    return (
        cnt("customer", "customers")
        .unionByName(cnt("orders", "orders"))
        .unionByName(cnt("lineitem", "lineitems"))
        .unionByName(cnt("supplier", "suppliers"))
        .unionByName(cnt("part", "parts"))
        .orderBy("entity")
    )


@declared_query(
    "q_dedup_keep_first",
    oracle="""
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS first_orderdate
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
)
WHERE rn = 1
ORDER BY o_custkey
""",
    ops=("A14", "S13", "W1"),
    doc="Deterministic key-dedup, first-wins (reference ON CONFLICT DO "
    "NOTHING / drop_duplicates(subset), scripts/ingest_bulk_donations.py:102 "
    "— dropDuplicates is nondeterministic under parallelism, so the engine "
    "always uses row_number over an explicit order; SURVEY §7 hard-part 1).",
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("first_orderdate"),
        )
        .orderBy("o_custkey")
    )


@declared_query(
    "q_dedup_keep_last",
    oracle="""
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS last_orderdate
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
WHERE rn = 1
ORDER BY o_custkey
""",
    ops=("A14", "S12", "W1"),
    doc="Deterministic key-dedup, last-wins — the upsert 'update wins' "
    "resolution (reference ON CONFLICT DO UPDATE, "
    "scripts/ingest_politicians.py:209-232; keep='last' dedup "
    "scripts/ingest_fec_links.py:81).",
)
def q_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_orderdate"),
        )
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# Sorts / limits / pagination (O-family)
# --------------------------------------------------------------------------


@declared_query(
    "q_pagination",
    oracle="""
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS totalprice
FROM orders
ORDER BY o_orderkey
LIMIT 100 OFFSET 200
""",
    ops=("O4",),
    doc="Deterministic offset/limit pagination: total order over the unique "
    "key before paging (reference query.offset(skip).limit(limit), "
    "app/main.py:54-55; SURVEY §7 hard-part 4).",
)
def q_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", money("o_totalprice").alias("totalprice"))
        .orderBy("o_orderkey")
        .offset(200)
        .limit(100)
    )


@declared_query(
    "q_recent_n",
    oracle="""
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
FROM orders
ORDER BY o_orderdate DESC, o_orderkey
LIMIT 20
""",
    ops=("O2",),
    doc="Recent-N: sort desc + limit with unique tie-break (reference recent "
    "bills/votes ORDER BY date DESC LIMIT 10/20, app/app.py:239-252).",
)
def q_recent_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .limit(20)
    )


# --------------------------------------------------------------------------
# Set operations (U-family)
# --------------------------------------------------------------------------


@declared_query(
    "q_union_distinct",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
ORDER BY c_custkey
""",
    ops=("U1", "U4", "U2"),
    doc="Union + dedup (reference pd.concat of 2024+2026 files then "
    "drop_duplicates, scripts/ingest_bulk_donations.py:63).",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.unionByName(b).distinct().orderBy("c_custkey")


@declared_query(
    "q_except",
    oracle="""
SELECT DISTINCT o_custkey FROM orders
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY o_custkey
""",
    ops=("U3",),
    doc="Set difference (reference missing_ids = set(ids) - found_ids, "
    "app/metrics.py:153-154 — as a distributed EXCEPT instead of "
    "driver-side sets).",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    all_c = orders.select("o_custkey").distinct()
    f_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return all_c.exceptAll(f_c).orderBy("o_custkey")


@declared_query(
    "q_intersect",
    oracle="""
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
ORDER BY c_custkey
""",
    ops=("U3",),
    doc="Intersection (not present in the reference; included for set-op "
    "completeness per SURVEY §2.7).",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return a.intersect(b).orderBy("c_custkey")


# --------------------------------------------------------------------------
# Scalar function kitchen (F-family)
# --------------------------------------------------------------------------


@declared_query(
    "q_scalar_kitchen",
    oracle="""
SELECT n_nationkey,
       n_name,
       lower(n_name) AS lower_name,
       upper(substr(n_name, 1, 3)) AS prefix3,
       CAST(length(n_name) AS INTEGER) AS name_len,
       trim(regexp_replace(regexp_replace(upper(n_name), '[.,]', '', 'g'), '\\s+', ' ', 'g')) AS norm_name,
       regexp_replace(n_name, '[0-9]+', '#', 'g') AS masked,
       n_name || '-' || CAST(n_regionkey AS VARCHAR) AS region_tag
FROM nation
ORDER BY n_nationkey
""",
    ops=("F2", "F3", "F6", "F12", "F13"),
    doc="String-function kitchen: lower/upper/substr/length/trim/"
    "regexp_replace/concat (reference name normalization "
    "scripts/ingest_fec_links.py:34-43, truncation app/app.py:415). "
    "DuckDB regexp_replace needs 'g' to match Spark's replace-all.",
)
def q_scalar_kitchen(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        "n_name",
        F.lower("n_name").alias("lower_name"),
        F.upper(F.substring("n_name", 1, 3)).alias("prefix3"),
        F.length("n_name").cast("int").alias("name_len"),
        normalize_name("n_name").alias("norm_name"),
        F.regexp_replace("n_name", "[0-9]+", "#").alias("masked"),
        F.concat(F.col("n_name"), F.lit("-"), F.col("n_regionkey").cast("string")).alias("region_tag"),
    ).orderBy("n_nationkey")


@declared_query(
    "q_date_roundtrip",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n,
       COUNT(try_strptime(strftime(o_orderdate, '%m%d%Y'), '%m%d%Y')) AS n_parsed,
       strftime(MIN(try_strptime(strftime(o_orderdate, '%m%d%Y'), '%m%d%Y')), '%Y-%m-%d') AS min_date,
       strftime(MAX(try_strptime(strftime(o_orderdate, '%m%d%Y'), '%m%d%Y')), '%Y-%m-%d') AS max_date
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    ops=("F7", "F17"),
    doc="FEC-style MMDDYYYY date format/parse roundtrip with null-on-failure "
    "coercion (reference pd.to_datetime(format='%m%d%Y', errors='coerce'), "
    "scripts/ingest_bulk_donations.py:141). Spark to_date returns NULL on "
    "bad input under LEGACY-free parsing; DuckDB try_strptime mirrors it.",
)
def q_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    parsed = F.to_date(F.date_format("o_orderdate", "MMddyyyy"), "MMddyyyy")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.count(parsed).alias("n_parsed"),
            F.date_format(F.min(parsed), "yyyy-MM-dd").alias("min_date"),
            F.date_format(F.max(parsed), "yyyy-MM-dd").alias("max_date"),
        )
        .orderBy("o_orderstatus")
    )
