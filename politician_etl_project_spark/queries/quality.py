"""Data-quality queries: one-pass column profiling and declarative
constraint validation — the checks a warehouse runs before promoting a
batch (the reference approximates them with per-script counter prints,
e.g. scripts/ingest_bulk_donations.py:219-223, and a manual BigQuery
schema-drift dump, app/check_schema.py:10-37; here both are engine
queries with exact oracles).

Determinism: counts and null/distinct tallies are exact integers; rate
columns are integer micro-units (1e6 * n DIV total) so no float reaches
the hash (FIXTURES rules)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from politician_etl_project_spark.catalog import load_table
from politician_etl_project_spark.queries.registry import declared_query


@declared_query(
    "q_data_profile",
    oracle="""
SELECT col_name, n_rows, n_null, n_distinct,
       CAST((1000000 * n_null) // n_rows AS BIGINT) AS null_rate_micro,
       min_str, max_str
FROM (
  SELECT 'o_custkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_null,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
         CAST(MIN(o_custkey) AS VARCHAR) AS min_str, CAST(MAX(o_custkey) AS VARCHAR) AS max_str
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
         MIN(o_orderpriority), MAX(o_orderpriority)
  FROM orders
  UNION ALL
  SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
         CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
         CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR),
         CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
  FROM orders
)
ORDER BY col_name
""",
    ops=("DQ-profile", "A2", "A11"),
    doc="One-pass column profile of the orders table (row count, null "
    "count, distinct count, min/max rendered as strings so one schema "
    "serves every column type) — the pre-promotion audit a pipeline "
    "runs on each new batch.  ALL per-column stats compute in a single "
    "scan via one multi-aggregate projection, then unpivot to the "
    "per-column report shape: profiling N columns costs one pass, not "
    "N.  Null rates are integer micro-units.  At 100 TB the same plan "
    "profiles a day partition; distinct counts switch to "
    "approx_count_distinct (q_approx_sketches) when exactness is not "
    "required.",
)
def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # one scan for every decomposable stat; each COUNT DISTINCT gets its
    # OWN aggregate and the 1-row frames cross-join back.  Mixing three
    # distinct aggregates into the multi-aggregate forces an Expand (x4
    # rows) + multi-pass aggregation — measured 1.22 s at sf0.1 vs
    # 0.44 s split.  Same split discipline as q_approx_sketches.
    plain = orders.agg(
        F.count("*").alias("n_rows"),
        F.count("o_custkey").alias("nn_custkey"),
        F.min("o_custkey").cast("string").alias("mn_custkey"),
        F.max("o_custkey").cast("string").alias("mx_custkey"),
        F.count("o_orderpriority").alias("nn_prio"),
        F.min("o_orderpriority").alias("mn_prio"),
        F.max("o_orderpriority").alias("mx_prio"),
        F.count("o_totalprice").alias("nn_price"),
        F.min(F.col("o_totalprice").cast("decimal(18,2)")).cast("string").alias("mn_price"),
        F.max(F.col("o_totalprice").cast("decimal(18,2)")).cast("string").alias("mx_price"),
    )
    agg = (
        plain.crossJoin(orders.agg(F.countDistinct("o_custkey").alias("nd_custkey")))
        .crossJoin(orders.agg(F.countDistinct("o_orderpriority").alias("nd_prio")))
        .crossJoin(orders.agg(F.countDistinct("o_totalprice").alias("nd_price")))
    )
    # ...then unpivot to the per-column report
    prof = agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("o_custkey").alias("col_name"),
                    F.col("n_rows").alias("n_rows"),
                    (F.col("n_rows") - F.col("nn_custkey")).alias("n_null"),
                    F.col("nd_custkey").alias("n_distinct"),
                    F.col("mn_custkey").alias("min_str"),
                    F.col("mx_custkey").alias("max_str"),
                ),
                F.struct(
                    F.lit("o_orderpriority").alias("col_name"),
                    F.col("n_rows").alias("n_rows"),
                    (F.col("n_rows") - F.col("nn_prio")).alias("n_null"),
                    F.col("nd_prio").alias("n_distinct"),
                    F.col("mn_prio").alias("min_str"),
                    F.col("mx_prio").alias("max_str"),
                ),
                F.struct(
                    F.lit("o_totalprice").alias("col_name"),
                    F.col("n_rows").alias("n_rows"),
                    (F.col("n_rows") - F.col("nn_price")).alias("n_null"),
                    F.col("nd_price").alias("n_distinct"),
                    F.col("mn_price").alias("min_str"),
                    F.col("mx_price").alias("max_str"),
                ),
            )
        ).alias("p")
    ).select("p.*")
    return prof.select(
        "col_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_null").cast("bigint").alias("n_null"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        F.expr("CAST((1000000 * n_null) DIV n_rows AS BIGINT)").alias("null_rate_micro"),
        "min_str",
        "max_str",
    ).orderBy("col_name")


@declared_query(
    "q_dq_constraints",
    oracle="""
SELECT constraint_name, n_violations, CAST(n_checked AS BIGINT) AS n_checked FROM (
  SELECT 'orders_custkey_fk' AS constraint_name,
         CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT) AS n_violations,
         COUNT(*) AS n_checked
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  UNION ALL
  SELECT 'orders_pk_unique',
         CAST((SELECT COUNT(*) FROM (
            SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
         )) AS BIGINT),
         (SELECT COUNT(DISTINCT o_orderkey) FROM orders)
  UNION ALL
  SELECT 'totalprice_positive',
         CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT),
         COUNT(*)
  FROM orders
  UNION ALL
  SELECT 'orderdate_in_range',
         CAST(COUNT(*) FILTER (WHERE o_orderdate < TIMESTAMP '1990-01-01'
                                  OR o_orderdate > TIMESTAMP '2030-01-01') AS BIGINT),
         COUNT(*)
  FROM orders
)
ORDER BY constraint_name
""",
    ops=("DQ-constraints", "J6", "P6"),
    doc="Declarative constraint validation over a batch: FK integrity "
    "(orphan orders via left-join null probe — the reference enforces "
    "this with Postgres FKs, sql/creations.sql), primary-key "
    "uniqueness, value-domain and date-range checks — each reported as "
    "(violations, checked) so a gate can require zero.  The FK probe "
    "is one broadcast/shuffle join; the scalar checks fold into single "
    "scans.  This is the promotion gate of every warehouse load: "
    "violations quarantine the batch instead of poisoning the fact "
    "table.",
)
def q_dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    fk = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left")
        .agg(
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_violations"),
            F.count("*").cast("bigint").alias("n_checked"),
        )
        .select(F.lit("orders_custkey_fk").alias("constraint_name"), "n_violations", "n_checked")
    )
    pk = (
        # non-null keys only: the oracle's COUNT(DISTINCT) excludes NULLs
        # and a NULL pk belongs to a not-null constraint, not uniqueness —
        # without the filter one NULL-keyed dirty row makes n_checked
        # diverge by exactly the group Spark counts and DuckDB doesn't
        orders.filter(F.col("o_orderkey").isNotNull())
        .groupBy("o_orderkey")
        .count()
        .agg(
            F.sum(F.when(F.col("count") > 1, 1).otherwise(0)).cast("bigint").alias("n_violations"),
            F.count("*").cast("bigint").alias("n_checked"),
        )
        .select(F.lit("orders_pk_unique").alias("constraint_name"), "n_violations", "n_checked")
    )
    scalars = orders.agg(
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).cast("bigint").alias("v_price"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                | (F.col("o_orderdate") > F.lit("2030-01-01").cast("timestamp")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("v_date"),
        F.count("*").cast("bigint").alias("n_checked"),
    )
    # explode the ONE-row aggregate into both constraint rows inside a
    # single plan: two selects over `scalars` would compile into two
    # independent scan+aggregate subtrees over orders (no subplan reuse),
    # doubling the scalar-check scans the docstring promises are single
    scalar_rows = scalars.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("totalprice_positive").alias("constraint_name"),
                    F.col("v_price").alias("n_violations"),
                    F.col("n_checked"),
                ),
                F.struct(
                    F.lit("orderdate_in_range").alias("constraint_name"),
                    F.col("v_date").alias("n_violations"),
                    F.col("n_checked"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    return fk.unionByName(pk).unionByName(scalar_rows).orderBy("constraint_name")


@declared_query(
    "q_k_anonymity",
    oracle="""
WITH cells AS (
  SELECT lang, source, CAST(n_chars // 100 AS BIGINT) AS size_bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY lang, source, n_chars // 100
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS cells_below_k,
       CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
       CAST(MIN(n) AS BIGINT) AS min_cell
FROM cells
""",
    ops=("DQ-kanon", "A2", "A6"),
    doc="k-anonymity audit (k=5) over the quasi-identifier cell "
    "(lang, source, coarse size bucket): the privacy gate release "
    "pipelines run AFTER PII scrubbing (q_pii_scrub removes direct "
    "identifiers; this measures whether the remaining quasi-identifier "
    "combinations still isolate individuals — cells smaller than k are "
    "re-identification risks that need suppression or wider "
    "generalization).  Output is the audit summary: cell count, "
    "under-k cells, rows at risk, smallest cell.  Scale: one "
    "hash-aggregate on the quasi-identifier tuple + a 4-value rollup — "
    "the cell cardinality, not the corpus, bounds state.",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy(
        "lang", "source", F.floor(F.col("n_chars") / 100).cast("bigint").alias("size_bucket")
    ).agg(F.count("*").cast("bigint").alias("n"))
    return cells.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.sum(F.when(F.col("n") < 5, 1).otherwise(0)).cast("bigint").alias("cells_below_k"),
        F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0)).cast("bigint").alias("rows_at_risk"),
        F.min("n").cast("bigint").alias("min_cell"),
    )
