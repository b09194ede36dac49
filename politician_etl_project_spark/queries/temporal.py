"""Temporal-join declared queries over ``events`` (north-star custom
operators; operators/temporal.py).  DuckDB has a native ASOF JOIN and
executes the raw range theta-join directly, so both Spark compositions
are hash-verified against first-class reference implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from politician_etl_project_spark.catalog import load_table
from politician_etl_project_spark.operators.temporal import asof_join, range_join_binned
from politician_etl_project_spark.queries.registry import declared_query

_FMT = "yyyy-MM-dd HH:mm:ss"
_DFMT = "%Y-%m-%d %H:%M:%S"


@declared_query(
    "q_asof_join",
    oracle=f"""
SELECT p.event_id, p.user_id,
       strftime(p.ts, '{_DFMT}') AS purchase_ts,
       strftime(c.ts, '{_DFMT}') AS click_ts,
       COALESCE(CAST(epoch_us(p.ts) // 1000000 - epoch_us(c.ts) // 1000000 AS BIGINT), -1) AS gap_s
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
""",
    ops=("TMP-asof",),
    doc="As-of join: each purchase matched to the same user's most recent "
    "click at-or-before it (left join — purchases before any click keep "
    "NULL). Spark side is the union + last-non-null-carry-forward "
    "composition: ONE shuffle on user_id, no pair blowup; the oracle is "
    "DuckDB's native ASOF LEFT JOIN, so the composition's semantics "
    "(greatest ts <= left ts, ties to the right side) are hash-verified.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(purchases, clicks, key="user_id", ts="ts")
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _FMT).alias("purchase_ts"),
        F.date_format("ts_right", _FMT).alias("click_ts"),
        # unmatched purchases (left join) -> -1 sentinel: a NULLable
        # numeric output is a driver hazard (pandas floats nullable int64)
        F.coalesce(
            (F.unix_timestamp("ts") - F.unix_timestamp("ts_right")).cast("bigint"), F.lit(-1)
        ).alias("gap_s"),
    ).orderBy("event_id")


@declared_query(
    "q_range_join",
    oracle="""
SELECT v.user_id, COUNT(*) AS n_pairs
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND p.ts > v.ts
 AND p.ts <= v.ts + INTERVAL 600 SECONDS
GROUP BY v.user_id
ORDER BY v.user_id
""",
    ops=("TMP-range",),
    doc="Range join: (view, purchase) pairs of the same user within 10 "
    "minutes, counted per user. Spark executes a raw time inequality as "
    "BroadcastNestedLoopJoin (O(n·m)); the operator bins timestamps by "
    "the range width and probes (bin, bin+1) — an equi-join on "
    "(user, bin) that every qualifying pair must hit, refined by the "
    "exact inequality. The oracle runs the direct theta join in DuckDB.",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select("user_id", "ts")
    purchases = events.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    pairs = range_join_binned(views, purchases, key="user_id", ts="ts", width_seconds=600)
    return (
        pairs.groupBy("user_id").agg(F.count("*").alias("n_pairs")).orderBy("user_id")
    )
