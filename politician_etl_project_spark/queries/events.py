"""Event-stream operators, batch-checkable form (SURVEY.md §2.11, §2.9).

The reference's incremental pipeline is watermark-filtered micro-batch
(update_log + since-date skip, scripts/update_donations.py:52-65,184-186);
its true streaming surface is what the north star adds.  Each operator
here is declared as a *batch* query over the ``events`` table so the
DuckDB oracle can check it; the same logic runs under Structured
Streaming in ``politician_etl_project_spark.streaming`` (tested in
tests/test_streaming.py with Trigger.availableNow).

Timestamp convention: boundaries are compared as ``unix micros`` BIGINTs
(Spark ``unix_micros`` ≡ DuckDB ``epoch_us``) — exact, no format
ambiguity; round bucket starts are rendered as strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from politician_etl_project_spark.catalog import load_table
from politician_etl_project_spark.functions.scalar import money
from politician_etl_project_spark.queries.registry import declared_query

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_DUCK_TS_FMT = "%Y-%m-%d %H:%M:%S"


def _ts_us(col: str = "ts") -> F.Column:
    """Event time as unix-micros BIGINT regardless of whether the parquet
    column decoded as TIMESTAMP or TIMESTAMP_NTZ (isAdjustedToUTC flips
    with the writer).  The session timezone is pinned UTC (session.py),
    so the NTZ->LTZ cast is the identity on the underlying micros and
    matches DuckDB's epoch_us over its naive timestamps exactly."""
    return F.unix_micros(F.col(col).cast("timestamp_ltz"))


@declared_query(
    "q_tumbling_window",
    oracle=f"""
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_DUCK_TS_FMT}') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
    ops=("T3", "A4"),
    doc="Tumbling 1-hour window aggregate — Spark window() grouping; the "
    "streaming twin (readStream + withWatermark) is "
    "streaming/pipelines.py:windowed_counts.",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(money("value")).cast("decimal(18,2)").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@declared_query(
    "q_sliding_window",
    oracle=f"""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS win_start, user_id FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS win_start, user_id FROM events
)
SELECT strftime(win_start, '{_DUCK_TS_FMT}') AS window_start,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM assigned
GROUP BY win_start
ORDER BY window_start
""",
    ops=("T3",),
    doc="Sliding window (1 h window, 30 min slide): each event lands in two "
    "overlapping windows. Spark window(ts, '1 hour', '30 minutes'); oracle "
    "materializes the two bucket assignments explicitly.",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "n_events",
            "n_users",
        )
        .orderBy("window_start")
    )


@declared_query(
    "q_session_windows",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
), marked AS (
  SELECT user_id, ts_us, event_id,
         CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
  FROM ordered
), sessions AS (
  -- (ts_us, event_id) tie-break, matching the Spark window: without it
  -- the ROWS-frame sum over tied microseconds is unspecified and a
  -- same-instant pair could land in different sessions per engine
  SELECT user_id, ts_us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id, session_id,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) AS session_end_us,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
    ops=("T6", "W1"),
    doc="Gap-based sessionization (30-min gap) via lag + cumulative-sum "
    "windows — the batch-checkable twin of Structured Streaming "
    "session_window (streaming/pipelines.py:session_counts). Timestamps "
    "compared as unix-micros BIGINT for exactness.",
)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    gap_us = 30 * 60 * 1_000_000
    # both windows share ONE partition key and ONE sort key (ts_us,
    # event_id): catalyst plans a single exchange + single sort and the
    # cumsum rides the lag's ordering; the event_id tie-break also makes
    # the running sum deterministic when two events share a microsecond
    w_order = Window.partitionBy("user_id").orderBy(F.asc("ts_us"), F.asc("event_id"))
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts_us"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = (
        events.select("user_id", _ts_us().alias("ts_us"), "event_id")
        .withColumn("prev_us", F.lag("ts_us").over(w_order))
        .withColumn(
            "is_new",
            F.when(F.col("prev_us").isNull() | (F.col("ts_us") - F.col("prev_us") > gap_us), 1).otherwise(0),
        )
    )
    return (
        marked.withColumn("session_id", F.sum("is_new").over(w_cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


@declared_query(
    "q_event_dedup",
    oracle="""
SELECT user_id, event_type, first_event_id, first_ts_us
FROM (
  SELECT user_id, event_type, event_id AS first_event_id, epoch_us(ts) AS first_ts_us,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id, event_type
""",
    ops=("T6", "A14"),
    doc="Keyed dedup keep-earliest (reference cross-batch donor dedup dict, "
    "scripts/update_donations.py:237 — as a deterministic row_number; the "
    "streaming twin is dropDuplicatesWithinWatermark, "
    "streaming/pipelines.py:dedup_stream).",
)
def q_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        events.select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            _ts_us().alias("first_ts_us"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id", "event_type")
    )


@declared_query(
    "q_json_extract",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_high,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       MAX(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events
WHERE TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
GROUP BY event_type
ORDER BY event_type
""",
    ops=("N7", "P5"),
    doc="JSON field extraction + predicate + aggregate (reference LLM JSON "
    "parse with schema, app/app.py:374-398; vote JSON flatten family "
    "SURVEY §2.9).",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.withColumn("k", k)
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_high"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@declared_query(
    "q_watermark_cutoff",
    oracle="""
SELECT event_type, COUNT(*) AS n_recent
FROM events
WHERE ts >= (SELECT MAX(ts) - INTERVAL '7 days' FROM events)
GROUP BY event_type
ORDER BY event_type
""",
    ops=("T1", "T2", "A13"),
    doc="Watermark read + late/old-data skip as batch (reference "
    "max(last_update) from update_log then transaction_date >= since, "
    "scripts/update_donations.py:52-65,184-186). The scalar max is "
    "broadcast into the filter — no driver round-trip.",
)
def q_watermark_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cutoff = events.agg((F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cutoff"))
    return (
        events.join(F.broadcast(cutoff))
        .filter(F.col("ts") >= F.col("cutoff"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_recent"))
        .orderBy("event_type")
    )


@declared_query(
    "q_pii_scrub",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT md5('pseud-v1|' || CAST(user_id AS VARCHAR))) AS n_pseudonyms,
       COUNT(DISTINCT regexp_replace(props, '[0-9]+', '#', 'g')) AS n_prop_shapes,
       MIN(md5('pseud-v1|' || CAST(user_id AS VARCHAR))) AS sample_pseudonym
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    ops=("TXT-pii", "A2", "F11"),
    doc="PII handling for training pipelines, both standard moves in one "
    "pass: (a) PSEUDONYMIZATION — user ids become keyed md5 tokens, "
    "consistent across the corpus so joins/sessionization still work "
    "after scrubbing (n_pseudonyms == n_users is the collision check, "
    "verified by the oracle hash); (b) REDACTION — digit runs in the "
    "raw payload are masked to '#', and the distinct redacted shapes "
    "count shows the residual payload cardinality a privacy review "
    "audits.  Pure narrow expressions (md5/regexp_replace in codegen) + "
    "one grouped aggregate; at 100 TB the pseudonym key comes from a "
    "secret salt (here a fixed literal so the oracle can replay it).",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pseud = F.md5(F.concat(F.lit("pseud-v1|"), F.col("user_id").cast("string")))
    shape = F.regexp_replace("props", r"[0-9]+", "#")
    # one aggregate per COUNT DISTINCT, joined on the tiny event_type
    # key: three distincts in a single agg would Expand x4 and fall out
    # of partial aggregation (measured 1.05 s -> 0.51 s at sf0.1; same
    # split discipline as q_data_profile / q_approx_sketches).  The join
    # key is a NULL-coalesced twin (_gk) so a NULL event_type group —
    # which the single-aggregate form and the SQL GROUP BY both keep —
    # survives the split's inner joins too (NULL != NULL under plain
    # equality; review finding r4).
    gk = F.coalesce(F.col("event_type"), F.lit("\x00null\x00")).alias("_gk")
    base = events.groupBy("event_type").agg(
        F.count("*").alias("n_events"), F.min(pseud).alias("sample_pseudonym")
    ).select("*", gk)
    d_users = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    ).select(gk, "n_users")
    d_pseud = events.groupBy("event_type").agg(
        F.countDistinct(pseud).alias("n_pseudonyms")
    ).select(gk, "n_pseudonyms")
    d_shape = events.groupBy("event_type").agg(
        F.countDistinct(shape).alias("n_prop_shapes")
    ).select(gk, "n_prop_shapes")
    return (
        base.join(d_users, "_gk")
        .join(d_pseud, "_gk")
        .join(d_shape, "_gk")
        .select(
            "event_type",
            "n_events",
            "n_users",
            "n_pseudonyms",
            "n_prop_shapes",
            "sample_pseudonym",
        )
        .orderBy(F.asc_nulls_last("event_type"))  # DuckDB default is NULLS LAST
    )


@declared_query(
    "q_scd2_history",
    oracle="""
SELECT user_id, event_type AS state, valid_from_us,
       COALESCE(valid_to_us, -1) AS valid_to_us,
       (valid_to_us IS NULL) AS is_current
FROM (
  SELECT user_id, event_type, epoch_us(ts) AS valid_from_us,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us
  FROM events
  WHERE user_id < 25
)
ORDER BY user_id, valid_from_us, state
""",
    ops=("T-scd2", "W1", "S12"),
    doc="Slowly-changing-dimension type-2 history build: each user's "
    "event stream becomes versioned state intervals — valid_from = the "
    "event time, valid_to = the NEXT event's time (lead over the "
    "user-partitioned, time-ordered window), open interval (-1 sentinel, "
    "driver rule: no nullable numerics at the boundary) marks the "
    "current row.  This is how an upsert log (reference: "
    "politician_update_log, scripts/update_donations.py:52-65) is "
    "replayed into point-in-time-queryable history.  One window per "
    "user partition — single shuffle on user_id, no self-join; at "
    "100 TB this is the standard CDC-to-SCD2 compaction shape "
    "(partition by key, sort within partition).  user_id < 25 bounds "
    "the declared output; the operator itself is unbounded.",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hist = (
        events.filter(F.col("user_id") < 25)
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            _ts_us().alias("valid_from_us"),
            F.lead(_ts_us()).over(w).alias("_next_us"),
        )
    )
    return hist.select(
        "user_id",
        "state",
        "valid_from_us",
        F.coalesce("_next_us", F.lit(-1)).alias("valid_to_us"),
        F.col("_next_us").isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from_us", "state")


@declared_query(
    "q_event_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.t2
  GROUP BY e.user_id
)
SELECT step, n_users FROM (
  SELECT '1_view' AS step, COUNT(*) AS n_users FROM v
  UNION ALL SELECT '2_click_after_view', COUNT(*) FROM c
  UNION ALL SELECT '3_purchase_after_click', COUNT(*) FROM p
)
ORDER BY step
""",
    ops=("EVT-funnel", "A7", "J1"),
    doc="Ordered conversion funnel: users who viewed -> clicked AFTER "
    "their first view -> purchased AFTER that first qualifying click.  "
    "The ORDERING constraint is what separates this from three plain "
    "counts (a purchase before any view must not convert) and is what "
    "product-analytics engines special-case; here it is three min-ts "
    "aggregates chained by user-key joins — every stage shuffles on "
    "user_id, so at scale the three aggregations ride one partitioning "
    "and the joins are co-located.  All outputs are integer counts: "
    "hash-exact.",
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("n_users")).select(F.lit("1_view").alias("step"), "n_users")
        .unionByName(c.agg(F.count("*").alias("n_users")).select(F.lit("2_click_after_view").alias("step"), "n_users"))
        .unionByName(p.agg(F.count("*").alias("n_users")).select(F.lit("3_purchase_after_click").alias("step"), "n_users"))
        .orderBy("step")
    )


@declared_query(
    "q_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '2024-01-01', MIN(ts)::DATE) // 7 AS BIGINT) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_diff('day', DATE '2024-01-01', e.ts::DATE) // 7 AS BIGINT) - f.cohort_week AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_week, week_offset, COUNT(*) AS n_active_users
FROM activity
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
    ops=("EVT-retention", "A2", "W1"),
    doc="Weekly cohort retention matrix: users grouped by the week of "
    "their first event; each later active week counts toward that "
    "cohort's offset column — the analytics table behind every "
    "retention curve.  Week ids are INTEGER day-arithmetic (epoch days "
    "div 7 from a fixed origin), so no date-formatting ambiguity "
    "reaches the hash.  Shape: one min-ts aggregate, a user-key join "
    "back (co-partitioned with the aggregate), distinct, and a grouped "
    "count — two shuffles total at any scale.",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.floor(F.datediff(F.to_date(F.min("ts")), F.lit("2024-01-01")) / 7).cast("bigint").alias("cohort_week")
    )
    activity = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(F.datediff(F.to_date("ts"), F.lit("2024-01-01")) / 7).cast("bigint")
                - F.col("cohort_week")
            ).alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# T5 driver-grade evidence: two-batch incremental MERGE replay
# ---------------------------------------------------------------------------


def _merge_replay_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once two-batch MERGE replay table (cache discipline of
    queries/textops._ingest_index_path: keyed on the source fingerprint,
    staged + renamed so concurrent queries never read a half-written
    table).  Batch b0 = events with event_id %% 4 != 3; batch b1 = odd
    event_ids with value shifted +100 — the overlap (event_id %% 4 == 1)
    must keep b0's ORIGINAL value under first-wins (ON CONFLICT DO
    NOTHING), while the genuinely-new keys (event_id %% 4 == 3) land
    with the shifted value.  Both writes go through the REAL
    ParquetUpsertTable.upsert used by
    streaming.pipelines.incremental_upsert_stream's foreachBatch — this
    is the driver-checkable twin of that pytest-only path."""
    import os
    import tempfile

    from politician_etl_project_spark.catalog import ensure_built_dir, tmp_cache_key
    from politician_etl_project_spark.operators.upsert import ParquetUpsertTable

    key = tmp_cache_key(sf_dir, "events.parquet", version="merge-replay-v1")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_merge_{key}")

    def _build(staging: str) -> None:
        events = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        table = ParquetUpsertTable(spark, staging, keys=["event_id"])
        table.upsert(events.filter(F.col("event_id") % 4 != 3), update_wins=False)
        table.upsert(
            events.filter(F.col("event_id") % 2 == 1).withColumn(
                "value", F.col("value") + F.lit(100.0)
            ),
            update_wins=False,
        )

    return ensure_built_dir(path, _build)


@declared_query(
    "q_merge_batch_replay",
    oracle="""
WITH b0 AS (
  SELECT event_id, event_type, value FROM events WHERE event_id % 4 <> 3
), b1 AS (
  SELECT event_id, event_type, value + 100.0 AS value FROM events WHERE event_id % 2 = 1
), final AS (
  SELECT * FROM b0
  UNION ALL
  SELECT * FROM b1 WHERE event_id NOT IN (SELECT event_id FROM b0)
)
SELECT event_type,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total_value,
       CAST(SUM(CASE WHEN event_id % 4 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_from_b1
FROM final
GROUP BY event_type
ORDER BY event_type
""",
    ops=("T5", "S12", "S13", "A2"),
    doc="Two-batch incremental MERGE replayed end-to-end through the real "
    "managed-table write path (operators/upsert.ParquetUpsertTable — the "
    "same upsert foreachBatch calls in "
    "streaming/pipelines.incremental_upsert_stream), then verified "
    "against a DuckDB oracle that recomputes the final table "
    "algebraically: batch b0 inserts 3/4 of events, batch b1 re-sends "
    "every odd event_id with value+100, and first-wins (ON CONFLICT DO "
    "NOTHING, the reference's scripts/update_donations.py:258-307 "
    "semantics) must keep b0's original value on the overlap while "
    "admitting only the genuinely-new keys.  The per-type totals hash "
    "would shift by exactly 100 per wrongly-updated row, so the check "
    "is sensitive to a single violated conflict.  Deterministic batch "
    "composition makes reruns idempotent (build-once cache keyed on the "
    "source fingerprint).  Scale: each MERGE reads only the store once "
    "and stages + swaps — the partition-scoped variant (partition_cols) "
    "rewrites only touched partitions at 100 TB.",
)
def q_merge_batch_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _merge_replay_path(spark, sf_dir)
    final = spark.read.parquet(path)
    return (
        final.groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .alias("total_value"),
            F.sum(F.when(F.col("event_id") % 4 == 3, 1).otherwise(0))
            .cast("bigint")
            .alias("n_from_b1"),
        )
        .orderBy("event_type")
    )


from politician_etl_project_spark.queries.textops import CMS_DUCK_BUCKET_FMT as _CMS_FMT

# the ONE count-min bucket formula (see textops), bound to event_type
_ECMS_DUCK = _CMS_FMT.replace("{col}", "event_type").replace("{width}", "64")


@declared_query(
    "q_sketch_merge_replay",
    oracle=f"""
SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM (
  SELECT dd.d,
         CASE dd.d WHEN 0 THEN {_ECMS_DUCK.format(d=0)}
                   WHEN 1 THEN {_ECMS_DUCK.format(d=1)}
                   ELSE {_ECMS_DUCK.format(d=2)} END AS bucket
  FROM events CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS d) dd
)
GROUP BY d, bucket
ORDER BY d, bucket
""",
    ops=("TXT-countmin", "T5", "A2"),
    doc="Two-batch count-min maintenance replayed as a declared query: "
    "the event stream splits into two batches (event_id parity), each "
    "batch builds its own 3x64 sketch via the SAME _event_cms the "
    "streaming maintainer uses (streaming/pipelines."
    "sketch_maintenance_stream), and the batches merge by the monoid "
    "add (union + keyed sum) — exactly the per-micro-batch store "
    "update.  The DuckDB oracle computes the ONE-PASS sketch of the "
    "full stream, so the hash match PROVES the merge is lossless "
    "(sketch(a) + sketch(b) == sketch(a ++ b)), at driver grade rather "
    "than pytest-only (round-3 verdict item 6).  Scale: sketches are "
    "192 fixed rows regardless of stream length — maintenance shuffles "
    "192 rows per batch, never rescans history.",
)
def q_sketch_merge_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.streaming.pipelines import _event_cms

    events = load_table(spark, sf_dir, "events")
    b0 = _event_cms(events.filter(F.col("event_id") % 2 == 0))
    b1 = _event_cms(events.filter(F.col("event_id") % 2 == 1))
    return (
        b0.unionByName(b1)
        .groupBy("d", "bucket")
        .agg(F.sum("c").cast("bigint").alias("c"))
        .orderBy("d", "bucket")
    )


import contextlib


@contextlib.contextmanager
def _live_stream_conf(spark: SparkSession, n: int = 8):
    """_pinned_state_partitions PLUS noDataMicroBatches=false, scoped to
    a live-query run.  AvailableNow appends a final NO-DATA micro-batch
    whose only jobs here are watermark-driven state EVICTION and timer
    firing — one more full round of state-store commits across every
    partition.  The two queries under this conf don't need it for
    correctness: the stateful accumulator runs GroupStateTimeout.
    NoTimeout (nothing to fire), and the stream-stream join is INNER
    (pairs emit in the data batch where both sides meet; the no-data
    batch only evicts, never emits).  Measured round 9
    (tools/measure_streaming_floor.py, sf0.1): stateful totals
    4.0→3.4 s, interval join 5.0→2.9-3.6 s — ~95% of the remaining
    wall is micro-batch construction + per-partition store commits,
    i.e. the engine floor for 3-batch KB-state runs.  RocksDB was
    MEASURED SLOWER at this state size (4.5/5.4 s: JNI + file ops per
    commit beat the in-memory HDFS-backed map only when state exceeds
    executor memory).  Watermark-dependent queries (latedrop, outer
    session windows) keep the default — their semantics USE the final
    eviction pass."""
    prev = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        with _pinned_state_partitions(spark, n):
            yield
    finally:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev)


@contextlib.contextmanager
def _pinned_state_partitions(spark: SparkSession, n: int = 8):
    """Scope spark.sql.shuffle.partitions to ``n`` around a streaming
    query RUN — hold it from start() through awaitTermination(): the
    partition count only becomes durable when the first micro-batch
    writes its offset-log metadata, and start() returns before that.

    Why: every stateful streaming operator commits one state-store
    delta PER PARTITION PER MICRO-BATCH (a stream-stream join commits
    four), so at the session's 32 partitions a 3-batch AvailableNow
    run is 100-400 store commits of pure bookkeeping for per-key state
    measured in KBs — measured 1.6x-4x of the wall-clock of these
    fixture-scale runs.  Pinning to 8 is the per-query state sizing a
    100 TB deployment does by key cardinality; the declared queries
    here have at most |users| or |open windows| keys per batch."""
    conf = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf)
    spark.conf.set(conf, str(n))
    try:
        yield
    finally:
        spark.conf.set(conf, prev)


def _latedrop_staging(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events fixture as a 3-file streaming input that makes
    watermark late-drop REAL and deterministic under Trigger.AvailableNow
    (one file per micro-batch via maxFilesPerTrigger=1):

    - ``chunk-000``: every on-time row (includes the global max ts, so
      the final watermark value is fixed from the first batch);
    - ``chunk-001``: the max-ts row re-sent.  Spark applies a watermark
      one batch AFTER the data that produced it (the value computed
      from batch N's max event time takes effect in batch N+2's
      row filter — measured on this Spark version), so this one-row
      batch exists purely to COMMIT the watermark before the late rows
      arrive.  Its own effect is invisible in append output: the max
      row's window never closes, so the duplicate is never emitted.
    - ``chunk-002``: the held-back LATE rows (ts older than max-2d on a
      user_id slice) — they arrive with the watermark at max-1h in
      effect, and every one of their windows ended long before it, so
      the watermark filter drops them all (visible as
      numRowsDroppedByWatermark in the query progress).

    Idempotent per (sf_dir, events file mtime+size): staged once under
    /tmp and reused; a torn staging attempt is invisible because the
    directory is renamed into place atomically."""
    import hashlib
    import os
    import shutil
    import time

    src = os.path.join(os.path.abspath(sf_dir), "events.parquet")
    st = os.stat(src)
    key = hashlib.md5(f"{src}|{st.st_mtime_ns}|{st.st_size}|v1".encode()).hexdigest()[:12]
    base = f"/tmp/spark_graft_latedrop_{key}"
    inp = os.path.join(base, "input")
    if os.path.isdir(inp):
        return inp

    events = load_table(spark, sf_dir, "events")
    cut = events.agg((F.max("ts") - F.expr("INTERVAL 2 DAYS")).alias("c")).first()["c"]
    late = (F.col("ts") < F.lit(cut)) & (F.col("user_id") % 17 == 3)

    tmp = f"{base}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "input"))

    def _one_file(df, name: str, mtime: float) -> None:
        stage = os.path.join(tmp, "write")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dest = os.path.join(tmp, "input", name)
        shutil.move(os.path.join(stage, part), dest)
        os.utime(dest, (mtime, mtime))  # file source orders by mod time

    now = time.time()
    _one_file(events.filter(~late), "chunk-000.parquet", now - 100)
    _one_file(events.orderBy(F.desc("ts")).limit(1), "chunk-001.parquet", now - 50)
    _one_file(events.filter(late), "chunk-002.parquet", now)
    shutil.rmtree(os.path.join(tmp, "write"), ignore_errors=True)
    try:
        os.rename(tmp, base)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # concurrent winner staged it
    return inp


@declared_query(
    "q_watermark_latedrop",
    oracle=f"""
WITH wm AS (SELECT MAX(ts) - INTERVAL '1 hour' AS w FROM events),
on_time AS (
  SELECT * FROM events
  WHERE NOT (ts < (SELECT MAX(ts) - INTERVAL '2 days' FROM events) AND user_id % 17 = 3)
)
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '{_DUCK_TS_FMT}') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total_value
FROM on_time
WHERE time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' <= (SELECT w FROM wm)
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
    ops=("T1", "T2", "T3"),
    doc="Watermark advance + late-data drop run through the LIVE "
    "Structured Streaming path (streaming/pipelines.py:windowed_totals "
    "— readStream over a 3-file staging of the events fixture, "
    "withWatermark('1 hour'), append mode, Trigger.AvailableNow), not "
    "a batch twin: the held-back old rows arrive in the final "
    "micro-batch AFTER the watermark committed and are genuinely "
    "dropped by the stateful operator (numRowsDroppedByWatermark > 0 "
    "— asserted in tests/test_streaming.py), and only windows the "
    "watermark closed are emitted.  The oracle replays the exact "
    "semantics: aggregate the on-time rows, keep windows whose end "
    "<= max(ts) - 1h.  Reference analog: the since-date skip of "
    "already-loaded donations (scripts/update_donations.py:184-186). "
    "Scale: state is bounded by the watermark horizon (one hour of "
    "open windows per key), the file source is one-file-per-batch, "
    "and the memory sink holds only CLOSED windows — swap it for a "
    "parquet/foreachBatch sink unchanged at 100 TB.",
)
def q_watermark_latedrop(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from politician_etl_project_spark.streaming.pipelines import windowed_totals
    from politician_etl_project_spark.streaming.sources import EVENTS_SCHEMA

    inp = _latedrop_staging(spark, sf_dir)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    out = windowed_totals(stream, window="1 hour", slide=None, watermark="1 hour")
    qname = f"wm_latedrop_{uuid.uuid4().hex[:8]}"
    from politician_etl_project_spark.streaming.sources import _ephemeral_ckpt

    ckpt = _ephemeral_ckpt("ckpt-latedrop-")
    try:
        # conf stays pinned through awaitTermination: start() is async,
        # and the partition count is only captured into the offset-log
        # metadata when the FIRST micro-batch is constructed
        with _pinned_state_partitions(spark):
            q = (
                out.writeStream.outputMode("append")
                .format("memory")
                .queryName(qname)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(qname).orderBy("window_start", "event_type")


def _stateful_staging(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events fixture as 3 time-tercile files so users appear
    in MULTIPLE micro-batches (maxFilesPerTrigger=1) and the
    applyInPandasWithState accumulator genuinely carries state across
    batches — a single-file input would reduce it to a per-batch
    groupBy.  Same idempotent /tmp discipline as _latedrop_staging."""
    import hashlib
    import os
    import shutil
    import time

    src = os.path.join(os.path.abspath(sf_dir), "events.parquet")
    st = os.stat(src)
    key = hashlib.md5(f"{src}|{st.st_mtime_ns}|{st.st_size}|v1".encode()).hexdigest()[:12]
    base = f"/tmp/spark_graft_stateful_{key}"
    inp = os.path.join(base, "input")
    if os.path.isdir(inp):
        return inp

    events = load_table(spark, sf_dir, "events")
    lohi = events.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    lo, hi = lohi["lo"], lohi["hi"]

    tmp = f"{base}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "input"))

    def _one_file(df, name: str, mtime: float) -> None:
        stage = os.path.join(tmp, "write")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dest = os.path.join(tmp, "input", name)
        shutil.move(os.path.join(stage, part), dest)
        os.utime(dest, (mtime, mtime))

    now = time.time()
    if lo is None:  # empty fixture: one empty chunk, one empty batch
        _one_file(events, "chunk-000.parquet", now)
    else:
        span = hi - lo
        c1 = lo + span / 3
        c2 = lo + 2 * span / 3
        _one_file(events.filter(F.col("ts") < F.lit(c1)), "chunk-000.parquet", now - 100)
        _one_file(
            events.filter((F.col("ts") >= F.lit(c1)) & (F.col("ts") < F.lit(c2))),
            "chunk-001.parquet",
            now - 50,
        )
        _one_file(events.filter(F.col("ts") >= F.lit(c2)), "chunk-002.parquet", now)
    shutil.rmtree(os.path.join(tmp, "write"), ignore_errors=True)
    try:
        os.rename(tmp, base)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return inp


@declared_query(
    "q_stateful_totals_live",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
GROUP BY user_id
ORDER BY user_id
""",
    ops=("D5", "T5", "A2"),
    doc="Custom stateful aggregation (D5) run through the LIVE "
    "applyInPandasWithState path and hash-checked against a plain SQL "
    "GROUP BY — previously this operator family was pytest-pinned only "
    "(no oracle).  The events fixture streams as 3 time-tercile files "
    "(one micro-batch each, Trigger.AvailableNow), so per-user state "
    "(event count + exact integer-cents total, "
    "streaming/pipelines.user_running_totals_exact) is carried across "
    "batches in the state store and re-emitted per batch in update "
    "mode; the final emission per user — selected by max n_events, "
    "which strictly increases — must equal the global aggregate "
    "exactly.  Exactness is by construction: cents accumulate in "
    "int64, so batch split and accumulation order cannot perturb the "
    "hash (the float twin user_running_totals keeps pytest coverage).  "
    "Reference analog: the donor-totals dict the update scripts carry "
    "across chunks (scripts/update_donations.py:237).  Scale: state is "
    "one 16-byte tuple per user, Arrow-batched; the memory sink is a "
    "test harness — foreachBatch/parquet swaps in unchanged.",
)
def q_stateful_totals_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from politician_etl_project_spark.streaming.pipelines import user_running_totals_exact
    from politician_etl_project_spark.streaming.sources import EVENTS_SCHEMA, run_to_memory

    inp = _stateful_staging(spark, sf_dir)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    with _live_stream_conf(spark, n=8):
        emissions = run_to_memory(
            user_running_totals_exact(stream),
            f"stateful_totals_{uuid.uuid4().hex[:8]}",
            output_mode="update",
        )
    return (
        emissions.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.expr("max_by(total_cents, n_events)").alias("total_cents"),
        )
        .orderBy("user_id")
    )


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@contextlib.contextmanager
def _rocksdb_state_store(spark: SparkSession):
    """Scope the RocksDB state-store provider around one streaming run:
    transformWithState REQUIRES it (typed state variables + changelog
    checkpointing live there), while every other live query keeps the
    in-memory HDFS-backed provider, which measures faster at KB state
    (tools/measure_streaming_floor.py)."""
    conf = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf)
    spark.conf.set(conf, _ROCKSDB_PROVIDER)
    try:
        yield
    finally:
        spark.conf.set(conf, prev)


# NOTE: a declared transformWithStateInPandas twin of
# q_stateful_totals_live (streaming/pipelines.user_running_totals_tws,
# run under _rocksdb_state_store) is ENVIRONMENT-GATED like the PIL
# JPEG branch: Spark 4's arbitrary-state Python client speaks protobuf
# to the JVM (pyspark/sql/streaming/proto/StateMessage_pb2) and this
# container has no google.protobuf package, so the driver worker
# crashes at init ("cannot import name 'descriptor'").  The operator +
# its equality test live behind a skipif (tests/test_streaming.py::
# test_transform_with_state_matches_apply_in_pandas) and activate
# unchanged wherever protobuf exists.


@declared_query(
    "q_stream_interval_join_live",
    oracle="""
SELECT v.user_id,
       v.event_id AS v_id,
       p.event_id AS p_id,
       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON v.user_id = p.user_id
 AND p.ts > v.ts
 AND p.ts <= v.ts + INTERVAL 600 SECONDS
ORDER BY v_id, p_id
""",
    ops=("T1", "T2", "T3", "TMP-range", "J9"),
    doc="Stream-STREAM interval join run through the LIVE Structured "
    "Streaming path (streaming/pipelines.interval_join_stream): views "
    "and purchases read as two watermarked streams off the same 3-file "
    "time-tercile staging (one micro-batch per file, "
    "Trigger.AvailableNow), joined on user_id with the event-time bound "
    "p_ts in (v_ts, v_ts + 10min] inside the join condition — so a view "
    "from micro-batch k genuinely waits in the join STATE STORE to meet "
    "purchases arriving in batch k+1, and the watermark bound is what "
    "lets Spark evict it once no future purchase can qualify.  "
    "Previously this operator was pytest-pinned only (equality vs the "
    "batch binned range join, tests/test_streaming.py); the oracle runs "
    "the direct theta join in DuckDB, so the driver hash now proves the "
    "live path loses no pair and emits no phantom across the batch "
    "splits.  Eviction cannot drop a qualifying pair here by "
    "construction: terciles are time-ordered, so any purchase still to "
    "come is newer than the watermark horizon that would evict its "
    "view.  Reference analog: correlating donation events with the "
    "member activity that preceded them (app/metrics.py timeline "
    "joins), but incremental.  Scale: both streams shuffle once on "
    "user_id and co-partition; state is bounded by the watermark "
    "(10 min of views per user), the memory sink is a test harness — "
    "foreachBatch/parquet swaps in unchanged at 100 TB.",
)
def q_stream_interval_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from politician_etl_project_spark.streaming.pipelines import interval_join_stream
    from politician_etl_project_spark.streaming.sources import EVENTS_SCHEMA, run_to_memory

    inp = _stateful_staging(spark, sf_dir)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    views = stream.filter(F.col("event_type") == "view")
    purchases = stream.filter(F.col("event_type") == "purchase")
    # A stream-stream join is the heaviest state client (FOUR stores per
    # partition: keyToNumValues/keyWithIndexToValue, both sides) — at 32
    # partitions that is 128 store commits x 3 batches of bookkeeping
    # for KB-scale state (~20 s wall; 8 partitions measure ~4x faster,
    # 4 partitions + no-data batch off another ~40%: see
    # _live_stream_conf / tools/measure_streaming_floor.py).
    with _live_stream_conf(spark, n=4):
        pairs = run_to_memory(
            interval_join_stream(views, purchases, window_seconds=600),
            f"sj_live_{uuid.uuid4().hex[:8]}",
            output_mode="append",
        )
    return pairs.select(
        "user_id",
        "v_id",
        "p_id",
        (F.unix_micros(F.col("p_ts").cast("timestamp_ltz"))
         - F.unix_micros(F.col("v_ts").cast("timestamp_ltz"))).alias("gap_us"),
    ).orderBy("v_id", "p_id")


def _rollup_live_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once RollupStore MAINTAINED BY THE LIVE STREAM: the events
    fixture drains through rollup_maintenance_stream (3 time-tercile
    micro-batches, one guarded two-phase merge each) into a store under
    <dir>/store, with the run's checkpoint kept as a sibling — same
    idempotent staging+rename cache discipline as _latedrop_staging."""
    import os
    import tempfile

    from politician_etl_project_spark.catalog import ensure_built_dir, tmp_cache_key
    from politician_etl_project_spark.operators.rollup import RollupStore
    from politician_etl_project_spark.streaming.sources import EVENTS_SCHEMA

    key = tmp_cache_key(sf_dir, "events.parquet", version="rollup-live-v1")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_rolluplive_{key}")

    def _build(staging: str) -> None:
        from politician_etl_project_spark.streaming.pipelines import (
            rollup_maintenance_stream,
        )

        inp = _stateful_staging(spark, sf_dir)
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(inp)
        )
        store = RollupStore(spark, os.path.join(staging, "store"), ["event_type", "day"])
        rollup_maintenance_stream(
            stream, store, checkpoint_dir=os.path.join(staging, "ckpt")
        )

    return ensure_built_dir(path, _build)


@declared_query(
    "q_rollup_maintenance_live",
    oracle="""
SELECT event_type,
       strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total_value
FROM events
GROUP BY event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d')
ORDER BY event_type, day
""",
    ops=("T5", "AGG-incremental", "A4", "S12"),
    doc="Streaming materialized-view maintenance run through the LIVE "
    "path and driver-hash-checked: the event stream drains as 3 "
    "time-tercile micro-batches (Trigger.AvailableNow) through "
    "streaming/pipelines.rollup_maintenance_stream, each batch folding "
    "additive (count, exact-decimal-sum) partials into a "
    "bucket-partitioned RollupStore via its two-phase guarded merge "
    "(staged data + pending/done markers, batch ids scoped by "
    "checkpoint lineage).  The query then SERVES the store; the oracle "
    "is a full recompute over all events — the hash proves three "
    "partial merges are bit-equal to one rescan, which is what lets a "
    "dashboard stay fresh at O(batch) instead of O(100 TB) per load "
    "(the reference recomputes per page load, app/app.py metric "
    "queries).  Batch twin q_incremental_rollup proves the same "
    "algebra on orders; THIS query proves the streaming delivery — "
    "replay idempotency and crash windows are pinned in "
    "tests/test_streaming.py and test_operators.py.  Scale: each "
    "merge aggregates only the batch and touches only the store "
    "buckets the batch hits (partition-pruned); store size is "
    "O(groups), not O(events).",
)
def q_rollup_maintenance_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from politician_etl_project_spark.operators.rollup import RollupStore

    store = RollupStore(
        spark,
        os.path.join(_rollup_live_path(spark, sf_dir), "store"),
        ["event_type", "day"],
    )
    return (
        store.serve()
        .select(
            "event_type",
            "day",
            F.col("n").cast("bigint").alias("n_events"),
            F.col("s").cast("decimal(18,2)").alias("total_value"),
        )
        .orderBy("event_type", "day")
    )


def _snapshot_append_live_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once SnapshotTable WRITTEN BY THE LIVE STREAM: the events
    fixture drains through snapshot_append_stream (3 time-tercile
    micro-batches, one guarded immutable append version each) into
    <dir>/store.  Same idempotent staging+rename cache discipline as
    _latedrop_staging."""
    import os
    import tempfile

    from politician_etl_project_spark.catalog import ensure_built_dir, tmp_cache_key
    from politician_etl_project_spark.streaming.sources import EVENTS_SCHEMA

    key = tmp_cache_key(sf_dir, "events.parquet", version="snap-append-live-v1")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_snaplive_{key}")

    def _build(staging: str) -> None:
        from politician_etl_project_spark.streaming.pipelines import (
            snapshot_append_stream,
        )

        inp = _stateful_staging(spark, sf_dir)
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(inp)
        )
        snapshot_append_stream(
            stream,
            os.path.join(staging, "store"),
            checkpoint_dir=os.path.join(staging, "ckpt"),
        )

    return ensure_built_dir(path, _build)


@declared_query(
    "q_snapshot_append_live",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(3 AS INTEGER) AS n_versions,
       TRUE AS all_ops_guarded_appends
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    ops=("T5", "S11", "STORE-snapshot", "A2"),
    doc="Versioned streaming ingestion through the LIVE path, "
    "driver-hash-checked: the event stream drains as 3 time-tercile "
    "micro-batches (Trigger.AvailableNow) through "
    "streaming/pipelines.snapshot_append_stream, each batch committing "
    "as ONE immutable SnapshotTable append version under the two-tier "
    "replay guard (per-sink marker + manifest-op scan, op = "
    "append-<lineage>-b<batch>).  The query reads the surviving store "
    "and aggregates per event type in exact integer cents, emitting "
    "the version count (must be exactly one per micro-batch — a "
    "replayed or double-committed batch breaks it) and a flag that "
    "every manifest op matches this sink's guarded-append pattern; "
    "the oracle is a full recompute over the raw events.  Per-version "
    "tercile isolation and crash-window replay are pinned in "
    "tests/test_streaming.py (the tercile boundary is Python timedelta "
    "arithmetic, deliberately NOT replayed in SQL — engines round "
    "interval division differently at microsecond precision).  "
    "Reference analog: scripts/update_donations.py's destructive "
    "re-ingest loop, made time-travelable and replay-safe.  Scale: "
    "each batch appends O(batch) files and never rewrites history; "
    "the manifest audit trail doubles as the replay-marker store.",
)
def q_snapshot_append_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import re

    from politician_etl_project_spark.storage import SnapshotTable

    t = SnapshotTable(spark, os.path.join(_snapshot_append_live_path(spark, sf_dir), "store"))
    versions = t.versions()
    ops = [t._manifest(v)["op"] for v in versions]
    guarded = all(re.fullmatch(r"append-[0-9a-f]{8}-b\d+", op) for op in ops)
    return (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("total_cents"),
        )
        .withColumn("n_versions", F.lit(len(versions)).cast("int"))
        .withColumn("all_ops_guarded_appends", F.lit(bool(guarded)))
        .orderBy("event_type")
    )
