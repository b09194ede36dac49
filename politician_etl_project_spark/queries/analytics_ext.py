"""Warehouse-analytics extensions: time-series gap fill, calendar dim,
snapshot diff, mergeable moments, equi-depth histograms, z-score outliers,
inverted index, skew diagnostics, weighted downsampling, ORC roundtrip,
A/B readout, PMI term association.

These extend the SURVEY §2 families with the remaining shapes a
warehouse / training-data pipeline runs daily (the reference's analytics
layer computes several of them in pandas over SQL pulls, e.g. the
donations-timeline resample in app/app.py and per-state aggregates in
app/app_old.py:141; here each is one declarative Spark plan with an exact
DuckDB oracle).

Cross-engine determinism rules follow FIXTURES.md: decimal-before-agg,
micro-int fixed-point for transcendentals (the tfidf precedent in
textops.py), identical double expression trees for derived stats, and a
total ORDER BY over unique keys.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from politician_etl_project_spark.catalog import load_table
from politician_etl_project_spark.queries.registry import declared_query


# Shared fingerprint cache key (moved to catalog so queries/events.py's
# merge-replay table uses the same idiom).
from politician_etl_project_spark.catalog import tmp_cache_key as _tmp_key



# Engine-identical 32-bit content hash (same idiom as pipeline.py:29-31):
# md5 is bit-identical everywhere; both engines parse the first 8 hex chars
# to the same BIGINT.
_SPARK_HASH_DOC = "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"
_DUCK_HASH_DOC = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"
_SPARK_HASH_USER = "cast(conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10) as bigint)"
_DUCK_HASH_USER = "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)"


# ---------------------------------------------------------------------------
# Time-series gap fill + forward fill
# ---------------------------------------------------------------------------


@declared_query(
    "q_gap_fill",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS day_total
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), bounds AS (
  SELECT event_type, MIN(d) AS dmin, MAX(d) AS dmax FROM daily GROUP BY event_type
), spine AS (
  SELECT b.event_type, CAST(g.g AS DATE) AS d
  FROM bounds b, LATERAL (SELECT unnest(generate_series(b.dmin, b.dmax, INTERVAL 1 DAY)) AS g) g
)
SELECT s.event_type,
       strftime(s.d, '%Y-%m-%d') AS day,
       LAST_VALUE(dl.day_total IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_total,
       dl.day_total IS NOT NULL AS observed
FROM spine s LEFT JOIN daily dl ON s.event_type = dl.event_type AND s.d = dl.d
ORDER BY s.event_type, day
""",
    ops=("TS-gapfill", "A4", "W1"),
    doc="Time-series gap fill: a per-series date spine (sequence/explode "
    "between each series' own min and max day) left-joined to observed "
    "daily totals, missing days forward-filled with last-non-null over a "
    "per-series window.  The reference resamples its donations timeline "
    "in pandas (`.resample('D').ffill()`-style, app/app.py charts); here "
    "the spine is generated inside the plan — no driver loop.  Scale: "
    "the spine is |series| x |days| rows built from a tiny per-series "
    "bounds aggregate; the fill window partitions by series so no global "
    "sort exists.  Day totals are exact decimal sums; the first spine day "
    "per series is always observed, so the fill is never NULL.",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.col("value").cast("decimal(12,2)")).cast("decimal(18,2)").alias("day_total")
    )
    spine = (
        daily.groupBy("event_type")
        .agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
        .select("event_type", F.explode(F.sequence("dmin", "dmax")).alias("d"))
    )
    w = Window.partitionBy("event_type").orderBy("d")
    return (
        spine.join(daily, ["event_type", "d"], "left")
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.last("day_total", ignorenulls=True).over(w).alias("filled_total"),
            F.col("day_total").isNotNull().alias("observed"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Calendar dimension spine
# ---------------------------------------------------------------------------


@declared_query(
    "q_calendar_spine",
    oracle="""
WITH bounds AS (
  SELECT MIN(CAST(o_orderdate AS DATE)) AS dmin, MAX(CAST(o_orderdate AS DATE)) AS dmax
  FROM orders
), cal AS (
  SELECT CAST(g.g AS DATE) AS d
  FROM bounds b, LATERAL (SELECT unnest(generate_series(b.dmin, b.dmax, INTERVAL 1 DAY)) AS g) g
), per_day AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS day_total
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
)
SELECT strftime(c.d, '%Y-%m-%d') AS day,
       CAST(year(c.d) AS INTEGER) AS yr,
       CAST(quarter(c.d) AS INTEGER) AS qtr,
       CAST(month(c.d) AS INTEGER) AS mo,
       CAST(date_diff('day', DATE '1970-01-05', c.d) % 7 AS INTEGER) AS dow,
       c.d = last_day(c.d) AS is_month_end,
       CAST(COALESCE(p.n_orders, 0) AS BIGINT) AS n_orders,
       COALESCE(p.day_total, CAST(0 AS DECIMAL(18,2))) AS day_total
FROM cal c LEFT JOIN per_day p ON c.d = p.d
ORDER BY day
""",
    ops=("DIM-calendar", "S18", "F9"),
    doc="Generated calendar dimension joined to per-day order facts: the "
    "date spine every BI layer needs (zero-order days appear with "
    "explicit zeros instead of vanishing, the classic gap-in-the-chart "
    "bug in the reference's Streamlit timeline).  Day-of-week is pure "
    "epoch-day arithmetic from a fixed Monday origin (1970-01-05) so "
    "neither engine's locale-dependent dayofweek() enters the hash.  "
    "Scale: the spine derives from a 1-row bounds aggregate and is "
    "|days| rows — broadcast side of the join against the per-day "
    "aggregate; one fact shuffle total.",
)
def q_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    per_day = o.groupBy("d").agg(
        F.count("*").alias("n_orders"),
        F.sum("price").cast("decimal(18,2)").alias("day_total"),
    )
    spine = (
        o.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
        .select(F.explode(F.sequence("dmin", "dmax")).alias("d"))
    )
    return (
        spine.join(per_day, "d", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.year("d").cast("int").alias("yr"),
            F.quarter("d").cast("int").alias("qtr"),
            F.month("d").cast("int").alias("mo"),
            (F.datediff("d", F.lit("1970-01-05")) % 7).cast("int").alias("dow"),
            (F.col("d") == F.last_day("d")).alias("is_month_end"),
            F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
            F.coalesce("day_total", F.lit(0).cast("decimal(18,2)")).alias("day_total"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Snapshot diff (CDC-style reconciliation)
# ---------------------------------------------------------------------------


@declared_query(
    "q_snapshot_diff",
    oracle="""
WITH snap_a AS (
  SELECT l_orderkey AS k, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total
  FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01' GROUP BY l_orderkey
), snap_b AS (
  SELECT l_orderkey AS k, CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total
  FROM lineitem WHERE l_shipdate < TIMESTAMP '2000-01-01' GROUP BY l_orderkey
), tagged AS (
  SELECT COALESCE(b.k, a.k) AS k,
         CASE WHEN a.k IS NULL THEN 'added'
              WHEN a.total <> b.total THEN 'changed'
              ELSE 'unchanged' END AS status,
         COALESCE(b.total, CAST(0 AS DECIMAL(18,2))) - COALESCE(a.total, CAST(0 AS DECIMAL(18,2))) AS delta
  FROM snap_a a FULL OUTER JOIN snap_b b ON a.k = b.k
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(delta) AS DECIMAL(18,2)) AS total_delta
FROM tagged GROUP BY status ORDER BY status
""",
    ops=("CDC-diff", "J6", "U3"),
    doc="Snapshot reconciliation: order revenue totals as-of two cutoff "
    "dates, full-outer-joined on the key and classified added / changed "
    "/ unchanged with the net delta — the audit step behind every "
    "incremental load (the reference re-ingests FEC files and trusts "
    "row counts; this is the verifiable version).  Because the old "
    "snapshot's membership is a predicate over the same fact, BOTH "
    "as-of totals come from ONE scan + ONE shuffle (conditional sums "
    "per key — total_a NULL exactly when the key has no pre-T1 rows, "
    "i.e. 'added') instead of materializing two snapshots and "
    "full-outer-joining them; the oracle keeps the two-snapshot "
    "spelling, so the hash also proves the rewrite.  Deletes would "
    "appear as a 'removed' class symmetrically (the fixture's "
    "append-only dates produce none, so the output stays 3 rows).",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    t1 = F.lit("1999-01-01").cast("timestamp")
    t2 = F.lit("2000-01-01").cast("timestamp")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    per_key = (
        li.filter(F.col("l_shipdate") < t2)
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.when(F.col("l_shipdate") < t1, price)).cast("decimal(18,2)").alias("total_a"),
            F.sum(price).cast("decimal(18,2)").alias("total_b"),
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    tagged = per_key.select(
        F.when(F.col("total_a").isNull(), "added")
        .when(F.col("total_a") != F.col("total_b"), "changed")
        .otherwise("unchanged")
        .alias("status"),
        (F.col("total_b") - F.coalesce("total_a", zero)).alias("delta"),
    )
    return (
        tagged.groupBy("status")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("delta").cast("decimal(18,2)").alias("total_delta"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# Mergeable moments (distributed mean/variance via algebraic partials)
# ---------------------------------------------------------------------------

_MOMENTS_FINALS = (
    "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)",
    "CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)"
    " - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))",
)


@declared_query(
    "q_moments_mergeable",
    oracle=f"""
WITH partials AS (
  SELECT o_orderpriority, shard, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS s,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(30,4)) AS s2
  FROM (SELECT o_orderpriority, o_totalprice, o_orderkey % 8 AS shard FROM orders)
  GROUP BY o_orderpriority, shard
), merged AS (
  SELECT o_orderpriority, CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(s) AS DECIMAL(32,2)) AS s,
         CAST(SUM(s2) AS DECIMAL(38,4)) AS s2
  FROM partials GROUP BY o_orderpriority
)
SELECT o_orderpriority, n,
       ROUND({_MOMENTS_FINALS[0]}, 4) AS mean_price,
       ROUND({_MOMENTS_FINALS[1]}, 0) AS var_pop,
       ROUND(sqrt(greatest({_MOMENTS_FINALS[1]}, 0)), 2) AS std_pop
FROM merged ORDER BY o_orderpriority
""",
    ops=("AGG-moments", "A8", "A12"),
    doc="Mergeable moments sketch: per-shard (n, sum, sum-of-squares) "
    "partials in exact DECIMAL, algebraically merged, mean/variance "
    "derived only at the end — the commutative-monoid structure that "
    "lets running stats live in an incremental pipeline (partials from "
    "yesterday's partitions merge with today's without rescanning; same "
    "contract as q_hll_mergeable for count-distinct).  The partials "
    "are exact decimals, but the sum-of-squares exceeds 2^53 in scaled "
    "units, where DuckDB's DECIMAL->DOUBLE (int128 convert, then "
    "divide) double-rounds vs Spark's single correctly-rounded "
    "conversion — a measured 1-ulp divergence — so the derived "
    "mean/var/std are ROUNDed at digits ~1e9 ulps above the noise "
    "floor.  Shards here are synthetic (key % 8) to pin merge "
    "associativity in the oracle.",
)
def q_moments_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        (F.col("o_orderkey") % 8).alias("shard"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    partials = o.groupBy("o_orderpriority", "shard").agg(
        F.count("*").alias("n"),
        F.sum("price").cast("decimal(22,2)").alias("s"),
        F.sum(F.col("price") * F.col("price")).cast("decimal(30,4)").alias("s2"),
    )
    merged = partials.groupBy("o_orderpriority").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("s").cast("decimal(32,2)").alias("s"),
        F.sum("s2").cast("decimal(38,4)").alias("s2"),
    )
    mean, var = _MOMENTS_FINALS
    return merged.select(
        "o_orderpriority",
        "n",
        F.round(F.expr(mean), 4).alias("mean_price"),
        F.round(F.expr(var), 0).alias("var_pop"),
        F.round(F.expr(f"sqrt(greatest({var}, 0))"), 2).alias("std_pop"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# Equi-depth histogram (per-group ntile)
# ---------------------------------------------------------------------------


@declared_query(
    "q_equidepth_histogram",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price,
         NTILE(8) OVER (PARTITION BY o_orderpriority
                        ORDER BY CAST(o_totalprice AS DECIMAL(12,2)), o_orderkey) AS bucket
  FROM orders
)
SELECT o_orderpriority, CAST(bucket AS INTEGER) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(price) AS lo, MAX(price) AS hi
FROM ranked GROUP BY o_orderpriority, bucket
ORDER BY o_orderpriority, bucket
""",
    ops=("AGG-histogram", "W2", "A2"),
    doc="Equi-depth histogram: 8 equal-population buckets per priority "
    "class with per-bucket bounds — the optimizer-statistics shape "
    "(selectivity estimation wants depth-balanced, not width-balanced, "
    "bins).  NTILE is ordered by (value, unique key) so tie placement "
    "is total and both engines bucket identically.  The window "
    "partitions by the group key — per-group sort, no global ordering "
    "bottleneck; same scale stance as q_percentiles' rank arithmetic.",
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("price", "o_orderkey")
    return (
        o.withColumn("bucket", F.ntile(8).over(w))
        .groupBy("o_orderpriority", F.col("bucket").cast("int").alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("price").alias("lo"),
            F.max("price").alias("hi"),
        )
        .orderBy("o_orderpriority", "bucket")
    )


# ---------------------------------------------------------------------------
# Z-score outliers
# ---------------------------------------------------------------------------


@declared_query(
    "q_outlier_zscore",
    oracle="""
WITH stats AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS s,
         CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DECIMAL(30,4)) AS s2
  FROM events GROUP BY event_type
), params AS (
  SELECT event_type, n,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
              - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 0)) AS sd
  FROM stats
)
SELECT e.event_type,
       CAST(p.n AS BIGINT) AS n_events,
       CAST(COUNT(CASE WHEN p.sd > 0
                        AND abs((CAST(CAST(e.value AS DECIMAL(12,2)) AS DOUBLE) - p.mu) / p.sd) > 2.0
                       THEN 1 END) AS BIGINT) AS n_outliers
FROM events e JOIN params p ON e.event_type = p.event_type
GROUP BY e.event_type, p.n
ORDER BY e.event_type
""",
    ops=("AGG-outlier", "A6", "J7"),
    doc="Z-score outlier screen per event type: exact-decimal first/"
    "second moments -> population mean/std as identical double "
    "expressions, broadcast back onto the stream, |z| > 2 counted.  "
    "This is the quality gate a metrics pipeline runs before alerting "
    "on a sum (one poisoned value inflates a naive total).  The "
    "per-type params frame is group-cardinality rows — broadcast join, "
    "no second fact shuffle beyond the stats aggregate.  Comparisons "
    "at the threshold are safe because z is bit-identical on both "
    "engines (exact inputs, same expression tree).",
)
def q_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("decimal(12,2)").alias("v")
    )
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("v").cast("decimal(22,2)").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("decimal(30,4)").alias("s2"),
    )
    mu = "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
    var = (
        "CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)"
        f" - ({mu}) * ({mu})"
    )
    params = stats.select(
        "event_type",
        "n",
        F.expr(mu).alias("mu"),
        F.expr(f"sqrt(greatest({var}, 0))").alias("sd"),
    )
    return (
        ev.join(F.broadcast(params), "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.count(
                F.when(
                    (F.col("sd") > 0)
                    & (F.abs((F.col("v").cast("double") - F.col("mu")) / F.col("sd")) > 2.0),
                    1,
                )
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_events"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Inverted index (token -> posting list)
# ---------------------------------------------------------------------------


@declared_query(
    "q_inverted_index",
    oracle="""
WITH postings AS (
  SELECT t.token, d.doc_id
  FROM documents d, LATERAL (
    SELECT unnest(regexp_split_to_array(trim(d.text), '\\s+')) AS token) t
)
SELECT token,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(COUNT(*) AS BIGINT) AS tf,
       array_to_string(list_transform(list_sort(list(DISTINCT doc_id))[1:5],
                                      x -> CAST(x AS VARCHAR)), ',') AS posting_head
FROM postings
GROUP BY token
HAVING COUNT(DISTINCT doc_id) >= 8
ORDER BY df DESC, token
LIMIT 100
""",
    ops=("TXT-invindex", "A2", "A3"),
    doc="Inverted-index build: explode tokens to (token, doc) postings, "
    "aggregate document frequency, term frequency, and the head of the "
    "sorted posting list per token — the search-engine core the "
    "reference delegates to Pinecone metadata filters.  One shuffle on "
    "the token key; posting heads are built with collect_set + "
    "sort_array + slice so the emitted sample is order-canonical on "
    "both engines.  At 100 TB the full posting lists would go to a "
    "bucketed sink keyed by token rather than a LIMIT projection; the "
    "df>=8 floor plus top-100 keeps the verified surface deterministic.",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    postings = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )
    return (
        postings.groupBy("token")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("df"),
            F.count("*").cast("bigint").alias("tf"),
            F.array_join(
                F.transform(
                    F.slice(F.sort_array(F.collect_set("doc_id")), 1, 5),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("posting_head"),
        )
        .filter(F.col("df") >= 8)
        .orderBy(F.desc("df"), "token")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnostic
# ---------------------------------------------------------------------------


@declared_query(
    "q_skew_diagnostic",
    oracle="""
WITH per_key AS (
  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
)
SELECT CAST(length(bin(cnt)) - 1 AS INTEGER) AS log2_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(MAX(cnt) AS BIGINT) AS max_rows_one_key
FROM per_key
GROUP BY length(bin(cnt)) - 1
ORDER BY log2_bucket
""",
    ops=("DIAG-skew", "A2"),
    doc="Join-key skew profile: per-key row counts bucketed by "
    "floor(log2) — the histogram you read before deciding whether a "
    "shuffle join needs salting or AQE skew splitting (operators/"
    "skew.py implements the remedy; this is the diagnosis).  log2 is "
    "computed as the bit-length of the exact integer count (length of "
    "its binary rendering) so no transcendental touches the hash.  Two "
    "exact aggregates; the second input is |distinct keys| rows.",
)
def q_skew_diagnostic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    return (
        per_key.groupBy(
            (F.length(F.bin("cnt")) - 1).cast("int").alias("log2_bucket")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.max("cnt").cast("bigint").alias("max_rows_one_key"),
        )
        .orderBy("log2_bucket")
    )


# ---------------------------------------------------------------------------
# Weighted (per-source) deterministic downsampling
# ---------------------------------------------------------------------------

_DOWNSAMPLE_RATES = "CASE source WHEN 'web' THEN 2500 WHEN 'wiki' THEN 10000 WHEN 'books' THEN 10000 WHEN 'code' THEN 5000 ELSE 5000 END"


@declared_query(
    "q_weighted_downsample",
    oracle=f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(COUNT(CASE WHEN {_DUCK_HASH_DOC} % 10000 < {_DOWNSAMPLE_RATES}
                       THEN 1 END) AS BIGINT) AS n_kept,
       CAST({_DOWNSAMPLE_RATES} AS BIGINT) AS rate_bp
FROM documents
GROUP BY source
ORDER BY source
""",
    ops=("PIPE-downsample", "P3", "A6"),
    doc="Importance-weighted downsampling: each source gets a keep rate "
    "in basis points (web 25%, code 50%, wiki/books 100% — the "
    "rebalancing every pretraining mixture applies to over-crawled "
    "domains), membership decided by an md5-derived integer hash of the "
    "stable doc id against the rate — pure integer arithmetic, so the "
    "decision is content-stable (re-running on a grown corpus never "
    "flips an existing doc, unlike rand()-based sample()) and exact on "
    "both engines.  Narrow map + one aggregate; at 100 TB the kept set "
    "writes out partition-parallel with no shuffle at all.",
)
def q_weighted_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    rate = F.expr(_DOWNSAMPLE_RATES)
    h = F.expr(_SPARK_HASH_DOC)
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_total"),
            F.count(F.when(h % 10000 < rate, 1)).cast("bigint").alias("n_kept"),
        )
        .withColumn("rate_bp", rate.cast("bigint"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# ORC roundtrip (columnar-format interchange)
# ---------------------------------------------------------------------------


@declared_query(
    "q_orc_roundtrip",
    oracle="""
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
""",
    ops=("S11", "SRC-orc"),
    doc="ORC sink + scan roundtrip: document metadata written to ORC "
    "(Spark's second built-in columnar format — the interchange path "
    "for Hive-era warehouses the parquet-only reference can't read), "
    "read back, and aggregated; the oracle aggregates the original "
    "parquet, so the hash proves the roundtrip is lossless.  The "
    "payload column is pruned before the write — format conversion "
    "jobs should never carry columns the consumer won't read.  Write "
    "is stage-then-swap idempotent like ParquetUpsertTable.overwrite.",
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    key = _tmp_key(sf_dir, "documents.parquet")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_orc_{key}")
    d.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return (
        back.groupBy("lang", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# A/B experiment readout
# ---------------------------------------------------------------------------


@declared_query(
    "q_abtest_lift",
    oracle=f"""
WITH assigned AS (
  SELECT user_id, {_DUCK_HASH_USER} % 2 AS variant,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
)
SELECT CAST(variant AS INTEGER) AS variant,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       CAST((1000000 * CAST(SUM(converted) AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS BIGINT) AS conv_micro
FROM assigned GROUP BY variant ORDER BY variant
""",
    ops=("EVT-abtest", "A6", "F8"),
    doc="A/B readout: users hash-assigned to two variants (md5-derived "
    "integer — deterministic, balanced, and stable under re-runs, the "
    "property RNG assignment lacks), per-variant user and converter "
    "counts plus conversion rate in exact micro-units (integer DIV — "
    "no float or decimal division reaches the hash).  Two "
    "aggregates riding one user_id shuffle.",
)
def q_abtest_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted")
    ).select(
        (F.expr(_SPARK_HASH_USER) % 2).alias("variant"), "converted"
    )
    return (
        assigned.groupBy(F.col("variant").cast("int").alias("variant"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_converted"),
            F.expr("CAST((1000000 * CAST(SUM(converted) AS BIGINT)) DIV COUNT(*) AS BIGINT)").alias(
                "conv_micro"
            ),
        )
        .orderBy("variant")
    )


# ---------------------------------------------------------------------------
# PMI term-source association
# ---------------------------------------------------------------------------


@declared_query(
    "q_pmi_terms",
    oracle="""
WITH tok AS (
  SELECT DISTINCT d.doc_id, d.source, t.token
  FROM documents d, LATERAL (
    SELECT unnest(regexp_split_to_array(trim(d.text), '\\s+')) AS token) t
), joint AS (
  SELECT token, source, COUNT(*) AS n_ts FROM tok GROUP BY token, source
), tmarg AS (
  SELECT token, SUM(n_ts) AS n_t FROM joint GROUP BY token
), smarg AS (
  SELECT source, SUM(n_ts) AS n_s FROM joint GROUP BY source
), total AS (
  SELECT SUM(n_ts) AS n FROM joint
)
SELECT j.token, j.source,
       CAST(j.n_ts AS BIGINT) AS n_joint,
       CAST(FLOOR(1000000 * ln((CAST(j.n_ts AS DOUBLE) * CAST(t2.n AS DOUBLE))
                             / (CAST(tm.n_t AS DOUBLE) * CAST(sm.n_s AS DOUBLE)))) AS BIGINT) AS pmi_micro
FROM joint j
JOIN tmarg tm ON j.token = tm.token
JOIN smarg sm ON j.source = sm.source
CROSS JOIN total t2
WHERE tm.n_t >= 40
ORDER BY pmi_micro DESC, j.token, j.source
LIMIT 50
""",
    ops=("TXT-pmi", "A10", "J7"),
    doc="Pointwise mutual information between tokens and sources: which "
    "terms are over-represented in which corpus slice — the "
    "domain-signature diagnostic run before mixing corpora (a term "
    "with high PMI to one source flags templated boilerplate).  "
    "Doc-level (distinct) co-occurrence counts; marginals join back on "
    "token and source (both far smaller than the postings), the scalar "
    "total broadcast.  PMI is fixed-pointed to exact micro-units via "
    "floor(1e6*ln(...)) — the tfidf precedent (textops.py:707) — so "
    "ranking and hashing never see a raw float.",
)
def q_pmi_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    ).distinct()
    # joint feeds FOUR consumers (both marginals, the scalar total, and
    # the output join); without lineage truncation the tokenize+distinct
    # subtree replicates four times in one plan (22 exchanges measured).
    # joint is vocab x sources — tiny relative to the postings.
    joint = (
        tok.groupBy("token", "source")
        .agg(F.count("*").alias("n_ts"))
        .localCheckpoint(eager=False)
    )
    tmarg = joint.groupBy("token").agg(F.sum("n_ts").alias("n_t"))
    smarg = joint.groupBy("source").agg(F.sum("n_ts").alias("n_s"))
    total = joint.agg(F.sum("n_ts").alias("n"))
    out = (
        joint.join(tmarg, "token")
        .filter(F.col("n_t") >= 40)
        .join(F.broadcast(smarg), "source")
        .crossJoin(F.broadcast(total))
        .select(
            "token",
            "source",
            F.col("n_ts").cast("bigint").alias("n_joint"),
            F.floor(
                1000000
                * F.log(
                    (F.col("n_ts").cast("double") * F.col("n").cast("double"))
                    / (F.col("n_t").cast("double") * F.col("n_s").cast("double"))
                )
            )
            .cast("bigint")
            .alias("pmi_micro"),
        )
        .orderBy(F.desc("pmi_micro"), "token", "source")
        .limit(50)
    )
    return out


# ---------------------------------------------------------------------------
# Incremental materialized-rollup maintenance
# ---------------------------------------------------------------------------


def _rollup_store_path(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    key = _tmp_key(sf_dir, "orders.parquet")
    return os.path.join(tempfile.gettempdir(), f"spark_graft_rollup_{key}")


@declared_query(
    "q_incremental_rollup",
    oracle="""
SELECT o_orderpriority,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total
FROM orders
GROUP BY o_orderpriority, strftime(CAST(o_orderdate AS DATE), '%Y-%m')
ORDER BY o_orderpriority, month
""",
    ops=("AGG-incremental", "A4", "S12", "T5"),
    doc="Incremental materialized-view maintenance, driver-verified end "
    "to end: a bucket-partitioned store of additive (count, exact-"
    "decimal-sum) partials (operators/rollup.RollupStore) is built from "
    "the base slice (o_orderkey %% 10 != 0, cached like the stored ANN "
    "indexes), then the held-out slice arrives as a delta batch and "
    "folds in by aggregating ONLY the delta and reading ONLY the store "
    "buckets it touches (partition-pruned; touched-bucket list is "
    "O(buckets), the upsert.py discipline).  The oracle is a FULL "
    "recompute over all orders — passing proves partial-merge "
    "maintenance is bit-equal to rescan, the property that lets a "
    "dashboard refresh cost O(delta) instead of O(100 TB).  dry_run "
    "keeps the query pure; the mutating path (dynamic partition "
    "overwrite + batch-id idempotency markers) is pinned by "
    "tests/test_operators.py::test_rollup_store_merge_*.  The "
    "reference recomputes these aggregates per dashboard load "
    "(app/app.py metric queries).",
)
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.rollup import RollupStore

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("measure"),
        "o_orderkey",
    )
    store = RollupStore(
        spark, _rollup_store_path(spark, sf_dir), ["o_orderpriority", "month"]
    )
    if not store.exists():
        store.build(orders.filter(F.col("o_orderkey") % 10 != 0).drop("o_orderkey"))
    merged = store.merge(
        orders.filter(F.col("o_orderkey") % 10 == 0).drop("o_orderkey"), dry_run=True
    )
    return merged.select(
        "o_orderpriority",
        "month",
        F.col("n").cast("bigint").alias("n_orders"),
        F.col("s").alias("total"),
    ).orderBy("o_orderpriority", "month")


# ---------------------------------------------------------------------------
# Event-sequence transition matrix (Markov next-step)
# ---------------------------------------------------------------------------


@declared_query(
    "q_event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
), pairs AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type
), marg AS (
  SELECT from_type, SUM(n) AS n_from FROM pairs GROUP BY from_type
)
SELECT p.from_type, p.to_type,
       CAST(p.n AS BIGINT) AS n,
       CAST((1000000 * CAST(p.n AS BIGINT)) // CAST(m.n_from AS BIGINT) AS BIGINT) AS p_micro
FROM pairs p JOIN marg m ON p.from_type = m.from_type
ORDER BY p.from_type, p.to_type
""",
    ops=("EVT-transitions", "W1", "A2"),
    doc="Markov next-event transition matrix: each user's event stream "
    "ordered by (ts, unique id), LEAD pairs adjacent steps, and the "
    "per-source-state row gives the empirical next-step distribution — "
    "the model behind product flow diagrams and session simulators.  "
    "One shuffle on user_id for the window, one on the tiny "
    "(from, to) key; probabilities are exact integer micro-units "
    "(1e6*n DIV n_from), so no float reaches the hash.  The tie-break "
    "on event_id makes adjacency total — without it, same-timestamp "
    "events would pair nondeterministically across engines.",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    # pairs feeds both the marginal and the output join — checkpoint the
    # (types x types)-row frame so the events window subtree plans once
    pairs = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    marg = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return (
        pairs.join(F.broadcast(marg), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("bigint").alias("n"),
            F.expr("CAST((1000000 * CAST(n AS BIGINT)) DIV CAST(n_from AS BIGINT) AS BIGINT)").alias(
                "p_micro"
            ),
        )
        .orderBy("from_type", "to_type")
    )


# ---------------------------------------------------------------------------
# Time-to-convert cohort statistics
# ---------------------------------------------------------------------------


@declared_query(
    "q_time_to_convert",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(ts) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
), conv AS (
  SELECT f.user_id, f.t_view, MIN(e.ts) AS t_buy
  FROM firsts f JOIN events e
    ON e.user_id = f.user_id AND e.event_type = 'purchase' AND e.ts >= f.t_view
  GROUP BY f.user_id, f.t_view
)
SELECT strftime(CAST(t_view AS DATE), '%Y-%m') AS cohort_month,
       CAST(COUNT(*) AS BIGINT) AS n_converted,
       CAST(MIN(date_diff('second', t_view, t_buy)) AS BIGINT) AS min_s,
       CAST(MAX(date_diff('second', t_view, t_buy)) AS BIGINT) AS max_s,
       CAST(SUM(date_diff('second', t_view, t_buy))
            // COUNT(*) AS BIGINT) AS avg_s_floor
FROM conv GROUP BY strftime(CAST(t_view AS DATE), '%Y-%m')
ORDER BY cohort_month
""",
    ops=("EVT-convert-time", "A13", "J1"),
    doc="Time-to-convert by acquisition cohort: first view per user, "
    "first purchase at-or-after it (the q_event_funnel ordering "
    "constraint), the gap in whole seconds aggregated per first-touch "
    "month.  Latency gaps are exact BIGINT second arithmetic — "
    "min/max/floored-mean, no float division — so the hash is exact.  "
    "Both aggregates and the join ride the user_id partitioning; the "
    "cohort rollup shuffles |converted users| rows.",
)
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("ts").alias("t_buy"))
    )
    gap = (F.unix_timestamp("t_buy") - F.unix_timestamp("t_view")).alias("gap_s")
    return (
        conv.select(F.date_format("t_view", "yyyy-MM").alias("cohort_month"), gap)
        .groupBy("cohort_month")
        .agg(
            F.count("*").cast("bigint").alias("n_converted"),
            F.min("gap_s").cast("bigint").alias("min_s"),
            F.max("gap_s").cast("bigint").alias("max_s"),
            F.expr("CAST(SUM(gap_s) DIV COUNT(*) AS BIGINT)").alias("avg_s_floor"),
        )
        .orderBy("cohort_month")
    )


# ---------------------------------------------------------------------------
# Bucketed co-located join (zero-exchange shuffle elimination)
# ---------------------------------------------------------------------------


def _bucket_table(
    spark: SparkSession, df: DataFrame, name: str, path: str, key: str, n: int = 8
) -> None:
    """Register an external bucketed parquet table, writing data only if
    the path is new.  Bucket METADATA lives in the catalog, not the
    files, so a fresh session re-attaches with a DDL statement (instant)
    instead of rewriting — the same build-once discipline as the stored
    ANN indexes."""
    import os

    if spark.catalog.tableExists(name):
        return
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        spark.sql(
            f"CREATE TABLE {name} ({cols}) USING PARQUET "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {n} BUCKETS "
            f"LOCATION '{path}'"
        )
        return
    (
        df.write.bucketBy(n, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )


@declared_query(
    "q_bucketed_join",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    ops=("J1", "S16", "OPT-bucketing"),
    doc="Co-located join on pre-bucketed tables: orders and customer are "
    "stored bucketed+sorted by the customer key into the same bucket "
    "count, so the sort-merge join consumes both scans with ZERO "
    "exchange on either side (plan-asserted) — the biggest shuffle in "
    "the fact⋈dim family simply disappears.  At 100 TB this is the "
    "difference between re-shuffling the fact table on every join and "
    "paying the layout cost once at write time; the reference's "
    "Postgres gets the analogous effect from its donor_id btree.  "
    "Bucket files are written once and re-attached by DDL in later "
    "sessions (bucket metadata is catalog-side).  The merge hint pins "
    "the co-located plan so the assertion can't silently degrade to a "
    "broadcast that merely hides the layout being wrong.",
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    key = _tmp_key(sf_dir, "orders.parquet", "customer.parquet")
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_bkt_{key}")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").cast("decimal(12,2)").alias("price")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    _bucket_table(spark, orders, f"bkt_orders_{key}", os.path.join(root, "orders"), "o_custkey")
    _bucket_table(spark, cust, f"bkt_customer_{key}", os.path.join(root, "customer"), "c_custkey")
    o = spark.table(f"bkt_orders_{key}")
    c = spark.table(f"bkt_customer_{key}")
    return (
        o.hint("merge")
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("price").cast("decimal(18,2)").alias("total"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Dynamic partition pruning (runtime partition elimination)
# ---------------------------------------------------------------------------


@declared_query(
    "q_dpp_prune",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total
FROM events
WHERE CAST(ts AS DATE) < DATE '2024-01-08'
GROUP BY event_type
ORDER BY event_type
""",
    ops=("OPT-dpp", "J1", "P5"),
    doc="Dynamic partition pruning: the event fact is stored partitioned "
    "by day (written once, stored-index discipline) and joined to a "
    "filtered date dimension — the selective predicate lives on the DIM "
    "side, so static pruning can't help; Spark injects the dim's keys "
    "as a runtime subquery into the fact scan's PartitionFilters "
    "(plan-asserted 'dynamicpruning'), reading 7 of 30 day directories. "
    " At 100 TB this is the star-schema pattern: date-partitioned fact, "
    "calendar dim filtered to the quarter, and the scan prices only the "
    "quarter.  The oracle collapses the unique-key dim join to the "
    "equivalent date predicate.",
)
def q_dpp_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    key = _tmp_key(sf_dir, "events.parquet")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_dpp_{key}")
    pf = ev.withColumn("event_date", F.to_date("ts"))
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        pf.write.partitionBy("event_date").mode("overwrite").parquet(path)
    # schema pinned from the logical frame: a store built from an EMPTY
    # events table has no footer to infer from (same hazard as
    # RollupStore._read_store)
    fact = spark.read.schema(pf.schema).parquet(path)
    dim = (
        ev.select(F.to_date("ts").alias("event_date"))
        .distinct()
        .filter(F.col("event_date") < F.lit("2024-01-08").cast("date"))
    )
    return (
        fact.join(dim, "event_date")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("decimal(18,2)").alias("total"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Schema evolution on read (mergeSchema over heterogeneous parts)
# ---------------------------------------------------------------------------


@declared_query(
    "q_schema_evolution",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN COALESCE(n_chars, 0) ELSE 0 END) AS BIGINT) AS chars_new_rows,
       CAST(SUM(CASE WHEN doc_id % 2 = 0 OR n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_old_schema
FROM documents
GROUP BY lang
ORDER BY lang
""",
    ops=("S15", "SRC-evolve"),
    doc="Schema evolution on read: the store holds parquet parts written "
    "under TWO schemas — an old generation without n_chars (doc_id %% 2 "
    "= 0) and a new generation with it — and a mergeSchema scan unions "
    "them, surfacing the missing column as NULL on old rows (counted, "
    "summed with a 0 default — FIXTURES rule 3 keeps the nullable "
    "numeric out of the projection).  This is the lake reality S15's "
    "ETL-level test covers for MERGE targets, proven here at driver "
    "grade for plain scans: adding a column must never require "
    "rewriting 100 TB of history.  Footer merging is per-file metadata "
    "work, not data IO; partition-parallel.",
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    d = load_table(spark, sf_dir, "documents")
    key = _tmp_key(sf_dir, "documents.parquet")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_evolve_{key}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.mode(
            "overwrite"
        ).parquet(path)
        d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "n_chars").write.mode(
            "append"
        ).parquet(path)
    merged = spark.read.option("mergeSchema", "true").schema(
        "doc_id bigint, lang string, n_chars bigint"
    ).parquet(path)
    return (
        merged.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.coalesce(F.sum(F.coalesce("n_chars", F.lit(0))), F.lit(0))
            .cast("bigint")
            .alias("chars_new_rows"),
            F.sum(F.when(F.col("n_chars").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_old_schema"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Iterative rank propagation (PageRank) — exact integer replay
# ---------------------------------------------------------------------------

# One propagation round as a SQL fragment: rank table `{rin}` -> `{rout}`.
# Mirrors operators/graph.pagerank_micro bit-for-bit: per-edge integer
# contribution (r*w) // ow, BIGINT sum, damped integer update.
_PR_ROUND = """{rout} AS (
  SELECT s.v AS u,
         CAST(bs.base + (85 * CAST(SUM((r.r * s.w) // o.ow) AS BIGINT)) // 100 AS BIGINT) AS r
  FROM sym s JOIN {rin} r ON s.u = r.u JOIN outw o ON s.u = o.u, bs
  GROUP BY s.v, bs.base
)"""

_PAGERANK_ORACLE = (
    """WITH e AS (
  SELECT -(l_suppkey + 1) AS a, o_custkey AS b, CAST(COUNT(*) AS BIGINT) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), sym AS (
  SELECT a AS u, b AS v, w FROM e UNION ALL SELECT b AS u, a AS v, w FROM e
), outw AS (
  SELECT u, CAST(SUM(w) AS BIGINT) AS ow FROM sym GROUP BY u
), bs AS (
  SELECT CAST((150000000 // COUNT(*)) AS BIGINT) AS base,
         CAST((1000000000 // COUNT(*)) AS BIGINT) AS r0 FROM outw
), rank0 AS (
  SELECT u, bs.r0 AS r FROM outw, bs
), """
    + _PR_ROUND.format(rin="rank0", rout="rank1")
    + ", "
    + _PR_ROUND.format(rin="rank1", rout="rank2")
    + ", "
    + _PR_ROUND.format(rin="rank2", rout="rank3")
    + """
SELECT CASE WHEN u < 0 THEN 'supplier' ELSE 'customer' END AS kind,
       CASE WHEN u < 0 THEN -u - 1 ELSE u END AS node,
       r AS rank_micro
FROM rank3
ORDER BY rank_micro DESC, kind, node
LIMIT 20
"""
)


@declared_query(
    "q_pagerank",
    oracle=_PAGERANK_ORACLE,
    ops=("GRAPH-pagerank", "J1", "A2"),
    doc="Weighted PageRank (3 damped rounds, d=0.85) over the undirected "
    "supplier<->customer bipartite graph induced by lineitem (edge "
    "weight = co-occurrence count; suppliers carry NEGATIVE vertex ids "
    "-(k+1), disjoint from any non-negative customer key at ANY scale — "
    "a fixed offset would collide once custkey exceeds it), top-20 "
    "most-central nodes.  Ranks "
    "are exact BIGINT micro-units (operators/graph.pagerank_micro): "
    "init micro DIV N, per-edge contribution (r*w) DIV out_w, update "
    "base + (85*sum) DIV 100 — every step order-independent integer "
    "math, so the DuckDB oracle unrolls the identical three rounds and "
    "the value hash is exact, which double-precision PageRank can "
    "never be under re-associated partial sums.  Complements "
    "connected_components as the second bounded-round iterative graph "
    "op: per round one join shuffle on u and one aggregate shuffle on "
    "v, no driver state.  Reference analog: degree-1 centrality "
    "rankings (top donors, app/metrics.py:63-67) generalized to "
    "influence propagation over the giving graph.",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.graph import pagerank_micro

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            (-(F.col("l_suppkey") + 1)).alias("a"),
            F.col("o_custkey").alias("b"),
        )
        .agg(F.count("*").cast("bigint").alias("w"))
    )
    sym = e.select(F.col("a").alias("u"), F.col("b").alias("v"), "w").unionByName(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"), "w")
    )
    ranks = pagerank_micro(sym, iterations=3)
    return (
        ranks.select(
            F.when(F.col("u") < 0, F.lit("supplier"))
            .otherwise(F.lit("customer"))
            .alias("kind"),
            F.when(F.col("u") < 0, -F.col("u") - 1)
            .otherwise(F.col("u"))
            .alias("node"),
            F.col("r").alias("rank_micro"),
        )
        .orderBy(F.desc("rank_micro"), "kind", "node")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Streaming-friendly statistics: correlation + OLS from exact merged sums
# ---------------------------------------------------------------------------

_CORR_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       ROUND((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS ols_slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS ols_intercept
FROM s
ORDER BY l_returnflag
"""


@declared_query(
    "q_correlation",
    oracle=_CORR_ORACLE,
    ops=("STAT-corr", "A2", "A8"),
    doc="Per-group Pearson correlation and OLS fit (quantity vs price) "
    "from the five mergeable sufficient sums (n, Sx, Sy, Sxx, Syy, Sxy) "
    "accumulated as EXACT decimals — order-independent under partial "
    "aggregation, mergeable across partitions/days like the moments "
    "sketch (q_moments_mergeable) — with the float math confined to one "
    "identical final expression per engine.  A float-accumulating "
    "corr()/covar() can never hash-match across partitionings; this "
    "formulation is also the incremental form (merge yesterday's sums "
    "with today's delta, never rescan).  One shuffle on the tiny group "
    "key.  Reference analog: the dashboard's scatter trendlines "
    "(app/app.py plotly tabs) computed engine-side.",
)
def q_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dx = "CAST(l_quantity AS DECIMAL(18,2))"
    dy = "CAST(l_extendedprice AS DECIMAL(18,2))"
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.expr(f"CAST(SUM({dx}) AS DOUBLE)").alias("sx"),
        F.expr(f"CAST(SUM({dy}) AS DOUBLE)").alias("sy"),
        F.expr(f"CAST(SUM({dx} * {dx}) AS DOUBLE)").alias("sxx"),
        F.expr(f"CAST(SUM({dy} * {dy}) AS DOUBLE)").alias("syy"),
        F.expr(f"CAST(SUM({dx} * {dy}) AS DOUBLE)").alias("sxy"),
    )
    slope = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
    return s.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "ROUND((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)"
        ).alias("corr_qty_price"),
        F.expr(f"ROUND({slope}, 6)").alias("ols_slope"),
        F.expr(f"ROUND((sy - ({slope}) * sx) / n, 6)").alias("ols_intercept"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Journey mining: most common opening event paths
# ---------------------------------------------------------------------------


@declared_query(
    "q_event_paths",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS step
  FROM events
), paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY step) AS path
  FROM ordered WHERE step <= 3
  GROUP BY user_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM paths
GROUP BY path
ORDER BY n_users DESC, path
LIMIT 20
""",
    ops=("EVT-paths", "W1", "A3"),
    doc="Journey mining: each user's first three events (total-ordered "
    "by ts with the unique event_id tie-break — without it the path "
    "string is nondeterministic across engines) concatenate into an "
    "opening path, and the top-20 paths rank by user count.  The "
    "n-step generalization of the transition matrix "
    "(q_event_transitions): transitions give the Markov model, paths "
    "give the actual head of the funnel.  One shuffle on user_id for "
    "the window + one on the path key; the per-user step filter caps "
    "state at 3 rows per user regardless of history length.",
)
def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("step")
    ).filter(F.col("step") <= 3)
    paths = (
        ordered.groupBy("user_id")
        .agg(
            F.concat_ws(
                ">", F.array_sort(F.collect_list(F.struct("step", "event_type"))).getField("event_type")
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) layout — multi-column pruning for the 100 TB lake
# ---------------------------------------------------------------------------


def _zorder_oracle(bits: int = 12) -> str:
    from politician_etl_project_spark.operators.layout import zorder_sql

    top = (1 << bits) - 1
    day = "datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))"
    # multiply-stretch quantizer — fills all 2^bits cells; safe here
    # because these column spans are << 2^50 (write_zordered's hybrid
    # handles the huge-span regime)
    qc = f"(((o_custkey - mm.lo_c) * {top}) // greatest(mm.hi_c - mm.lo_c, 1))"
    qd = f"((({day} - mm.lo_d) * {top}) // greatest(mm.hi_d - mm.lo_d, 1))"
    return f"""
WITH mm AS (
  SELECT MIN(o_custkey) AS lo_c, MAX(o_custkey) AS hi_c,
         MIN({day}) AS lo_d, MAX({day}) AS hi_d
  FROM orders
)
SELECT o_orderkey, o_custkey,
       CAST({day} AS INTEGER) AS day_no,
       CAST({zorder_sql(qc, qd, bits=bits)} AS BIGINT) AS zval
FROM orders, mm
ORDER BY zval, o_orderkey
LIMIT 50
"""


@declared_query(
    "q_zorder_layout",
    oracle=_zorder_oracle(),
    ops=("LAYOUT-zorder", "O3"),
    doc="Z-order (Morton) clustering key over orders: customer key and "
    "order date are min/max-QUANTIZED to a common 12-bit width (the "
    "same normalization write_zordered applies — raw interleave would "
    "alias ids past 2^bits and let the wider dimension dominate), then "
    "interleaved bit-by-bit into one BIGINT; the 50 lowest curve "
    "positions come back with their coordinates.  This is the "
    "clustering key behind OPTIMIZE ZORDER-style layout maintenance "
    "(operators/layout.py; the pruning effect is measured from real "
    "parquet footers in tests/test_operators.py).  The oracle replays "
    "the identical quantize + mask/shift/OR integer arithmetic in "
    "DuckDB, so the curve value is hash-exact.  Scale: one broadcast "
    "1-row min/max frame + a flat integer expression in codegen + "
    "TakeOrderedAndProject; the layout WRITE is one range-partition "
    "shuffle per maintenance run, never on the ingest path.",
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.layout import zorder_value

    bits, top = 12, (1 << 12) - 1
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
    mm = orders.agg(
        F.min("o_custkey").alias("lo_c"),
        F.max("o_custkey").alias("hi_c"),
        F.min(day).alias("lo_d"),
        F.max(day).alias("hi_d"),
    )
    qc = F.expr(f"((o_custkey - lo_c) * {top}) div greatest(hi_c - lo_c, 1)")
    return (
        orders.select("o_orderkey", "o_custkey", day.alias("day_no"))
        .crossJoin(F.broadcast(mm))
        .select(
            "o_orderkey",
            "o_custkey",
            "day_no",
            zorder_value(
                qc,
                F.expr(f"((day_no - lo_d) * {top}) div greatest(hi_d - lo_d, 1)"),
                bits=bits,
            ).alias("zval"),
        )
        .orderBy("zval", "o_orderkey")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# CDC changelog apply (insert/update/delete MERGE, latest-LSN-wins)
# ---------------------------------------------------------------------------

_CDC_CUTOFF = "1999-01-01"

_CDC_ORACLE = f"""
WITH raw AS (
  SELECT o_custkey AS k, o_orderkey AS seq,
         CASE WHEN o_orderstatus = 'P' THEN 'D' ELSE 'U' END AS op,
         CAST(o_totalprice AS DECIMAL(12,2)) AS new_bal
  FROM orders WHERE o_orderdate >= TIMESTAMP '{_CDC_CUTOFF}'
  UNION ALL
  SELECT o_custkey + 10000000 AS k, o_orderkey AS seq, 'U' AS op,
         CAST(o_totalprice AS DECIMAL(12,2)) AS new_bal
  FROM orders WHERE o_orderkey % 97 = 0
), chg AS (
  SELECT k, arg_max(op, seq) AS op, arg_max(new_bal, seq) AS new_bal
  FROM raw GROUP BY k
), post AS (
  SELECT COALESCE(c.c_nationkey, -1) AS nation,
         CASE WHEN g.op IS NOT NULL THEN g.new_bal ELSE CAST(c.c_acctbal AS DECIMAL(12,2)) END AS bal,
         CASE WHEN g.op IS NULL THEN 'carried'
              WHEN c.c_custkey IS NULL THEN 'inserted'
              ELSE 'updated' END AS status
  FROM customer c FULL OUTER JOIN chg g ON c.c_custkey = g.k
  WHERE g.op IS NULL OR g.op <> 'D'
), live AS (
  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_live,
         CAST(SUM(CASE WHEN status = 'updated' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
         CAST(SUM(CASE WHEN status = 'inserted' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
         CAST(SUM(CASE WHEN status = 'carried' THEN 1 ELSE 0 END) AS BIGINT) AS n_carried,
         CAST(SUM(bal) AS DECIMAL(18,2)) AS total_bal
  FROM post GROUP BY nation
), basec AS (
  SELECT c_nationkey AS nation, CAST(COUNT(*) AS BIGINT) AS n_base FROM customer GROUP BY 1
)
SELECT COALESCE(b.nation, l.nation) AS nation,
       COALESCE(b.n_base, 0) AS n_base,
       COALESCE(l.n_live, 0) AS n_live,
       COALESCE(b.n_base, 0) + COALESCE(l.n_inserted, 0) - COALESCE(l.n_live, 0) AS n_deleted,
       COALESCE(l.n_updated, 0) AS n_updated,
       COALESCE(l.n_inserted, 0) AS n_inserted,
       COALESCE(l.n_carried, 0) AS n_carried,
       COALESCE(l.total_bal, CAST(0 AS DECIMAL(18,2))) AS total_bal
FROM basec b FULL OUTER JOIN live l ON b.nation = l.nation
ORDER BY nation
"""


@declared_query(
    "q_cdc_apply",
    oracle=_CDC_ORACLE,
    ops=("S12", "S13", "CDC-apply", "A6", "J1"),
    doc="CDC changelog apply: an ordered insert/update/delete changelog "
    "(derived deterministically from orders: LSN = o_orderkey, status "
    "'P' means DELETE the customer, else upsert the balance; keys "
    "offset by 1e7 synthesize inserts of unseen customers) is applied "
    "to the customer snapshot with latest-LSN-wins MERGE semantics — "
    "the three-verb generalization of S12/S13 the reference's "
    "update_donations.py loop lacks (it has no delete path, "
    "scripts/update_donations.py:258-307).  Per nation: base rows, "
    "surviving rows, deletes, updates, inserts (NULL dim attrs -> "
    "nation -1), carried rows, and the post-image balance total.  "
    "operators/upsert.apply_changelog compacts the log with ONE "
    "map-side-combining aggregate (max(struct(seq, op, vals)) — "
    "deterministic under seq ties, unlike max_by) and applies it with "
    "ONE key-partitioned full-outer join; the oracle replays the same "
    "semantics via arg_max + FULL OUTER JOIN, so the hash proves "
    "delete-resurrection ordering, insert surfacing, and carry-forward "
    "all at once.  At 100 TB the log compaction absorbs long per-key "
    "histories before any join, and base co-partitions with the "
    "compacted log on the merge key.",
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.upsert import apply_changelog

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(12,2)").alias("c_acctbal"),
    )
    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit(_CDC_CUTOFF).cast("timestamp")
    upd = orders.filter(F.col("o_orderdate") >= cutoff).select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderstatus") == "P", "D").otherwise("U").alias("op"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("c_acctbal"),
    )
    ins = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_custkey") + 10_000_000).alias("c_custkey"),
        F.col("o_orderkey").alias("seq"),
        F.lit("U").alias("op"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("c_acctbal"),
    )
    post = apply_changelog(
        cust, upd.unionByName(ins), key="c_custkey", seq="seq", op="op",
        status_col="status",
    )
    live = (
        post.groupBy(F.coalesce("c_nationkey", F.lit(-1)).alias("nation"))
        .agg(
            F.count("*").alias("n_live"),
            F.sum(F.when(F.col("status") == "updated", 1).otherwise(0))
            .cast("bigint")
            .alias("n_updated"),
            F.sum(F.when(F.col("status") == "inserted", 1).otherwise(0))
            .cast("bigint")
            .alias("n_inserted"),
            F.sum(F.when(F.col("status") == "carried", 1).otherwise(0))
            .cast("bigint")
            .alias("n_carried"),
            F.sum("c_acctbal").cast("decimal(18,2)").alias("total_bal"),
        )
    )
    basec = cust.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.count("*").alias("n_base")
    )
    zero_bal = F.lit(0).cast("decimal(18,2)")
    return (
        basec.join(live, "nation", "full_outer")
        .select(
            "nation",
            F.coalesce("n_base", F.lit(0)).cast("bigint").alias("n_base"),
            F.coalesce("n_live", F.lit(0)).cast("bigint").alias("n_live"),
            (
                F.coalesce("n_base", F.lit(0))
                + F.coalesce("n_inserted", F.lit(0))
                - F.coalesce("n_live", F.lit(0))
            )
            .cast("bigint")
            .alias("n_deleted"),
            F.coalesce("n_updated", F.lit(0)).cast("bigint").alias("n_updated"),
            F.coalesce("n_inserted", F.lit(0)).cast("bigint").alias("n_inserted"),
            F.coalesce("n_carried", F.lit(0)).cast("bigint").alias("n_carried"),
            F.coalesce("total_bal", zero_bal).alias("total_bal"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# Bloom-filter semijoin pruning (measured false-positive rate)
# ---------------------------------------------------------------------------

_BLOOM_M = 1024
_BLOOM_NATION = 7


def _duck_bloom_bit(col: str, off: int) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), {off}, 8) AS BIGINT)"
        f" % {_BLOOM_M}"
    )


_BLOOM_ORACLE = f"""
WITH dim AS (
  SELECT DISTINCT c_custkey AS k FROM customer WHERE c_nationkey = {_BLOOM_NATION}
), bits AS (
  SELECT DISTINCT b FROM (
    SELECT {_duck_bloom_bit('k', 1)} AS b FROM dim
    UNION ALL SELECT {_duck_bloom_bit('k', 9)} FROM dim
    UNION ALL SELECT {_duck_bloom_bit('k', 17)} FROM dim)
), probed AS (
  SELECT o_custkey AS k,
         ({_duck_bloom_bit('o_custkey', 1)} IN (SELECT b FROM bits)
          AND {_duck_bloom_bit('o_custkey', 9)} IN (SELECT b FROM bits)
          AND {_duck_bloom_bit('o_custkey', 17)} IN (SELECT b FROM bits)) AS pass,
         o_custkey IN (SELECT k FROM dim) AS m
  FROM orders
)
SELECT CAST((SELECT COUNT(*) FROM dim) AS BIGINT) AS n_dim_keys,
       CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS bits_set,
       CAST(COUNT(*) AS BIGINT) AS n_fact_rows,
       CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS rows_bloom_pass,
       CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS rows_true_match,
       CAST(SUM(CASE WHEN pass AND NOT m THEN 1 ELSE 0 END) AS BIGINT) AS rows_false_pos,
       CAST(COUNT(DISTINCT CASE WHEN pass THEN k END) AS BIGINT) AS keys_bloom_pass,
       CAST(COUNT(DISTINCT CASE WHEN m THEN k END) AS BIGINT) AS keys_true_match,
       CAST(COUNT(DISTINCT CASE WHEN pass AND NOT m THEN k END) AS BIGINT) AS keys_false_pos
FROM probed
"""


@declared_query(
    "q_bloom_prune",
    oracle=_BLOOM_ORACLE,
    ops=("BLOOM-prune", "J7", "P8", "A6"),
    doc="Bloom-filter semijoin pruning with its false-positive rate "
    "MEASURED in the result: a 1024-bit / k=3 filter built from one "
    "nation's customer keys (operators/bloom.build_bloom_words — an "
    "O(m) aggregate + bounded collect, the filter is by construction "
    "data-volume-independent) probes every orders row as a PURE "
    "per-row expression (operators/bloom.bloom_probe: the packed words "
    "ship as an array literal inside whole-stage codegen — no join, no "
    "shuffle on the fact, the runtime-filter plan Spark's AQE bloom "
    "filter injects, made explicit and auditable).  Output: dim keys, "
    "bits set, fact rows, rows/keys passing the bloom vs truly "
    "matching vs false positives.  Hash positions are disjoint md5 "
    "slices (the repo's cross-engine hash idiom), so the DuckDB oracle "
    "rebuilds the IDENTICAL filter and the driver hash verifies the "
    "filter's bit pattern itself, not just summary counts.  This is "
    "how you size m before pruning a 100 TB scan: observed FP here "
    "(~0.6% at 196/1024 bits) matches (bits_set/m)^k theory.",
)
def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.bloom import (
        bloom_probe,
        build_bloom_words,
    )

    cust = load_table(spark, sf_dir, "customer")
    dim = (
        cust.filter(F.col("c_nationkey") == _BLOOM_NATION)
        .select("c_custkey")
        .distinct()
    )
    words, bits_set = build_bloom_words(dim, "c_custkey", _BLOOM_M, 3)
    n_dim_keys = dim.count()  # bounded: one nation's keys
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    probed = orders.withColumn(
        "pass", bloom_probe("o_custkey", words, _BLOOM_M, 3)
    ).join(
        F.broadcast(dim.select(F.col("c_custkey").alias("o_custkey")).withColumn("_m", F.lit(True))),
        "o_custkey",
        "left",
    )
    member = F.col("_m").isNotNull()
    fp = F.col("pass") & ~member
    # Row-level and key-level tallies as SEPARATE aggregates (SCALE.md
    # aggregation rule: mixed COUNT DISTINCTs plan as an Expand over the
    # fact, losing map-side partials).  pass/member are deterministic
    # functions of the key, so the key tallies come from a plain
    # distinct + conditional counts — no COUNT DISTINCT at all; the two
    # 1-row frames meet in a trivial broadcast join.
    rows_agg = probed.agg(
        F.count("*").cast("bigint").alias("n_fact_rows"),
        F.sum(F.when(F.col("pass"), 1).otherwise(0)).cast("bigint").alias("rows_bloom_pass"),
        F.sum(F.when(member, 1).otherwise(0)).cast("bigint").alias("rows_true_match"),
        F.sum(F.when(fp, 1).otherwise(0)).cast("bigint").alias("rows_false_pos"),
    )
    keys_agg = (
        orders.select("o_custkey")
        .distinct()
        .withColumn("pass", bloom_probe("o_custkey", words, _BLOOM_M, 3))
        .join(
            F.broadcast(
                dim.select(F.col("c_custkey").alias("o_custkey")).withColumn(
                    "_m", F.lit(True)
                )
            ),
            "o_custkey",
            "left",
        )
        .agg(
            F.sum(F.when(F.col("pass"), 1).otherwise(0)).cast("bigint").alias("keys_bloom_pass"),
            F.sum(F.when(member, 1).otherwise(0)).cast("bigint").alias("keys_true_match"),
            F.sum(F.when(fp, 1).otherwise(0)).cast("bigint").alias("keys_false_pos"),
        )
    )
    return rows_agg.crossJoin(F.broadcast(keys_agg)).select(
        F.lit(n_dim_keys).cast("bigint").alias("n_dim_keys"),
        F.lit(bits_set).cast("bigint").alias("bits_set"),
        "n_fact_rows",
        "rows_bloom_pass",
        "rows_true_match",
        "rows_false_pos",
        "keys_bloom_pass",
        "keys_true_match",
        "keys_false_pos",
    )


# ---------------------------------------------------------------------------
# Triangle enumeration (degree-oriented node-iterator, graph tier)
# ---------------------------------------------------------------------------

_TRI_ORACLE = """
WITH li AS (
  SELECT DISTINCT l.l_orderkey AS ok, l.l_partkey AS pk
  FROM lineitem l JOIN part pt ON l.l_partkey = pt.p_partkey
  WHERE l.l_quantity >= 25 AND pt.p_size <= 10
), e AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
)
SELECT e1.u AS t1, e1.v AS t2, e2.v AS t3
FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
ORDER BY t1, t2, t3
"""


@declared_query(
    "q_triangle_count",
    oracle=_TRI_ORACLE,
    ops=("GRAPH-triangles", "J1", "U2"),
    doc="Triangle enumeration over the part co-purchase graph (edges = "
    "part pairs sharing an order, thinned to quantity >= 25 and size "
    "<= 10 parts; 194 triangles at sf0.01).  Spark runs the "
    "DEGREE-ORIENTED node-iterator (operators/graph.triangles, Suri & "
    "Vassilvitskii WWW'11): arcs point low-(deg,id) -> high, wedges "
    "fan out only along out-arcs, so skew cost is bounded O(E^1.5) "
    "regardless of hub degree — the 'curse of the last reducer' "
    "answer a 100 TB co-occurrence graph needs.  The oracle enumerates "
    "naively (id order), so the canonical-triple hash PROVES the "
    "orientation strategy counts every triangle exactly once — third "
    "iterative-graph op beside connected_components and pagerank "
    "(cohesion vs reach vs grouping over the reference's cosponsor "
    "network, app/metrics.py:50-93).",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.graph import triangles

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sel = (
        li.filter(F.col("l_quantity") >= 25)
        .join(
            F.broadcast(part.filter(F.col("p_size") <= 10).select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
        )
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a = sel.alias("a")
    b = sel.alias("b")
    edges = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .select(F.col("a.pk").alias("u"), F.col("b.pk").alias("v"))
        .distinct()
    )
    return triangles(edges).orderBy("t1", "t2", "t3")


# ---------------------------------------------------------------------------
# Snapshot versioning / time travel (storage.SnapshotTable)
# ---------------------------------------------------------------------------

_TT_V2_CUT = "1997-01-01"
_TT_V3_CUT = "1999-01-01"


def _time_travel_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once three-version snapshot table (same staging + rename
    cache discipline as queries/events._merge_replay_path): v1 =
    pre-1997 orders, v2 = append of 1997-98 orders (file-sharing
    append — v1's files are referenced, not copied), v3 = copy-on-write
    upsert doubling o_totalprice for pre-1997 keys divisible by 5.
    Readers time-travel to any of the three."""
    import os
    import tempfile

    from politician_etl_project_spark.catalog import ensure_built_dir
    from politician_etl_project_spark.storage import SnapshotTable

    key = _tmp_key(sf_dir, "orders.parquet", version="time-travel-v1")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_snap_{key}")

    def _build(staging: str) -> None:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderdate"
        )
        v2_cut = F.lit(_TT_V2_CUT).cast("timestamp")
        v3_cut = F.lit(_TT_V3_CUT).cast("timestamp")
        t = SnapshotTable(spark, staging)
        t.overwrite(orders.filter(F.col("o_orderdate") < v2_cut))
        t.append(
            orders.filter(
                (F.col("o_orderdate") >= v2_cut) & (F.col("o_orderdate") < v3_cut)
            )
        )
        t.upsert(
            orders.filter(
                (F.col("o_orderdate") < v2_cut) & (F.col("o_orderkey") % 5 == 0)
            ).withColumn("o_totalprice", F.col("o_totalprice") * 2),
            keys=["o_orderkey"],
        )

    return ensure_built_dir(path, _build)


_TT_ORACLE = f"""
WITH v1 AS (
  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '{_TT_V2_CUT}'
), v2 AS (
  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '{_TT_V3_CUT}'
)
SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total_price
FROM v1
UNION ALL
SELECT 2, CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
FROM v2
UNION ALL
SELECT 3, CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN o_orderkey % 5 = 0 AND o_orderdate < TIMESTAMP '{_TT_V2_CUT}'
                     THEN CAST(o_totalprice * 2 AS DECIMAL(12,2))
                     ELSE CAST(o_totalprice AS DECIMAL(12,2)) END) AS DECIMAL(18,2))
FROM v2
ORDER BY version
"""


@declared_query(
    "q_time_travel",
    oracle=_TT_ORACLE,
    ops=("S12", "S14", "STORE-snapshot", "A1"),
    doc="Snapshot versioning + time travel (storage.SnapshotTable — the "
    "lakehouse-table-format core in parquet + atomic renames): v1 "
    "overwrite, v2 file-sharing append (parent files REFERENCED in the "
    "manifest, O(new data) at any table size), v3 copy-on-write upsert "
    "doubling selected prices; the query reads all three pinned "
    "versions and aggregates each.  The oracle reconstructs every "
    "snapshot from the raw fact by replaying the version predicates, "
    "so the hash proves isolation: the v3 MERGE must not leak into the "
    "v1/v2 manifests and the append must not duplicate shared parent "
    "files.  Writes commit via a manifest + one atomic pointer rename "
    "(the streaming sketch store's protocol) — a torn write is "
    "invisible and vacuumable, never a torn table.  Reference analog: "
    "destructive whole-file re-ingests (scripts/ingest_bulk_donations"
    ".py) made auditable and revertible.",
)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.storage import SnapshotTable

    t = SnapshotTable(spark, _time_travel_path(spark, sf_dir))
    outs = []
    for v in (1, 2, 3):
        outs.append(
            t.read(v).agg(
                F.lit(v).cast("int").alias("version"),
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
                .cast("decimal(18,2)")
                .alias("total_price"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("version")


# ---------------------------------------------------------------------------
# Manifest min/max data skipping (storage.SnapshotTable stats_cols)
# ---------------------------------------------------------------------------

_SP_RANGES = [(1, 1000, 2000), (2, 40000, 41000), (3, 1000000000, 1000000010)]


def _stats_prune_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once snapshot of orders laid out with repartitionByRange on
    o_orderkey and per-file min/max stats in the manifest (stats_cols) —
    the data-skipping layout a fact table carries at 100 TB."""
    import os
    import tempfile

    from politician_etl_project_spark.catalog import ensure_built_dir
    from politician_etl_project_spark.storage import SnapshotTable

    key = _tmp_key(sf_dir, "orders.parquet", version="stats-prune-v1")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_statsnap_{key}")

    def _build(staging: str) -> None:
        orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        SnapshotTable(spark, staging, stats_cols=["o_orderkey"]).overwrite(
            orders.repartitionByRange(16, "o_orderkey")
        )

    return ensure_built_dir(path, _build)


_SP_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT {rid} AS range_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DECIMAL(18,2)) AS total_price
FROM orders WHERE o_orderkey BETWEEN {lo} AND {hi}"""
    for rid, lo, hi in _SP_RANGES
) + "\nORDER BY range_id"


@declared_query(
    "q_stats_prune",
    oracle=_SP_ORACLE,
    ops=("STORE-stats-skip", "P5", "A1"),
    doc="Manifest min/max data skipping — the file-statistics half of "
    "the lakehouse format (Delta/Iceberg data skipping), completing "
    "the scan-elimination tier beside partition pruning (q_dpp_prune), "
    "bloom semijoins (q_bloom_prune) and Morton clustering "
    "(q_zorder_layout): SnapshotTable(stats_cols=['o_orderkey']) "
    "records per-FILE min/max in each manifest at write time (one "
    "O(new data) aggregate over the staged files, never a rescan), "
    "and read_range plans from the manifest alone — a narrow key "
    "probe over the range-clustered layout opens O(matching) files. "
    "Three probes (dense range, sparse-at-small-SF range, and a "
    "guaranteed-empty range exercising the zero-files read path) "
    "aggregate count + revenue; the oracle filters the raw fact, so "
    "the hash proves skipped files held no matching rows. "
    "tests/test_storage.py asserts the actual file-count reduction "
    "and the no-stats-conservative-scan fallback.",
)
def q_stats_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.storage import SnapshotTable

    t = SnapshotTable(spark, _stats_prune_path(spark, sf_dir))
    outs = []
    for rid, lo, hi in _SP_RANGES:
        outs.append(
            t.read_range("o_orderkey", lo, hi).agg(
                F.lit(rid).cast("int").alias("range_id"),
                F.count("*").cast("bigint").alias("n_rows"),
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(12,2)")), F.lit(0)
                )
                .cast("decimal(18,2)")
                .alias("total_price"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("range_id")


# ---------------------------------------------------------------------------
# Change data feed (storage.SnapshotTable.changes)
# ---------------------------------------------------------------------------


def _cdf_store_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once two-version snapshot exercising all three change
    classes: v1 = orders with key%3 != 0; v2 = overwrite with key%3 != 1
    and price doubled where key%5 == 0 — so the v1->v2 feed contains
    inserts (key%3=0), deletes (key%3=1) and updates (key%3=2, key%5=0),
    with the rest unchanged and therefore ABSENT."""
    import os
    import tempfile

    from politician_etl_project_spark.catalog import ensure_built_dir
    from politician_etl_project_spark.storage import SnapshotTable

    key = _tmp_key(sf_dir, "orders.parquet", version="cdf-v1")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_cdf_{key}")

    def _build(staging: str) -> None:
        orders = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").cast("decimal(12,2)").alias("p"),
        )
        t = SnapshotTable(spark, staging)
        t.overwrite(orders.filter(F.col("k") % 3 != 0))
        t.overwrite(
            orders.filter(F.col("k") % 3 != 1).select(
                "k",
                F.when(F.col("k") % 5 == 0, (F.col("p") * 2).cast("decimal(12,2)"))
                .otherwise(F.col("p"))
                .alias("p"),
            )
        )

    return ensure_built_dir(path, _build)


_CDF_ORACLE = """
WITH v1 AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(12,2)) AS p
  FROM orders WHERE o_orderkey % 3 <> 0
), v2 AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 5 = 0
              THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 2 AS DECIMAL(12,2))
              ELSE CAST(o_totalprice AS DECIMAL(12,2)) END AS p
  FROM orders WHERE o_orderkey % 3 <> 1
), feed AS (
  SELECT 'insert' AS change_type, p FROM v2 WHERE k % 3 = 0
  UNION ALL SELECT 'delete', p FROM v1 WHERE k % 3 = 1
  UNION ALL SELECT 'update_preimage', p FROM v1 WHERE k % 3 = 2 AND k % 5 = 0
  UNION ALL SELECT 'update_postimage', p FROM v2 WHERE k % 3 = 2 AND k % 5 = 0
)
SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(p) AS DECIMAL(18,2)) AS total_price
FROM feed GROUP BY change_type ORDER BY change_type
"""


@declared_query(
    "q_cdf_read",
    oracle=_CDF_ORACLE,
    ops=("CDC-feed", "STORE-snapshot", "J6", "A2"),
    doc="Change data feed between two published snapshot versions "
    "(storage.SnapshotTable.changes — the Delta CDF read surface): one "
    "typed row per change, updates emitting BOTH images, unchanged "
    "rows absent, NULL-safe value comparison.  The plan is ONE "
    "full-outer shuffle join on the key; the four change classes come "
    "from a per-row CASE building 0-2 typed structs flattened by a "
    "single explode (no four-branch union re-reading the join).  The "
    "oracle reconstructs both versions from the raw fact by replaying "
    "the version predicates, so the hash proves the feed is exactly "
    "the set difference — nothing leaked, nothing dropped, images on "
    "the right side.  Completes the lakehouse story: time travel "
    "(q_time_travel) pins versions, CDC apply (q_cdc_apply) consumes "
    "a changelog, this PRODUCES one from any two versions.  "
    "tests/test_storage.py proves feed-apply round-trips v1 to v2.",
)
def q_cdf_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.storage import SnapshotTable

    t = SnapshotTable(spark, _cdf_store_path(spark, sf_dir))
    feed = t.changes(["k"], 1, 2)
    return (
        feed.groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("p").cast("decimal(18,2)").alias("total_price"),
        )
        .orderBy("change_type")
    )


# ---------------------------------------------------------------------------
# Small-file compaction + vacuum (storage.SnapshotTable maintenance)
# ---------------------------------------------------------------------------

_COMPACT_APPENDS = 6
_COMPACT_TARGET = 4


def _compaction_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once store that has LIVED the small-files problem and its
    cure: orders arrive as 6 modulo-slice appends of 8 files each (the
    one-file-per-micro-batch layout a long-running append stream
    leaves), then ``compact(target_files=4)`` publishes the rewrite as
    a new version and ``vacuum(keep_last=1)`` reclaims every
    pre-compaction file and manifest.  Same idempotent staging+rename
    cache discipline as _time_travel_path."""
    import os
    import tempfile

    from politician_etl_project_spark.catalog import ensure_built_dir
    from politician_etl_project_spark.storage import SnapshotTable

    key = _tmp_key(sf_dir, "orders.parquet", version="compaction-v1")
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_compact_{key}")

    def _build(staging: str) -> None:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderdate"
        )
        t = SnapshotTable(spark, staging)
        for i in range(_COMPACT_APPENDS):
            t.append(orders.filter(F.col("o_orderkey") % _COMPACT_APPENDS == i).repartition(8))
        t.compact(target_files=_COMPACT_TARGET)
        t.vacuum(keep_last=1)

    return ensure_built_dir(path, _build)


_COMPACT_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS total_price,
       CAST({_COMPACT_TARGET} AS INTEGER) AS n_files,
       CAST(1 AS INTEGER) AS n_versions,
       'compact' AS last_op
FROM orders GROUP BY 1 ORDER BY yr
"""


@declared_query(
    "q_compaction_maintenance",
    oracle=_COMPACT_ORACLE,
    ops=("STORE-snapshot", "S11", "A2"),
    doc="Small-file compaction + history vacuum as an oracle-checked "
    "round trip (storage.SnapshotTable.compact/vacuum — Delta "
    "OPTIMIZE + VACUUM in parquet + atomic renames): the store is "
    "built as 6 append versions of 8 files each (48 small files, the "
    "layout a per-micro-batch append sink leaves behind), compacted "
    "to 4 files as a PUBLISHED version and vacuumed down to that one "
    "version.  The query re-reads the surviving store and aggregates "
    "per order-year, emitting the manifest's file count, the "
    "remaining version count, and the last op as columns — so the "
    "driver hash proves (a) not one row was lost or duplicated "
    "through rewrite + reclaim, (b) the data really sits in 4 files, "
    "and (c) history really is gone (readers of retired versions "
    "would now fail, which is vacuum's contract; "
    "tests/test_storage.py pins the interleaved-writer and "
    "replay-guard edges).  Reference analog: the bulk re-ingest "
    "scripts rewrite whole tables destructively "
    "(scripts/ingest_bulk_donations.py); this is the same space "
    "reclaim made atomic and crash-safe.  Scale: compaction reads and "
    "rewrites only the current snapshot ONCE (no shuffle — coalesce, "
    "not repartition), runs per-partition on a real table, and "
    "readers pinned to the pointer never see a torn state.",
)
def q_compaction_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.storage import SnapshotTable

    t = SnapshotTable(spark, _compaction_path(spark, sf_dir))
    versions = t.versions()
    man = t._manifest(versions[-1])
    return (
        t.read()
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .alias("total_price"),
        )
        .withColumn("n_files", F.lit(len(man["files"])).cast("int"))
        .withColumn("n_versions", F.lit(len(versions)).cast("int"))
        .withColumn("last_op", F.lit(man["op"]))
        .orderBy("yr")
    )
