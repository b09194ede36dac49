"""Training-data pipeline operators (north-star, beyond the reference):
deterministic dataset splitting, stratified sampling, sequence packing,
and corpus statistics over ``documents``.

These are the operations an LLM-data pipeline runs AFTER dedup/quality
filtering (textops.py): assign every document to train/val/test stably,
sample fixed-size strata for evaluation, pack documents into fixed token
budgets for efficient training, and report corpus composition.  All are
pure relational expressions with md5-based determinism, so every one is
DuckDB-oracle-verified — no RNG, no nondeterministic sampling.

Scale notes: split assignment and corpus stats are narrow maps + grouped
aggregates (shuffle on the tiny group key).  Stratified sampling is one
window per stratum.  Sequence packing uses a running sum over a global
order — the one intentionally serial shape here; at 100 TB you pack
per-shard (partitionBy(shard) in the window) and the bin ids become
(shard, bin), which this query demonstrates with `source` as the shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from politician_etl_project_spark.catalog import load_table
from politician_etl_project_spark.operators.dedup import tokens
from politician_etl_project_spark.queries.registry import declared_query

# stable 32-bit value from the doc id — identical md5 prefix on both engines
_SPARK_HASH = "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"
_DUCK_HASH = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)"


@declared_query(
    "q_hash_split",
    oracle=f"""
SELECT split,
       COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
FROM (
  SELECT text,
         CASE WHEN {_DUCK_HASH} % 100 < 80 THEN 'train'
              WHEN {_DUCK_HASH} % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
GROUP BY split
ORDER BY split
""",
    ops=("PIPE-split",),
    doc="Deterministic 80/10/10 train/val/test assignment by hashing the "
    "document id (north-star pipeline op).  Content-stable: re-running on "
    "a grown corpus never moves an existing doc between splits — the "
    "property RNG-based randomSplit lacks.  A narrow map + 3-group "
    "aggregate; scales as a single pass.",
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_SPARK_HASH) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), F.size(tokens()).alias("_nt"))
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("_nt").cast("bigint").alias("n_tokens"))
        .orderBy("split")
    )


@declared_query(
    "q_pretrain_e2e",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, text,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t != '') AS tk
  FROM documents
  WHERE lang = 'en'
), quality AS (
  SELECT doc_id, source, text, CAST(len(tk) AS BIGINT) AS n_toks
  FROM toks
  WHERE len(tk) BETWEEN 8 AND 400
    AND len(list_distinct(tk)) * 10 >= len(tk) * 3
), deduped AS (
  SELECT doc_id, source, n_toks
  FROM (
    SELECT doc_id, source, n_toks,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM quality
  )
  WHERE rn = 1
)
SELECT CASE WHEN {_DUCK_HASH} % 100 < 80 THEN 'train'
            WHEN {_DUCK_HASH} % 100 < 90 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM deduped
GROUP BY 1
ORDER BY split
""",
    ops=("PIPE-e2e", "PIPE-split", "DEDUP-exact", "TXT-quality", "A2"),
    doc="The WHOLE pretraining preprocessing chain as ONE composed plan "
    "— language filter, token-count + repetition quality gate (pure "
    "integer cross-multiply, engine-exact), exact-text dedup "
    "(keep-lowest-id per md5 fingerprint via a single min(struct) "
    "aggregate, map-side combinable), content-stable 80/10/10 hash "
    "split, and the per-split corpus report — demonstrating that the "
    "verified stage families FUSE into a single DAG a user runs as one "
    "job: one narrow scan pass, one dedup exchange, one report "
    "aggregate.  At 100 TB this is the shape that matters: no "
    "intermediate materialization between stages, Catalyst pipelines "
    "the filters into the scan, and the only wide edges are the "
    "fingerprint agg and the 3-group rollup.",
)
def q_pretrain_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    # array_remove('') mirrors the oracle's list_filter exactly: empty
    # docs are zero-length, not a phantom [''] (the >=8 gate would drop
    # them either way, but the token count must match the oracle
    # rendering for every row that SURVIVES)
    tk = F.array_remove(tokens(), "")
    quality = docs.select(
        "doc_id", "source", "text", F.size(tk).cast("bigint").alias("n_toks"),
        F.size(F.array_distinct(tk)).alias("n_uniq"),
    ).filter(
        F.col("n_toks").between(8, 400) & (F.col("n_uniq") * 10 >= F.col("n_toks") * 3)
    )
    # exact dedup without a join-back: min(struct) carries every column
    # the report needs through the one fingerprint exchange
    deduped = (
        quality.groupBy(F.md5("text").alias("fp"))
        .agg(F.min(F.struct("doc_id", "source", "n_toks")).alias("w"))
        .select(F.col("w.doc_id").alias("doc_id"), "w.source", "w.n_toks")
    )
    bucket = F.expr(_SPARK_HASH) % 100
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    return (
        deduped.select(split.alias("split"), "source", "n_toks", "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
        )
        .orderBy("split")
    )


@declared_query(
    "q_stratified_sample",
    oracle=f"""
SELECT lang, source, doc_id
FROM (
  SELECT lang, source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
WHERE rn <= 5
ORDER BY lang, source, doc_id
""",
    ops=("PIPE-sample", "W1"),
    doc="Deterministic stratified sample: 5 docs per (lang, source) "
    "stratum, chosen by hash order (north-star pipeline op — fixed eval "
    "subsets that don't move run-to-run).  One window per stratum; at "
    "scale this is a single shuffle on the stratum key, and the "
    "hash-order trick avoids any RNG state.",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("lang", "source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .drop("rn")
        .orderBy("lang", "source", "doc_id")
    )


_PACK_BUDGET = 2048


@declared_query(
    "q_sequence_packing",
    oracle=f"""
WITH sized AS (
  SELECT source, doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
), offs AS (
  SELECT source, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start_off
  FROM sized
)
SELECT source, CAST(FLOOR(start_off / {_PACK_BUDGET}) AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM offs
GROUP BY 1, 2
ORDER BY source, bin_id
""",
    ops=("PIPE-pack", "W1"),
    doc=f"Sequence packing (north-star): documents are laid end-to-end per "
    f"shard (source) in stable doc_id order and cut into {_PACK_BUDGET}-token "
    f"training bins — bin id = floor(start_offset / budget) over a running "
    f"token sum.  Per-shard windows keep the running sum parallel across "
    f"shards; exactly how a 100 TB corpus packs per-partition without a "
    f"global serial pass.",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "source", "doc_id", F.size(tokens()).cast("bigint").alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offs = sized.withColumn("start_off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return (
        offs.groupBy(
            "source",
            F.floor(F.col("start_off") / _PACK_BUDGET).cast("bigint").alias("bin_id"),
        )
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").cast("bigint").alias("bin_tokens"))
        .orderBy("source", "bin_id")
    )


# Shared funnel CTE prefix (quality gate → exact dedup → MinHash sigs →
# capped LSH bands → candidate pairs).  Both funnel oracles compose from
# this NAMED constant — the clusters oracle was previously derived from
# _FUNNEL_ORACLE by string surgery (split on a marker), which silently
# corrupted the derived SQL on any benign formatting edit (ADVICE r02).
_FUNNEL_PREFIX_CTES = """quality AS (
  SELECT doc_id, text
  FROM documents
  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 30
    AND CAST(len(regexp_extract_all(text, '\\b(the|a|of|and)\\b')) AS DOUBLE)
        / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1) >= 0.02
), exact AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           ROW_NUMBER() OVER (
             PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
             ORDER BY doc_id) AS rn
    FROM quality
  ) WHERE rn = 1
), sigs AS (
  SELECT doc_id, text,
         list_aggregate(list_transform(list_distinct(regexp_split_to_array(trim(text), '\\s+')), t -> md5('0|' || t)), 'min') AS sig0,
         list_aggregate(list_transform(list_distinct(regexp_split_to_array(trim(text), '\\s+')), t -> md5('1|' || t)), 'min') AS sig1,
         list_aggregate(list_transform(list_distinct(regexp_split_to_array(trim(text), '\\s+')), t -> md5('2|' || t)), 'min') AS sig2,
         list_aggregate(list_transform(list_distinct(regexp_split_to_array(trim(text), '\\s+')), t -> md5('3|' || t)), 'min') AS sig3
  FROM exact
), bands AS (
  SELECT doc_id, text, band_id, band_key FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY band_id, band_key ORDER BY doc_id) AS bn
    FROM (
      SELECT doc_id, text, 0 AS band_id, md5(sig0 || '|' || sig1) AS band_key FROM sigs
      UNION ALL
      SELECT doc_id, text, 1 AS band_id, md5(sig2 || '|' || sig3) AS band_key FROM sigs
    )
  ) WHERE bn <= 32
), cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b, l.text AS text_a, r.text AS text_b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
)"""

# Verified-pair CTE over `cand` — DECIMAL(18,4)/DECIMAL(18,6) comparator,
# the SAME fixed-point form operators/dedup.jaccard() and the sibling
# _DUP_CLUSTERS_ORACLE (textops.py) use, so every jaccard threshold in
# the repo shares one rounding contract (ADVICE r02: the previous DOUBLE
# form could diverge from the engine within ~5e-7 of the threshold).
_FUNNEL_PAIRS_CTE = """pairs AS (
  SELECT id_a, id_b FROM (
    SELECT id_a, id_b,
           len(list_intersect(list_distinct(regexp_split_to_array(trim(text_a), '\\s+')),
                              list_distinct(regexp_split_to_array(trim(text_b), '\\s+')))) AS ni,
           len(list_distinct(regexp_split_to_array(trim(text_a), '\\s+'))) AS na,
           len(list_distinct(regexp_split_to_array(trim(text_b), '\\s+'))) AS nb
    FROM cand
  ) WHERE CAST(CAST(ni AS DECIMAL(18,4)) / greatest(na + nb - ni, 1) AS DECIMAL(18,6)) >= 0.80
)"""

_FUNNEL_ORACLE = (
    "WITH "
    + _FUNNEL_PREFIX_CTES
    + ", "
    + _FUNNEL_PAIRS_CTE
    + """, drops AS (
  SELECT DISTINCT id_b FROM pairs
), final AS (
  SELECT doc_id FROM exact WHERE doc_id NOT IN (SELECT id_b FROM drops)
)
SELECT stage, n_docs FROM (
  SELECT '1_raw' AS stage, COUNT(*) AS n_docs FROM documents
  UNION ALL SELECT '2_quality', COUNT(*) FROM quality
  UNION ALL SELECT '3_exact_dedup', COUNT(*) FROM exact
  UNION ALL SELECT '4_near_dedup', COUNT(*) FROM final
  UNION ALL
  SELECT '5_' || CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 80 THEN 'train'
                      WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 90 THEN 'val'
                      ELSE 'test' END,
         COUNT(*)
  FROM final GROUP BY 1
)
ORDER BY stage
"""
)


# --- shared funnel stages (Spark side) -------------------------------------
# One definition of the quality gate / split label / exact-dedup keeper for
# BOTH funnel policies, mirroring how both oracles compose _FUNNEL_PREFIX_CTES
# — a drifted predicate between the two queries would silently change one
# funnel's population but not the other's.


def _funnel_quality() -> "F.Column":
    """Quality gate: ≥30 tokens and ≥2% stopword hits."""
    n_tokens = F.size(tokens())
    stop_hits = F.regexp_count("text", F.lit(r"\b(the|a|of|and)\b"))
    return (n_tokens >= 30) & (
        stop_hits.cast("double") / F.greatest(n_tokens, F.lit(1)) >= 0.02
    )


def _funnel_split() -> "F.Column":
    """Deterministic 80/10/10 split label from the doc-id hash."""
    bucket = F.expr(_SPARK_HASH) % 100
    return F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")


def _funnel_keepers(docs: DataFrame) -> DataFrame:
    """Quality rows surviving exact dedup (min doc_id per fingerprint),
    with their split label and distinct-token array — the input both
    near-dup policies (pair drops / component contraction) feed to the
    SAME lsh_bucket_pairs band-shuffle stage (plan-asserted single band
    exchange in tests/test_plans.py)."""
    from politician_etl_project_spark.operators.dedup import fingerprint

    w = Window.partitionBy("_fp").orderBy("doc_id")
    return (
        docs.filter(_funnel_quality())
        .select("doc_id", "text", fingerprint("text").alias("_fp"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id",
            _funnel_split().alias("split"),
            F.array_distinct(tokens()).alias("toks"),
        )
    )


@declared_query(
    "q_curation_funnel",
    oracle=_FUNNEL_ORACLE,
    ops=("PIPE-funnel", "TXT-dedup-exact", "TXT-minhash-lsh", "PIPE-split"),
    doc="The full curation funnel, composed end-to-end: raw corpus → "
    "quality gate (token count + stopword ratio) → exact dedup (keep "
    "min-id per fingerprint) → near-dup removal (capped MinHash-LSH "
    "candidates, exact Jaccard ≥0.8, drop the larger id of each pair) → "
    "deterministic train/val/test split.  One row of surviving-doc "
    "counts per stage — the dataset-curation report every LLM corpus "
    "pipeline publishes.  Every stage is the already-verified operator "
    "from textops/pipeline; this query proves they COMPOSE with "
    "hash-exact parity.  Scale: quality/fingerprint are narrow maps; "
    "the only quadratic risk (LSH buckets) is capped at 32 ids.",
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.dedup import (
        fingerprint,
        lsh_bucket_drops,
    )

    from pyspark import StorageLevel

    # ONE Spark job total (r1: five, r2: two): with ~10 shuffle stages
    # the wall time of this 7-row report is pure job/stage-scheduling
    # overhead, so the design goal is minimum job count at identical
    # semantics.  The stage-count branch and the near-dup drop branch
    # are UNIONed into one action over a persisted base.  Column pruning
    # gives the branches different scan projections, so ReuseExchange
    # can NOT dedupe them (measured: the uncached union scans the corpus
    # twice and runs 1.64 s); the cache is what both branches share.
    # The union races both branches into the not-yet-populated cache —
    # some narrow compute duplicates before blocks land — but the
    # duplicated work runs in the same job wave on otherwise-idle cores:
    # measured 1.19 s vs 1.45 s for r2's two serialized actions
    # (cache-materializing agg, then drops) at sf0.1 on local[32].
    #
    # Branch 1 — stage counts 1-3 as conditional aggregates: quality is
    # a flag (not a separate filtered frame), the exact-dedup keeper is
    # a row_number over (quality, fingerprint) — non-quality rows can
    # never be keepers because the keeper predicate requires the flag.
    docs = load_table(spark, sf_dir, "documents")
    is_q = _funnel_quality()
    split = _funnel_split()
    w = Window.partitionBy("_q", "_fp").orderBy("doc_id")
    # The cache holds exactly what the branches re-read: flags + the
    # keeper's distinct-token array (tokenized once; NULL for
    # non-keepers so the cached frame stays lean).
    base = (
        docs.select("doc_id", "text", is_q.alias("_q"), fingerprint("text").alias("_fp"))
        .withColumn("_keeper", F.col("_q") & (F.row_number().over(w) == 1))
        .select(
            "doc_id",
            "_q",
            "_keeper",
            split.alias("_split"),
            F.when(F.col("_keeper"), F.array_distinct(tokens())).alias("toks"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        k = F.col("_keeper").cast("bigint")
        # every SUM coalesced: over an EMPTY corpus SUM is NULL and the
        # stage arithmetic below would crash on None - int
        counts = base.agg(
            F.count("*").alias("c0"),
            F.coalesce(F.sum(F.col("_q").cast("bigint")), F.lit(0)).alias("c1"),
            F.coalesce(F.sum(k), F.lit(0)).alias("c2"),
            F.coalesce(F.sum(F.when(F.col("_split") == "train", k).otherwise(F.lit(0))), F.lit(0)).alias("c3"),
            F.coalesce(F.sum(F.when(F.col("_split") == "val", k).otherwise(F.lit(0))), F.lit(0)).alias("c4"),
            F.coalesce(F.sum(F.when(F.col("_split") == "test", k).otherwise(F.lit(0))), F.lit(0)).alias("c5"),
        ).select(
            F.expr(
                "stack(6, 'raw', c0, 'quality', c1, 'exact', c2, "
                "'train', c3, 'val', c4, 'test', c5) AS (label, n)"
            )
        )

        # Branch 2 — the near-dup drop chain.  Survivor counts are never
        # computed by anti-join: stage 4/5 numbers are the keeper counts
        # minus the per-split distinct drop counts (the split label is a
        # pure function of doc_id, so subtraction per label is exact).
        # rollup(split) + count_distinct(id_b) yields the per-split and
        # total drop counts in one aggregate; the chain is two exchanges
        # — the band shuffle, then the tiny split-key rollup.
        exact = base.filter("_keeper").select("doc_id", "toks", "_split")
        drops = lsh_bucket_drops(
            exact,
            "doc_id",
            n_hashes=4,
            rows_per_band=2,
            max_bucket=32,
            tokens_col="toks",
            min_jaccard=0.80,
        )
        drop_rollup = (
            drops.select(F.col("id_b").alias("doc_id"))
            .withColumn("_split", split)
            .rollup("_split")
            .agg(F.count_distinct("doc_id").alias("n"))
            .select(
                F.concat(F.lit("drop_"), F.coalesce("_split", F.lit("all"))).alias("label"),
                F.col("n"),
            )
        )

        collected = {r["label"]: r["n"] for r in counts.unionByName(drop_rollup).collect()}
    finally:
        base.unpersist()
    n_exact = collected["exact"]
    d_total = collected.get("drop_all", 0)
    rows = [
        ("1_raw", collected["raw"]),
        ("2_quality", collected["quality"]),
        ("3_exact_dedup", n_exact),
        ("4_near_dedup", n_exact - d_total),
    ]
    # the oracle's GROUP BY emits a split row only when the split is
    # non-empty — mirror that (matters at tiny scale factors)
    for name in ("train", "val", "test"):
        n = collected[name] - collected.get(f"drop_{name}", 0)
        if n > 0:
            rows.append((f"5_{name}", n))
    # VALUES literal instead of createDataFrame: the 7-row local list is
    # already on the driver, and createDataFrame's python->JVM conversion
    # costs ~0.8 s per call vs ~0.1 s for a parsed LocalRelation
    # (measured local[32]) — pure overhead on a report this small
    vals = ", ".join(f"('{stage}', CAST({n} AS BIGINT))" for stage, n in rows)
    return spark.sql(
        f"SELECT stage, n_docs FROM VALUES {vals} AS t(stage, n_docs) ORDER BY stage"
    )


@declared_query(
    "q_corpus_stats",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
       CAST(MIN(length(text)) AS INTEGER) AS min_chars,
       CAST(MAX(length(text)) AS INTEGER) AS max_chars
FROM documents
GROUP BY source
ORDER BY source
""",
    ops=("PIPE-stats", "A2"),
    doc="Corpus composition report per source: doc/lang counts, total "
    "token volume, char-length extremes (north-star pipeline op — the "
    "dataset card numbers).  Single grouped aggregate; all exact "
    "integers so the oracle hash-matches.",
)
def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum(F.size(tokens())).cast("bigint").alias("total_tokens"),
            F.min(F.length("text")).cast("int").alias("min_chars"),
            F.max(F.length("text")).cast("int").alias("max_chars"),
        )
        .orderBy("source")
    )


_N_SHARDS = 8
# training-order hash: seeded md5, 6 hex digits = 24 bits, portable
_SPARK_ORD = "md5(concat('shuf42|', cast(doc_id as string)))"
_DUCK_ORD = "md5('shuf42|' || CAST(doc_id AS VARCHAR))"


@declared_query(
    "q_train_shuffle",
    oracle=f"""
SELECT doc_id, shard, pos
FROM (
  SELECT doc_id,
         CAST(CAST('0x' || substr({_DUCK_ORD}, 1, 4) AS INTEGER) % {_N_SHARDS} AS INTEGER) AS shard,
         ROW_NUMBER() OVER (
           PARTITION BY CAST('0x' || substr({_DUCK_ORD}, 1, 4) AS INTEGER) % {_N_SHARDS}
           ORDER BY {_DUCK_ORD}, doc_id) AS pos
  FROM documents
)
ORDER BY shard, pos
""",
    ops=("PIPE-shuffle", "W1"),
    doc=f"Deterministic global training-order shuffle (north-star pipeline "
    f"op): every doc gets a (shard, pos) — shard = seeded-hash bucket of "
    f"{_N_SHARDS}, pos = rank of the hash within the shard.  Reading "
    f"shards in pos order IS a uniform permutation of the corpus, but "
    f"nothing global is ever sorted: one hash shuffle + per-shard local "
    f"sort, each shard an independent training file.  Content-stable and "
    f"seed-reproducible where an RNG shuffle is neither; at 100 TB the "
    f"shard count scales with executor count and the plan is unchanged.",
)
def q_train_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ordkey = F.expr(_SPARK_ORD)
    shard = (F.conv(F.substring(ordkey, 1, 4), 16, 10).cast("int") % _N_SHARDS).cast("int")
    w = Window.partitionBy("shard").orderBy("ordkey", "doc_id")
    return (
        docs.select("doc_id", ordkey.alias("ordkey"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


# mixture rate per source: (index % 4 + 1)/4 -> 0.25/0.50/0.75/1.00.
# keep-decision hash: 6 hex digits = 24 bits; thresholds are exact
# multiples of 2^22 so both engines compare the same integers.
_MIX_SEED = "mix42|"
_SPARK_MIX_HV = f"cast(conv(substring(md5(concat('{_MIX_SEED}', cast(doc_id as string))), 1, 6), 16, 10) as bigint)"
_DUCK_MIX_HV = f"CAST('0x' || substr(md5('{_MIX_SEED}' || CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)"


@declared_query(
    "q_corpus_mixture",
    oracle=f"""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN {_DUCK_MIX_HV} < (CAST(substr(source, 4) AS INTEGER) % 4 + 1) * 4194304
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       COALESCE(MIN(CASE WHEN {_DUCK_MIX_HV} < (CAST(substr(source, 4) AS INTEGER) % 4 + 1) * 4194304
                         THEN doc_id END), -1) AS min_kept_doc,
       COALESCE(MAX(CASE WHEN {_DUCK_MIX_HV} < (CAST(substr(source, 4) AS INTEGER) % 4 + 1) * 4194304
                         THEN doc_id END), -1) AS max_kept_doc
FROM documents
GROUP BY source
ORDER BY source
""",
    ops=("PIPE-mixture",),
    doc="Weighted corpus-mixture sampling (north-star pipeline op): each "
    "source is down-sampled at its mixture rate (here (idx%4+1)/4) by a "
    "seeded content hash — the way a training mix re-weights web vs "
    "curated sources.  Deterministic: re-runs keep exactly the same "
    "docs, and growing one source never perturbs another's sample "
    "(hash-threshold, not quota).  Pure single-pass scan + grouped "
    "conditional aggregate; kept-doc extremes are coalesced to -1 "
    "(no nullable numerics at the boundary).",
)
def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hv = F.expr(_SPARK_MIX_HV)
    rate_num = F.substring("source", 4, 10).cast("int") % 4 + 1
    kept = hv < (rate_num * 4194304).cast("bigint")
    kept_doc = F.when(kept, F.col("doc_id"))
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.coalesce(F.min(kept_doc), F.lit(-1)).alias("min_kept_doc"),
            F.coalesce(F.max(kept_doc), F.lit(-1)).alias("max_kept_doc"),
        )
        .orderBy("source")
    )


# Cluster-policy funnel: composes the SAME named prefix + pairs CTEs as
# _FUNNEL_ORACLE, then contracts pairs to components instead of dropping
# the larger id of each pair.
_FUNNEL_CLUSTERS_ORACLE = (
    "WITH RECURSIVE "
    + _FUNNEL_PREFIX_CTES
    + ", "
    + _FUNNEL_PAIRS_CTE
    + """, edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
), walk(n, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.v, w.r FROM walk w JOIN edges e ON e.u = w.n
), comp AS (
  SELECT n AS doc_id, MIN(r) AS cluster_id FROM walk GROUP BY n
)
SELECT split,
       COUNT(*) AS n_keepers,
       CAST(SUM(CASE WHEN c.cluster_id IS NULL OR c.cluster_id = k.doc_id
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
FROM (
  SELECT doc_id,
         CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 80 THEN 'train'
              WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM exact
) k LEFT JOIN comp c ON c.doc_id = k.doc_id
GROUP BY split
ORDER BY split"""
)


@declared_query(
    "q_funnel_clusters",
    oracle=_FUNNEL_CLUSTERS_ORACLE,
    ops=("PIPE-funnel", "TXT-components", "TXT-minhash-lsh", "PIPE-split"),
    doc="The curation funnel's near-dup stage under the CLUSTER policy: "
    "quality gate -> exact dedup -> capped LSH pairs -> connected "
    "components -> keep one doc (the component minimum) per cluster, "
    "reported per split.  The pair policy q_curation_funnel uses (drop "
    "the larger id of each verified pair) over-keeps on chained "
    "templates A~B~C where A!~C; component contraction does not — this "
    "query quantifies that gap per split.  Same plan as the funnel plus "
    "O(log^2 n) bounded star rounds.",
)
def q_funnel_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.components import duplicate_clusters
    from politician_etl_project_spark.operators.dedup import lsh_bucket_pairs

    keepers = _funnel_keepers(load_table(spark, sf_dir, "documents"))
    pairs = lsh_bucket_pairs(
        keepers, "doc_id", n_hashes=4, rows_per_band=2, max_bucket=32,
        tokens_col="toks", min_jaccard=0.80,
    )
    clusters = duplicate_clusters(pairs).select("doc_id", "cluster_id")
    survives = F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col("doc_id"))
    return (
        keepers.select("doc_id", "split")
        .join(clusters, "doc_id", "left")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_keepers"),
            F.sum(F.when(survives, 1).otherwise(0)).cast("bigint").alias("n_survivors"),
        )
        .orderBy("split")
    )


_CHUNK = 64
_STRIDE = 32


@declared_query(
    "q_context_windows",
    oracle=f"""
WITH sized AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n
  FROM documents
), chunks AS (
  SELECT doc_id, source, n,
         unnest(range(0, CASE WHEN n <= {_CHUNK} THEN 1
                              ELSE (n - {_CHUNK} + {_STRIDE} - 1) // {_STRIDE} + 1 END)) AS i
  FROM sized WHERE n > 0
), spans AS (
  SELECT doc_id, source,
         i * {_STRIDE} + 1 AS start_tok,
         least(i * {_STRIDE} + {_CHUNK}, n) AS end_tok
  FROM chunks
)
SELECT source,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_chunks,
       CAST(SUM(end_tok - start_tok + 1) AS BIGINT) AS total_chunk_tokens,
       CAST(SUM(CASE WHEN end_tok - start_tok + 1 = {_CHUNK} THEN 1 ELSE 0 END) AS BIGINT) AS n_full_chunks
FROM spans
GROUP BY source
ORDER BY source
""",
    ops=("PIPE-chunk", "D4"),
    doc=f"RAG context-window chunking: documents cut into {_CHUNK}-token "
    f"windows with {_STRIDE}-token stride (50%% overlap) — the chunking "
    "pass every retrieval corpus build runs before embedding "
    "(the reference embeds whole bill summaries, "
    "scripts/hydrate_vectors.py:72-95; overlapping windows are the "
    "standard upgrade for long texts).  Chunk spans are generated with "
    "sequence+explode per document and all boundary math is INTEGER "
    "(count = (n-chunk+stride-1) div stride + 1), so the oracle hash is "
    "exact.  Narrow map + explode + one grouped aggregate: at 100 TB "
    "this chains directly into hash_embedding/mapInPandas per chunk — "
    "no shuffle until the final per-source report.",
)
def q_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(tokens()).cast("bigint")
    # integer division: Spark `/` on bigint yields double — use div
    n_chunks = F.when(n <= _CHUNK, F.lit(1).cast("bigint")).otherwise(
        F.expr(f"(size(split(trim(text), '\\\\s+')) - {_CHUNK} + {_STRIDE} - 1) div {_STRIDE} + 1")
    )
    sized = docs.select("doc_id", "source", n.alias("n"), n_chunks.alias("nc")).filter(
        F.col("n") > 0
    )
    spans = sized.select(
        "doc_id",
        "source",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("i"),
    ).select(
        "doc_id",
        "source",
        (F.col("i") * _STRIDE + 1).alias("start_tok"),
        F.least(F.col("i") * _STRIDE + _CHUNK, F.col("n")).alias("end_tok"),
    )
    return (
        spans.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_chunks"),
            F.sum(F.col("end_tok") - F.col("start_tok") + 1).cast("bigint").alias("total_chunk_tokens"),
            F.sum(F.when(F.col("end_tok") - F.col("start_tok") + 1 == _CHUNK, 1).otherwise(0))
            .cast("bigint")
            .alias("n_full_chunks"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Deterministic negative sampling for contrastive training pairs
# ---------------------------------------------------------------------------


@declared_query(
    "q_negative_sampling",
    oracle="""
WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
cand AS (
  SELECT d.doc_id, j.neg_rank,
         CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '|' || CAST(j.neg_rank AS VARCHAR)), 1, 8) AS BIGINT)
           % n.cnt AS neg_id
  FROM (SELECT doc_id FROM documents WHERE doc_id < 100) d
  CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS neg_rank) j
  CROSS JOIN n
)
SELECT c.doc_id, c.neg_rank, c.neg_id, doc.source AS neg_source
FROM cand c JOIN documents doc ON c.neg_id = doc.doc_id
WHERE c.neg_id <> c.doc_id
ORDER BY c.doc_id, c.neg_rank
""",
    ops=("PIPE-negatives", "J7", "F11"),
    doc="Deterministic negative sampling for contrastive training: each "
    "anchor doc draws 3 pseudo-random negatives via the md5-derived "
    "hash of (doc_id, rank) mod corpus size — content-stable (re-runs "
    "and re-partitions never change a pair, unlike rand()-based "
    "sampling which cannot be hash-verified or reproduced), "
    "self-collisions dropped, negatives joined back for metadata.  "
    "The corpus size enters the plan as a broadcast 1-row aggregate — "
    "no driver collect.  At 100 TB: the negative join shuffles on "
    "neg_id exactly like any fact-dim join; skewed anchors don't skew "
    "negatives because the hash spreads uniformly.  This is the "
    "in-batch-negatives alternative every embedding-model data "
    "pipeline ships.",
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").alias("cnt"))
    anchors = docs.filter(F.col("doc_id") < 100).select("doc_id")
    ranks = spark.range(3).select(F.col("id").cast("int").alias("neg_rank"))
    cand = (
        anchors.crossJoin(F.broadcast(ranks))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "neg_rank",
            (
                F.expr(
                    "cast(conv(substring(md5(concat(cast(doc_id as string), '|', "
                    "cast(neg_rank as string))), 1, 8), 16, 10) as bigint)"
                )
                % F.col("cnt")
            ).alias("neg_id"),
        )
    )
    return (
        cand.filter(F.col("neg_id") != F.col("doc_id"))
        .join(docs.select(F.col("doc_id").alias("neg_id"), F.col("source").alias("neg_source")), "neg_id")
        .select("doc_id", "neg_rank", "neg_id", "neg_source")
        .orderBy("doc_id", "neg_rank")
    )


# ---------------------------------------------------------------------------
# Feature preprocessing: quantile normalization + the hashing trick
# ---------------------------------------------------------------------------


@declared_query(
    "q_quantile_normalize",
    oracle="""
SELECT event_type, event_id,
       CAST((1000000 * rk) // (n + 1) AS BIGINT) AS qnorm_micro
FROM (
  SELECT event_type, event_id,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE event_id < 2000
)
ORDER BY event_type, event_id
""",
    ops=("PIPE-qnorm", "W1"),
    doc="Per-group quantile normalization: each value maps to its rank "
    "position rk/(n+1) in integer micro-units — the distribution-free "
    "feature transform (and the label-smoothing-safe alternative to "
    "z-scores when outliers poison the variance, cf q_outlier_zscore). "
    "The (value, event_id) tie-break makes ranks total, so equal "
    "values get deterministic distinct quantiles — required for the "
    "exact hash and honest about what rank-based transforms do.  One "
    "shuffle on the group key; at 100 TB groups partition the window "
    "and no global sort exists.",
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    return (
        ev.select(
            "event_type",
            "event_id",
            F.row_number().over(w).alias("rk"),
            F.count("*").over(wn).alias("n"),
        )
        .select(
            "event_type",
            "event_id",
            F.expr("CAST((1000000 * rk) DIV (n + 1) AS BIGINT)").alias("qnorm_micro"),
        )
        .orderBy("event_type", "event_id")
    )


@declared_query(
    "q_feature_hashing",
    oracle="""
SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (
  SELECT doc_id,
         CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) % 64 AS bucket
  FROM (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
    FROM documents WHERE doc_id < 50
  )
)
GROUP BY doc_id, bucket
ORDER BY doc_id, bucket
""",
    ops=("PIPE-feature-hash", "TXT-tokenize", "A2"),
    doc="The hashing trick: tokens map to a fixed 64-bucket feature "
    "space via the md5-derived hash (content-stable — the same token "
    "hits the same bucket on every run, machine, and engine, which "
    "rand- or JVM-hash-based implementations cannot promise), giving "
    "each document a bounded sparse count vector with no vocabulary "
    "pass at all.  This is the preprocessing step for linear models / "
    "sketch features over unbounded vocabularies.  Narrow tokenize + "
    "one aggregate on (doc, bucket); dimensionality is a constant, so "
    "the output is bounded regardless of corpus vocabulary.",
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    tok = d.select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
    bucket = F.expr(
        "cast(conv(substring(md5(token), 1, 8), 16, 10) as bigint) % 64"
    )
    return (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy("doc_id", "bucket")
    )


# ---------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------


@declared_query(
    "q_weighted_sample_topk",
    oracle="""
SELECT doc_id, n_chars AS weight
FROM (
  SELECT doc_id, n_chars,
         ln(CAST(('0x' || substr(md5('es-v1|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1 AS DOUBLE)
            / 4294967296.0) / CAST(n_chars AS DOUBLE) AS es_key
  FROM documents WHERE n_chars > 0
)
ORDER BY es_key DESC, doc_id
LIMIT 25
""",
    ops=("PIPE-weighted-sample", "O3"),
    doc="Weighted sampling WITHOUT replacement via Efraimidis-Spirakis "
    "A-ES: each row draws key = ln(u)/w with u a deterministic "
    "md5-derived uniform in (0,1], and the top-k keys form an exact "
    "weighted sample — unlike the Bernoulli-style per-row thinning of "
    "q_weighted_downsample, the output size is EXACTLY k and inclusion "
    "probability is proportional to weight, which is the contract "
    "corpus-mixture recipes assume when they subsample a source to a "
    "fixed token budget.  The hash-uniform makes the sample "
    "content-stable and hash-verifiable (both engines compute ln on "
    "the identical double).  Scale: narrow map + TakeOrderedAndProject "
    "— no shuffle beyond top-k.",
)
def q_weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        "(cast(conv(substring(md5(concat('es-v1|', cast(doc_id as string))), 1, 8), 16, 10) as bigint) + 1)"
        " / 4294967296.0d"
    )
    es_key = F.expr(f"ln({u}) / CAST(n_chars AS DOUBLE)")
    return (
        docs.select("doc_id", F.col("n_chars").alias("weight"), es_key.alias("es_key"))
        .orderBy(F.desc("es_key"), "doc_id")
        .limit(25)
        .select("doc_id", "weight")
    )
