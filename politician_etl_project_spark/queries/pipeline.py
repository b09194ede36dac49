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
