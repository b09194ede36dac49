"""Text-analysis + dedup declared queries over ``documents`` (north-star
LLM-data-pipeline operators; BASELINE.json).  All heavy lifting is native
expressions from ``operators/dedup.py`` — md5/array-lambda/bit ops inside
codegen, no Python UDFs.  Each query has a full DuckDB oracle (the md5 /
list-lambda functions exist on both engines), so even the MinHash-LSH
near-dup pipeline is hash-verified end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from politician_etl_project_spark.catalog import load_table
from politician_etl_project_spark.operators.dedup import (
    exact_dup_groups,
    fingerprint,
    hamming16,
    jaccard,
    simhash16_from_hashes,
    token_hashes,
    tokens,
)
from politician_etl_project_spark.queries.registry import REGISTRY, declared_query

_DUCK_TOKS = "regexp_split_to_array(trim(text), '\\s+')"
_DUCK_DTOKS = f"list_distinct({_DUCK_TOKS})"


@declared_query(
    "q_token_stats",
    oracle=f"""
SELECT doc_id,
       CAST(len({_DUCK_TOKS}) AS INTEGER) AS n_tokens,
       CAST(len({_DUCK_DTOKS}) AS INTEGER) AS n_distinct_tokens,
       CAST(length(text) AS INTEGER) AS n_chars
FROM documents
ORDER BY doc_id
""",
    ops=("TXT-tokens",),
    doc="Token counting (whitespace tokenizer) — the text-analysis "
    "primitive every downstream op builds on. North-star text analysis; "
    "closest reference op is the summary length guard "
    "scripts/hydrate_vectors.py:51.",
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens()).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(tokens())).cast("int").alias("n_distinct_tokens"),
        F.length("text").cast("int").alias("n_chars"),
    ).orderBy("doc_id")


@declared_query(
    "q_text_quality",
    oracle=f"""
SELECT doc_id,
       n_tokens,
       CAST(CAST(sum_len AS DECIMAL(18,4)) / greatest(n_tokens, 1) AS DECIMAL(18,6)) AS avg_token_len,
       CAST(CAST(stop_hits AS DECIMAL(18,4)) / greatest(n_tokens, 1) AS DECIMAL(18,6)) AS stopword_ratio,
       CAST(CAST(n_distinct AS DECIMAL(18,4)) / greatest(n_tokens, 1) AS DECIMAL(18,6)) AS ttr,
       (n_tokens >= 30 AND CAST(stop_hits AS DOUBLE) / greatest(n_tokens, 1) >= 0.02) AS is_quality
FROM (
  SELECT doc_id,
         CAST(len({_DUCK_TOKS}) AS INTEGER) AS n_tokens,
         CAST(len({_DUCK_DTOKS}) AS INTEGER) AS n_distinct,
         CAST(list_sum(list_transform({_DUCK_TOKS}, t -> length(t))) AS INTEGER) AS sum_len,
         CAST(len(regexp_extract_all(text, '\\b(the|a|of|and)\\b')) AS INTEGER) AS stop_hits
  FROM documents
)
ORDER BY doc_id
""",
    ops=("TXT-quality",),
    doc="Quality scoring: token count, mean token length, stopword ratio, "
    "type-token ratio, boolean quality gate (north-star text analysis — "
    "the length/stopword-ratio heuristics used to filter LLM training "
    "corpora). Exact decimal ratios so the oracle hash-matches.",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select(
        "doc_id",
        F.size(tokens()).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(tokens())).cast("int").alias("n_distinct"),
        F.expr("cast(aggregate(split(trim(text), '\\\\s+'), 0, (a, t) -> a + length(t)) as int)").alias(
            "sum_len"
        ),
        F.regexp_count("text", F.lit(r"\b(the|a|of|and)\b")).cast("int").alias("stop_hits"),
    )
    denom = F.greatest(F.col("n_tokens"), F.lit(1))
    return stats.select(
        "doc_id",
        "n_tokens",
        (F.col("sum_len").cast("decimal(18,4)") / denom).cast("decimal(18,6)").alias("avg_token_len"),
        (F.col("stop_hits").cast("decimal(18,4)") / denom).cast("decimal(18,6)").alias("stopword_ratio"),
        (F.col("n_distinct").cast("decimal(18,4)") / denom).cast("decimal(18,6)").alias("ttr"),
        ((F.col("n_tokens") >= 30) & (F.col("stop_hits").cast("double") / denom >= 0.02)).alias(
            "is_quality"
        ),
    ).orderBy("doc_id")


@declared_query(
    "q_lang_id",
    oracle="""
SELECT doc_id, lang,
       CASE WHEN en_hits > fn_hits THEN 'en' ELSE 'xx' END AS pred_lang,
       (CASE WHEN en_hits > fn_hits THEN 'en' ELSE 'xx' END) = lang AS agrees
FROM (
  SELECT doc_id, lang,
         CAST(len(regexp_extract_all(lower(text), '\\b(the|a|of|and)\\b')) AS INTEGER) AS en_hits,
         CAST(len(regexp_extract_all(lower(text), '\\b(data|spark|merge)\\b')) AS INTEGER) AS fn_hits
  FROM documents
)
ORDER BY doc_id
""",
    ops=("TXT-langid",),
    doc="Language-ID n-gram/stopword heuristic (north-star). The testdata's "
    "lang column is decorative (all langs share one vocabulary), so this "
    "demonstrates the operator shape — marker-frequency vote — with a "
    "deterministic oracle, not real accuracy.",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        F.regexp_count(F.lower("text"), F.lit(r"\b(the|a|of|and)\b")).cast("int").alias("en_hits"),
        F.regexp_count(F.lower("text"), F.lit(r"\b(data|spark|merge)\b")).cast("int").alias("fn_hits"),
    )
    pred = F.when(F.col("en_hits") > F.col("fn_hits"), "en").otherwise("xx")
    return scored.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("agrees"),
    ).orderBy("doc_id")


@declared_query(
    "q_dedup_exact",
    oracle="""
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS keeper_id
FROM documents
GROUP BY 1
ORDER BY fingerprint
""",
    ops=("A14", "TXT-dedup-exact"),
    doc="Exact dedup via content fingerprint hash-groupBy (north-star; "
    "reference analog drop_duplicates scripts/ingest_bulk_donations.py:102). "
    "Keeper = min id, deterministic first-wins. At 100 TB this is one "
    "shuffle on the 32-char digest.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dup_groups(docs).orderBy("fingerprint")


@declared_query(
    "q_minhash_signatures",
    oracle=f"""
SELECT doc_id,
       list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('0|' || t)), 'min') AS sig0,
       list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('1|' || t)), 'min') AS sig1,
       list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('2|' || t)), 'min') AS sig2,
       list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('3|' || t)), 'min') AS sig3
FROM documents
ORDER BY doc_id
""",
    ops=("TXT-minhash",),
    doc="MinHash signatures (k=4) over the distinct-token set, md5 hash "
    "family, lexicographic min (north-star near-dup stage 1). Pure "
    "expression — scales as a narrow map, no shuffle.",
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.dedup import minhash_signature_from

    docs = load_table(spark, sf_dir, "documents")
    # tokenize once, then derive the 4 hash families from the array column
    # (minhash_signature would inline the tokenizer per family)
    return (
        docs.withColumn("_toks", F.array_distinct(tokens()))
        .select("doc_id", *minhash_signature_from("_toks", 4))
        .orderBy("doc_id")
    )


_NEAR_DUP_ORACLE = f"""
WITH sigs AS (
  SELECT doc_id, text,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('0|' || t)), 'min') AS sig0,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('1|' || t)), 'min') AS sig1,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('2|' || t)), 'min') AS sig2,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('3|' || t)), 'min') AS sig3
  FROM documents
), bands AS (
  SELECT doc_id, text, 0 AS band_id, md5(sig0 || '|' || sig1) AS band_key FROM sigs
  UNION ALL
  SELECT doc_id, text, 1 AS band_id, md5(sig2 || '|' || sig3) AS band_key FROM sigs
), cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
         l.text AS text_a, r.text AS text_b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
), toks AS (
  SELECT id_a, id_b,
         list_distinct(regexp_split_to_array(trim(text_a), '\\s+')) AS ta,
         list_distinct(regexp_split_to_array(trim(text_b), '\\s+')) AS tb
  FROM cand
), counts AS (
  SELECT id_a, id_b,
         len(list_intersect(ta, tb)) AS n_inter,
         len(ta) AS n_a, len(tb) AS n_b
  FROM toks
)
SELECT id_a, id_b,
       CAST(CAST(n_inter AS DECIMAL(18,4))
            / greatest(n_a + n_b - n_inter, 1) AS DECIMAL(18,6)) AS jaccard
FROM counts
WHERE CAST(CAST(n_inter AS DECIMAL(18,4))
           / greatest(n_a + n_b - n_inter, 1) AS DECIMAL(18,6)) >= 0.80
ORDER BY id_a, id_b
"""


@declared_query(
    "q_near_dup_pairs",
    oracle=_NEAR_DUP_ORACLE,
    ops=("TXT-minhash-lsh", "J9"),
    doc="Full MinHash-LSH near-dup pipeline: sign (k=4) → band (2×2) → "
    "bucket self-join for candidates → exact unigram-Jaccard verify ≥0.8 "
    "(north-star dedup; same block-then-verify shape as the reference's "
    "fuzzy FEC join, scripts/ingest_fec_links.py:95-148). Shuffle is on "
    "band keys only — O(docs·bands) rows, never O(docs²).  Cost note: "
    "the synthetic corpus is pathologically dense — at sf0.1, 5k docs "
    "yield 7.5M candidates of which 2.8M pairs VERIFY at Jaccard>=0.8, "
    "so runtime there (~12 s compute) is the answer's volume, not plan "
    "waste.  bench.py therefore times this query on a same-size corpus "
    "at realistic 1-10% duplication density (tools/gen_sparse_docs.py, "
    "BENCH_SF_OVERRIDE) where the measured cost is candidate-gen + "
    "verify; production corpora at high density use the capped twin "
    "(q_near_dup_pairs_capped) or go straight to clusters "
    "(q_dup_clusters).",
)
def q_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.dedup import lsh_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs, "doc_id", "text", n_hashes=4, rows_per_band=2)
    a = docs.select(F.col("doc_id").alias("id_a"), F.array_distinct(tokens()).alias("toks_a"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.array_distinct(tokens()).alias("toks_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jaccard("toks_a", "toks_b").alias("jaccard"))
        .filter(F.col("jaccard") >= 0.80)
        .orderBy("id_a", "id_b")
    )


_CAP = 32

_NEAR_DUP_CAPPED_ORACLE = f"""
WITH sigs AS (
  SELECT doc_id, text,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('0|' || t)), 'min') AS sig0,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('1|' || t)), 'min') AS sig1,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('2|' || t)), 'min') AS sig2,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('3|' || t)), 'min') AS sig3
  FROM documents
), all_bands AS (
  SELECT doc_id, text, 0 AS band_id, md5(sig0 || '|' || sig1) AS band_key FROM sigs
  UNION ALL
  SELECT doc_id, text, 1 AS band_id, md5(sig2 || '|' || sig3) AS band_key FROM sigs
), bands AS (
  SELECT doc_id, text, band_id, band_key FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY band_id, band_key ORDER BY doc_id) AS bn
    FROM all_bands
  ) WHERE bn <= {_CAP}
), cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
         l.text AS text_a, r.text AS text_b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
), toks AS (
  SELECT id_a, id_b,
         list_distinct(regexp_split_to_array(trim(text_a), '\\s+')) AS ta,
         list_distinct(regexp_split_to_array(trim(text_b), '\\s+')) AS tb
  FROM cand
), counts AS (
  SELECT id_a, id_b,
         len(list_intersect(ta, tb)) AS n_inter,
         len(ta) AS n_a, len(tb) AS n_b
  FROM toks
)
SELECT id_a, id_b,
       CAST(CAST(n_inter AS DECIMAL(18,4))
            / greatest(n_a + n_b - n_inter, 1) AS DECIMAL(18,6)) AS jaccard
FROM counts
WHERE CAST(CAST(n_inter AS DECIMAL(18,4))
           / greatest(n_a + n_b - n_inter, 1) AS DECIMAL(18,6)) >= 0.80
ORDER BY id_a, id_b
"""


@declared_query(
    "q_near_dup_pairs_capped",
    oracle=_NEAR_DUP_CAPPED_ORACLE,
    ops=("TXT-minhash-lsh", "J9"),
    doc=f"Bounded-output MinHash-LSH near-dup: identical to q_near_dup_pairs "
    f"but each LSH bucket keeps only its {_CAP} smallest doc ids before "
    f"pairing, so a bucket contributes at most {_CAP}*{_CAP - 1}//2 "
    f"candidate pairs regardless of skew.  This is the 100 TB-safe shape: "
    f"the synthetic corpus has a 3125-doc hot bucket whose uncapped "
    f"pair volume (~5M) is output cost, not plan cost; at real scale a "
    f"boilerplate flood would do the same.  Everything the cap skips is "
    f"near-identical content that exact dedup (q_dedup_exact) removes "
    f"first in the production order dedup_exact -> near_dup.  Deterministic "
    f"(row_number over doc_id) so the DuckDB oracle hash-matches.",
)
def q_near_dup_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.dedup import lsh_bucket_pairs

    # capped buckets admit the one-shuffle in-bucket enumeration (pairs
    # generated + verified inside the band exchange's reduce stage — no
    # self-join, no token join-back); the uncapped sibling above MUST
    # keep the self-join form, since collecting an unbounded bucket into
    # one row is exactly the OOM the cap prevents
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(tokens()).alias("toks")
    )
    pairs = lsh_bucket_pairs(
        docs, "doc_id", n_hashes=4, rows_per_band=2, max_bucket=_CAP,
        tokens_col="toks", min_jaccard=0.80,
    )
    return pairs.distinct().orderBy("id_a", "id_b")


_DUCK_3GRAMS = (
    "list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1), "
    "i -> concat_ws(' ', t[i], t[i+1], t[i+2])))"
)

_NGRAM_JACCARD_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {_DUCK_3GRAMS} AS g
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
), sigs AS (
  SELECT doc_id, g,
         list_aggregate(list_transform(g, s -> md5('0|' || s)), 'min') AS sig0,
         list_aggregate(list_transform(g, s -> md5('1|' || s)), 'min') AS sig1,
         list_aggregate(list_transform(g, s -> md5('2|' || s)), 'min') AS sig2,
         list_aggregate(list_transform(g, s -> md5('3|' || s)), 'min') AS sig3
  FROM sh
), all_bands AS (
  SELECT doc_id, g, 0 AS band_id, md5(sig0 || '|' || sig1) AS band_key FROM sigs
  UNION ALL
  SELECT doc_id, g, 1 AS band_id, md5(sig2 || '|' || sig3) AS band_key FROM sigs
), bands AS (
  SELECT doc_id, g, band_id, band_key FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY band_id, band_key ORDER BY doc_id) AS bn
    FROM all_bands
  ) WHERE bn <= 32
), cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b, l.g AS ga, r.g AS gb
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
), counts AS (
  SELECT id_a, id_b,
         len(list_intersect(ga, gb)) AS n_inter, len(ga) AS n_a, len(gb) AS n_b
  FROM cand
)
SELECT id_a, id_b,
       CAST(CAST(n_inter AS DECIMAL(18,4))
            / greatest(n_a + n_b - n_inter, 1) AS DECIMAL(18,6)) AS jaccard
FROM counts
WHERE CAST(CAST(n_inter AS DECIMAL(18,4))
           / greatest(n_a + n_b - n_inter, 1) AS DECIMAL(18,6)) >= 0.50
ORDER BY id_a, id_b
"""


# Transitive closure over the verified near-dup pairs: DuckDB's
# recursive CTE enumerates (node, reachable-node) over the symmetric
# edge set — set-semantics UNION terminates it — and MIN(reachable)
# per node is the component minimum, exactly what the Spark-side
# star-contraction fixpoint assigns.
_DUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE sigs AS (
  SELECT doc_id,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('0|' || t)), 'min') AS sig0,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('1|' || t)), 'min') AS sig1,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('2|' || t)), 'min') AS sig2,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('3|' || t)), 'min') AS sig3,
         {_DUCK_DTOKS} AS toks
  FROM documents
), all_bands AS (
  SELECT doc_id, toks, 0 AS band_id, md5(sig0 || '|' || sig1) AS band_key FROM sigs
  UNION ALL
  SELECT doc_id, toks, 1 AS band_id, md5(sig2 || '|' || sig3) AS band_key FROM sigs
), bands AS (
  SELECT doc_id, toks, band_id, band_key FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY band_id, band_key ORDER BY doc_id) AS bn
    FROM all_bands
  ) WHERE bn <= {_CAP}
), cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
         l.toks AS ta, r.toks AS tb
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
), pairs AS (
  SELECT id_a, id_b FROM (
    SELECT id_a, id_b,
           len(list_intersect(ta, tb)) AS n_inter, len(ta) AS n_a, len(tb) AS n_b
    FROM cand
  ) WHERE CAST(CAST(n_inter AS DECIMAL(18,4))
               / greatest(n_a + n_b - n_inter, 1) AS DECIMAL(18,6)) >= 0.80
), edges AS (
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
SELECT c.doc_id, c.cluster_id, CAST(s.cluster_size AS BIGINT) AS cluster_size
FROM comp c
JOIN (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id) s
  USING (cluster_id)
ORDER BY doc_id
"""


@declared_query(
    "q_dup_clusters",
    oracle=_DUP_CLUSTERS_ORACLE,
    ops=("TXT-components", "TXT-minhash-lsh"),
    doc="Duplicate CLUSTERS via distributed connected components "
    "(alternating large-star/small-star, operators/components.py) over "
    "the verified near-dup pairs of q_near_dup_pairs_capped.  Near-dup "
    "similarity is not transitive, so pair-level dedup leaves chained "
    "templates behind; the production policy keeps one representative "
    "per component (doc_id == cluster_id).  O(log^2 n) rounds regardless "
    "of chain length — the naive label-propagation alternative is "
    "O(diameter) rounds and dies on boilerplate chains at 100 TB.  "
    "Oracle = DuckDB recursive CTE reachability with MIN over the "
    "component.  No reference equivalent (its dedup is keyed SQL upsert, "
    "app/database.py) — LLM-pipeline addition.",
)
def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.components import duplicate_clusters
    from politician_etl_project_spark.operators.dedup import lsh_bucket_pairs

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(tokens()).alias("toks")
    )
    pairs = lsh_bucket_pairs(
        docs, "doc_id", n_hashes=4, rows_per_band=2, max_bucket=_CAP,
        tokens_col="toks", min_jaccard=0.80,
    )
    return duplicate_clusters(pairs).orderBy("doc_id")


_DEDUP_SURVIVORS_ORACLE = (
    _DUP_CLUSTERS_ORACLE.replace(
        """SELECT c.doc_id, c.cluster_id, CAST(s.cluster_size AS BIGINT) AS cluster_size
FROM comp c
JOIN (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id) s
  USING (cluster_id)
ORDER BY doc_id""",
        """SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN c.cluster_id IS NULL OR c.cluster_id = d.doc_id
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
GROUP BY d.source
ORDER BY d.source""",
    )
)


@declared_query(
    "q_dedup_survivors",
    oracle=_DEDUP_SURVIVORS_ORACLE,
    ops=("TXT-components", "TXT-minhash-lsh", "A6"),
    doc="Cluster-policy dedup as a DATASET: keep exactly one document "
    "(the minimum id) per near-dup connected component, everything "
    "unclustered survives untouched; reported as per-source survivor "
    "counts.  This is the end-to-end policy q_dup_clusters enables — "
    "pair-level drop-the-larger-id (curation funnel) over-keeps on "
    "chained templates; component-level keep-one does not.  One LSH "
    "band shuffle + O(log^2 n) star rounds + a broadcast-size join "
    "back to the corpus.",
)
def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.components import duplicate_clusters
    from politician_etl_project_spark.operators.dedup import lsh_bucket_pairs

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.array_distinct(tokens()).alias("toks"))
    pairs = lsh_bucket_pairs(
        toks, "doc_id", n_hashes=4, rows_per_band=2, max_bucket=_CAP,
        tokens_col="toks", min_jaccard=0.80,
    )
    clusters = duplicate_clusters(pairs).select("doc_id", "cluster_id")
    survives = F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col("doc_id"))
    return (
        docs.select("doc_id", "source")
        .join(clusters, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(survives, 1).otherwise(0)).cast("bigint").alias("n_survivors"),
        )
        .orderBy("source")
    )


@declared_query(
    "q_ngram_jaccard_pairs",
    oracle=_NGRAM_JACCARD_ORACLE,
    ops=("TXT-ngram-jaccard", "TXT-minhash-lsh"),
    doc="Word-3-gram Jaccard near-dup (north-star dedup family member "
    "distinct from the unigram variant): shingle -> minhash over the "
    "SHINGLE set -> banded LSH with capped buckets -> exact 3-gram "
    "Jaccard >= 0.5 verified in-bucket.  Order-sensitive by "
    "construction — shuffled copies of a document that unigram Jaccard "
    "calls identical score near zero here, which is why corpus dedup "
    "uses shingles.  One band shuffle (in-bucket enumeration, "
    "lsh_bucket_pairs); threshold is lower than the unigram 0.8 because "
    "shingle overlap decays faster than token overlap on edited text.",
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.dedup import lsh_bucket_pairs, shingles

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", shingles("text", 3).alias("g")
    )
    pairs = lsh_bucket_pairs(
        docs, "doc_id", n_hashes=4, rows_per_band=2, max_bucket=_CAP,
        tokens_col="g", min_jaccard=0.50,
    )
    return pairs.distinct().orderBy("id_a", "id_b")


# per-bit votes over a PREcomputed token-hash list (computed once in the
# subquery below — inlining the tokenize+md5 in all 16 bits was the 5x
# hotspot on both engines)
_DUCK_SIMHASH_FROM_TH = " + ".join(
    f"(CASE WHEN list_sum(list_transform(th, h -> "
    f"CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN {1 << b} ELSE 0 END)"
    for b in range(16)
)
_DUCK_TH = (
    f"list_transform({_DUCK_DTOKS}, t -> CAST('0x' || substr(md5(t), 1, 4) AS INTEGER))"
)


@declared_query(
    "q_simhash",
    oracle=f"""
SELECT doc_id, CAST({_DUCK_SIMHASH_FROM_TH} AS INTEGER) AS simhash
FROM (SELECT doc_id, {_DUCK_TH} AS th FROM documents)
ORDER BY doc_id
""",
    ops=("TXT-simhash",),
    doc="16-bit SimHash sketch per document (north-star near-dup): token "
    "hash = first 16 md5 bits computed once per doc, per-bit ±1 vote, "
    "sign. All bit math in codegen (conv/shiftright/bit ops).",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("_th", token_hashes("text"))
        .select("doc_id", simhash16_from_hashes("_th").alias("simhash"))
        .orderBy("doc_id")
    )


def simhash_band_pairs(sh: DataFrame, block_cols: tuple[str, ...] = ()) -> DataFrame:
    """Band-blocked candidate pairs over a ``(doc_id, simhash[, blocks])``
    frame: the 16-bit sketch splits into 3 bands (6/5/5 bits); by
    pigeonhole any pair within hamming<=2 flips bits in at most 2 bands,
    so it MUST agree exactly on at least one band — candidates are the
    per-band equi-join union (LOSSLESS for hamming<=2).  ``block_cols``
    become extra equality keys (e.g. ``source`` for source-scoped dedup).

    Scale: three shuffles on (band value[, block]) keys replace the
    unbounded block self-join — a 100 TB corpus where one source is 90%
    of documents no longer degrades to O(n²) pairs inside that source,
    because the band value subdivides every block.  Returns distinct
    ``(id_a, id_b, sh_a, sh_b)`` with ``id_a < id_b``; callers verify
    with the exact hamming filter."""
    blocks = list(block_cols)
    # materialize the sketch frame once (token-hash md5s are the
    # expensive part — without the checkpoint both join sides of every
    # band would recompute them, 6x)
    sh = sh.localCheckpoint(eager=False)
    # ONE self-join on (band_id, band_value[, blocks]) instead of three
    # per-band joins: each doc explodes to 3 band rows, so the join
    # exchanges 3n tiny rows once and the pair stream needs no union
    bands = sh.select(
        "doc_id",
        "simhash",
        *blocks,
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band_id"), F.shiftright("simhash", 10).alias("bv")),
                F.struct(F.lit(1).alias("band_id"), (F.shiftright("simhash", 5) % 32).alias("bv")),
                F.struct(F.lit(2).alias("band_id"), (F.col("simhash") % 32).alias("bv")),
            )
        ).alias("b"),
    ).select("doc_id", "simhash", *blocks, "b.band_id", "b.bv")
    l = bands.select(
        F.col("doc_id").alias("id_a"),
        F.col("simhash").alias("sh_a"),
        *[F.col(c) for c in blocks],
        "band_id",
        "bv",
    )
    r = bands.select(
        F.col("doc_id").alias("id_b"),
        F.col("simhash").alias("sh_b"),
        *[F.col(c) for c in blocks],
        "band_id",
        "bv",
    )
    return (
        l.join(r, ["band_id", "bv", *blocks])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )


@declared_query(
    "q_simhash_near_pairs",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, source, CAST({_DUCK_SIMHASH_FROM_TH} AS INTEGER) AS simhash
  FROM (SELECT doc_id, source, {_DUCK_TH} AS th FROM documents)
)
SELECT l.doc_id AS id_a, r.doc_id AS id_b,
       CAST(bit_count(xor(l.simhash, r.simhash)) AS INTEGER) AS hamming
FROM sh l JOIN sh r ON l.source = r.source AND l.doc_id < r.doc_id
WHERE bit_count(xor(l.simhash, r.simhash)) <= 2
ORDER BY id_a, id_b
""",
    ops=("TXT-simhash", "J9", "TXT-banding"),
    doc="SimHash near-dup pairs, source-scoped: candidates come from the "
    "pigeonhole 6/5/5 band join (``simhash_band_pairs``) with source as "
    "an extra equi-key, then the exact hamming<=2 filter.  The oracle "
    "deliberately computes the NAIVE all-pairs-within-source form, so "
    "the hash match PROVES banding is lossless.  Scale: band keys "
    "subdivide every source block, so a dominant source no longer "
    "degrades to O(n²) pairs (round-3 verdict item 2).",
)
def q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.withColumn("_th", token_hashes("text")).select(
        "doc_id", "source", simhash16_from_hashes("_th").alias("simhash")
    )
    return (
        simhash_band_pairs(sh, block_cols=("source",))
        .withColumn("hamming", hamming16("sh_a", "sh_b"))
        .filter(F.col("hamming") <= 2)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


# --- rolling-hash fingerprinting (north-star: document fingerprinting) ------

_MOD = 1_000_000_007
_BASE = 131
# token -> 28-bit int hash, same digest prefix both engines
_SPARK_TH28 = "transform(split(trim(text), '\\\\s+'), t -> cast(conv(substring(md5(t), 1, 7), 16, 10) as bigint))"
_DUCK_TH28 = (
    "list_transform(regexp_split_to_array(trim(text), '\\s+'), "
    "t -> CAST('0x' || substr(md5(t), 1, 7) AS BIGINT))"
)


@declared_query(
    "q_rolling_fingerprint",
    oracle=f"""
SELECT doc_id,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), th),
                        (a, b) -> (a * {_BASE} + b) % {_MOD}) AS BIGINT) AS doc_fingerprint,
       CAST(len(th) AS INTEGER) AS n_tokens,
       CAST(list_min(list_transform(range(1, greatest(len(th) - 7, 0) + 1),
             i -> list_reduce(list_prepend(CAST(0 AS BIGINT), th[i : i + 7]),
                              (a, b) -> (a * {_BASE} + b) % {_MOD}))) AS BIGINT) AS winnow_min
FROM (SELECT doc_id, {_DUCK_TH28} AS th FROM documents)
ORDER BY doc_id
""",
    ops=("TXT-fingerprint",),
    doc="Document fingerprinting via polynomial rolling hash (north-star): "
    "whole-doc Rabin-Karp fold over token hashes, plus the winnowing "
    "fingerprint — the MINIMUM hash over all 8-token windows, the "
    "shift-robust signature used for plagiarism/near-dup detection "
    "(Schleimer et al. winnowing). Pure integer folds inside codegen on "
    "both engines; no Python, no shuffle.",
)
def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_h = docs.select("doc_id", F.expr(_SPARK_TH28).alias("th"))
    fold = f"aggregate(th, cast(0 as bigint), (a, b) -> (a * {_BASE} + b) % {_MOD})"
    win = (
        f"array_min(transform(sequence(1, greatest(size(th) - 7, 0)), "
        f"i -> aggregate(slice(th, i, 8), cast(0 as bigint), "
        f"(a, b) -> (a * {_BASE} + b) % {_MOD})))"
    )
    return with_h.select(
        "doc_id",
        F.expr(fold).cast("bigint").alias("doc_fingerprint"),
        F.size("th").cast("int").alias("n_tokens"),
        F.expr(win).cast("bigint").alias("winnow_min"),
    ).orderBy("doc_id")


# --- BPE-ish token counting (north-star: whitespace + regex tokenizers) -----

_PIECE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"


@declared_query(
    "q_bpe_token_count",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{_PIECE_RE}')) AS INTEGER) AS bpe_pieces
FROM documents
ORDER BY doc_id
""",
    ops=("TXT-tokens", "TXT-bpe"),
    doc="Token counting two ways (north-star): whitespace tokens vs a "
    "BPE-ish piece regex (letter runs | digit runs | punctuation runs, "
    "the GPT-2 pre-tokenizer shape). The pattern is restricted to "
    "constructs Java regex (Spark) and RE2 (DuckDB) treat identically.",
)
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens()).cast("int").alias("ws_tokens"),
        F.regexp_count(F.lower("text"), F.lit(_PIECE_RE)).cast("int").alias("bpe_pieces"),
    ).orderBy("doc_id")


# --- TF-IDF (north-star text analysis) --------------------------------------

_TFIDF_ORACLE = """
WITH tf AS (
  SELECT doc_id, t AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t FROM documents)
  GROUP BY doc_id, t
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, term, tf,
       CAST(df AS INTEGER) AS df,
       CAST(tf * CAST(FLOOR(1000000 * ln((n_docs + 1.0) / (df + 1.0))) AS BIGINT) AS BIGINT) AS tfidf_micro
FROM tf JOIN df USING (term) CROSS JOIN n
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf_micro DESC, term) <= 3
ORDER BY doc_id, tfidf_micro DESC, term
"""


@declared_query(
    "q_tfidf_top_terms",
    oracle=_TFIDF_ORACLE,
    ops=("TXT-tfidf", "W1", "A2"),
    doc="TF-IDF top-3 terms per document (north-star text analysis): "
    "explode terms -> tf per (doc, term) -> document frequency -> idf -> "
    "rank per doc. idf is fixed to integer micro-units "
    "(floor(1e6*ln((N+1)/(df+1)))) so ranking and hashing are exact "
    "across engines. Two shuffles: (doc,term) and term — the standard "
    "scalable shape; the tiny df table broadcasts back.",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tf = (
        docs.select("doc_id", F.explode(tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf_micro = F.floor(
        F.lit(1_000_000) * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0))
    ).cast("bigint")
    scored = (
        tf.join(F.broadcast(df.withColumn("idf_micro", idf_micro)), "term")
        .select(
            "doc_id",
            "term",
            "tf",
            F.col("df").cast("int").alias("df"),
            (F.col("tf") * F.col("idf_micro")).cast("bigint").alias("tfidf_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_micro"), F.asc("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 3)
        .drop("_rn")
        .orderBy("doc_id", F.desc("tfidf_micro"), "term")
    )


_DECON_SHINGLE_SQL = (
    "list_distinct(list_transform(range(1, greatest(len(t) - 7, 0) + 1), "
    "i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4], t[i+5], t[i+6], t[i+7])))"
)


@declared_query(
    "q_decontamination",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
), train_sh AS (
  SELECT doc_id, unnest({_DECON_SHINGLE_SQL}) AS sh FROM toks WHERE doc_id % 100 <> 0
), eval_sh AS (
  SELECT doc_id AS eval_id, unnest({_DECON_SHINGLE_SQL}) AS sh FROM toks WHERE doc_id % 100 = 0
)
SELECT t.doc_id,
       CAST(COUNT(DISTINCT e.eval_id) AS BIGINT) AS n_eval_docs_hit,
       CAST(COUNT(DISTINCT t.sh) AS BIGINT) AS n_shared_shingles
FROM train_sh t JOIN eval_sh e USING (sh)
GROUP BY t.doc_id
ORDER BY t.doc_id
""",
    ops=("TXT-decontaminate", "J9", "A2"),
    doc="Benchmark decontamination — the held-out-overlap check every "
    "serious LLM training pipeline runs before a dataset ships: flag "
    "training documents sharing any 8-gram shingle with the eval set "
    "(here: doc_id %% 100 == 0 as the deterministic stand-in benchmark). "
    "Shape: explode distinct shingles on both sides, equi-join on the "
    "shingle, count distinct hit eval docs per training doc. Scale: the "
    "join shuffles on the shingle value — O(total shingles), never "
    "pairwise; the eval side is tiny and broadcasts. At 100 TB, hash "
    "shingles to 64-bit and bloom-filter the train side first (same "
    "plan, narrower shuffle).",
)
def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % 100 == 0
    train_sh = (
        docs.filter(~is_eval)
        .select("doc_id", F.explode(shingles("text", 8)).alias("sh"))
    )
    eval_sh = (
        docs.filter(is_eval)
        .select(F.col("doc_id").alias("eval_id"), F.explode(shingles("text", 8)).alias("sh"))
    )
    return (
        train_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("eval_id").alias("n_eval_docs_hit"),
            F.countDistinct("sh").alias("n_shared_shingles"),
        )
        .orderBy("doc_id")
    )


@declared_query(
    "q_repetition_filter",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
), grams AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                        i -> concat_ws(' ', t[i], t[i+1])) AS g2
  FROM toks
)
SELECT doc_id,
       CAST(len(g2) AS INTEGER) AS n_2grams,
       CAST(len(g2) - len(list_distinct(g2)) AS INTEGER) AS n_dup_2grams
FROM grams
WHERE len(g2) > 0
  AND CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2) >= 0.05
ORDER BY doc_id
""",
    ops=("TXT-repetition", "TXT-quality"),
    doc="Repetition-based quality filter (the Gopher/MassiveText "
    "duplicate-n-gram rule): flag documents whose duplicate-bigram "
    "fraction exceeds 5%% — boilerplate, keyword stuffing, and decode "
    "loops all trip it. Counts stay integer (ratio only in the "
    "predicate, computed identically in both engines) so the oracle "
    "hash is exact. Narrow per-row map, no shuffle — scales as a scan.",
)
def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    # bigrams keep duplicates — they ARE the signal; shingles() owns the
    # lambda-binding tokenize-once form (see its docstring)
    with_g2 = docs.select("doc_id", shingles("text", 2, distinct=False).alias("g2"))
    n2 = F.size("g2")
    nd2 = F.size(F.array_distinct("g2"))
    return (
        with_g2.filter((n2 > 0) & ((n2 - nd2).cast("double") / n2 >= 0.05))
        .select(
            "doc_id",
            n2.cast("int").alias("n_2grams"),
            (n2 - nd2).cast("int").alias("n_dup_2grams"),
        )
        .orderBy("doc_id")
    )


_DUCK_SH3 = (
    "list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1), "
    "i -> concat_ws(' ', t[i], t[i+1], t[i+2])))"
)


@declared_query(
    "q_boilerplate_shingles",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, {_DUCK_TOKS} AS t FROM documents
), sh AS (
  SELECT doc_id, source, unnest({_DUCK_SH3}) AS sh FROM toks
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), dfreq AS (
  SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh
), flagged AS (
  SELECT s.doc_id, s.source, s.sh, (d.df * 20 >= n.n_docs) AS is_boiler
  FROM sh s JOIN dfreq d USING (sh) CROSS JOIN n
), per_doc AS (
  SELECT doc_id, source,
         COUNT(*) AS n_sh,
         SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS n_boiler
  FROM flagged GROUP BY doc_id, source
)
SELECT source,
       COUNT(*) AS n_docs_with_shingles,
       CAST(SUM(CASE WHEN n_boiler * 2 >= n_sh THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged_docs,
       CAST(SUM(n_boiler) AS BIGINT) AS n_boiler_hits
FROM per_doc
GROUP BY source
ORDER BY source
""",
    ops=("TXT-boilerplate", "A2", "J1"),
    doc="Cross-document boilerplate detection (the C4 rule family): a "
    "3-token shingle is boilerplate when it appears in >=5%% of all "
    "documents (document frequency, not within-doc repetition — the "
    "complement of q_repetition_filter); a document is flagged when "
    ">=50%% of its distinct shingles are boilerplate.  Both thresholds "
    "are INTEGER comparisons (df*20 >= n_docs, n_boiler*2 >= n_sh) so "
    "the oracle hash is exact — no float ratio ever materializes.  "
    "Shape: explode distinct shingles, one shuffle to count df, join "
    "back on the shingle, per-doc then per-source aggregates.  This is "
    "the classic two-pass n-gram document-frequency job; at 100 TB hash "
    "the shingle to 64-bit first (narrower shuffle) and broadcast the "
    "boilerplate set if it fits (it usually does — df>=5%% shingles are "
    "few by Zipf).",
)
def q_boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.dedup import shingles

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    # per-doc shingle COUNT comes from the array size — only the
    # boilerplate MEMBERSHIP needs the exploded rows, and that join-back
    # is against the broadcast df>=5% set (few by Zipf), so the only
    # |shingles|-sized shuffle left is the document-frequency count
    # (the r2 shape shuffled all exploded shingles a second time to
    # join df back onto them)
    base = docs.select("doc_id", "source", shingles("text", 3).alias("sh_arr"))
    sh = base.select("doc_id", F.explode("sh_arr").alias("sh"))
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    boiler = (
        dfreq.crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") * 20 >= F.col("n_docs"))
        .select("sh")
    )
    hits = sh.join(F.broadcast(boiler), "sh").groupBy("doc_id").agg(
        F.count("*").alias("n_boiler")
    )
    per_doc = (
        base.filter(F.size("sh_arr") > 0)
        .join(hits, "doc_id", "left")
        .select(
            "source",
            F.size("sh_arr").alias("n_sh"),
            F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs_with_shingles"),
            F.sum(F.when(F.col("n_boiler") * 2 >= F.col("n_sh"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_flagged_docs"),
            F.sum("n_boiler").cast("bigint").alias("n_boiler_hits"),
        )
        .orderBy("source")
    )


@declared_query(
    "q_bpe_merge_candidates",
    oracle=f"""
WITH words AS (
  SELECT unnest({_DUCK_TOKS}) AS w FROM documents
), pairs AS (
  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair
  FROM words, unnest(range(1, greatest(length(w) - 1, 0) + 1)) AS t(i)
  WHERE length(w) >= 2
)
SELECT pair, COUNT(*) AS n_occurrences
FROM pairs
GROUP BY pair
ORDER BY n_occurrences DESC, pair
LIMIT 20
""",
    ops=("TXT-bpe-train", "A2"),
    doc="BPE merge-candidate scoring — the inner statistic of tokenizer "
    "TRAINING (q_bpe_token_count applies a fixed vocab; this ranks what "
    "the next merge WOULD be): count every adjacent character pair "
    "inside every word occurrence across the corpus, rank by frequency. "
    "One explode per word position (sequence+substring in codegen) + "
    "one grouped count with map-side partial aggregation; at 100 TB "
    "this is a single shuffle on the pair key — the iterative BPE loop "
    "re-runs it on the merged corpus, exactly how distributed tokenizer "
    "training jobs are built.  Top-20 with count-then-pair tie-break "
    "keeps the output deterministic for the hash oracle.",
)
def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.explode(tokens()).alias("w")).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(20)
    )


# Multi-policy dedup dashboard: each policy's DROP set (doc ids removed)
# computed over the SAME corpus, plus the union — the report a curation
# team uses to choose/defend its dedup policy mix.  The oracle composes
# the already-verified per-policy CTE chains (exact fingerprint groups,
# capped MinHash-LSH pairs, source-blocked SimHash pairs).
_MULTI_POLICY_ORACLE = f"""
WITH drops_exact AS (
  SELECT doc_id FROM (
    SELECT doc_id, ROW_NUMBER() OVER (
      PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
      ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn > 1
), sigs AS (
  SELECT doc_id, text,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('0|' || t)), 'min') AS sig0,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('1|' || t)), 'min') AS sig1,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('2|' || t)), 'min') AS sig2,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('3|' || t)), 'min') AS sig3
  FROM documents
), bands AS (
  SELECT doc_id, text, band_id, band_key FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY band_id, band_key ORDER BY doc_id) AS bn
    FROM (
      SELECT doc_id, text, 0 AS band_id, md5(sig0 || '|' || sig1) AS band_key FROM sigs
      UNION ALL
      SELECT doc_id, text, 1 AS band_id, md5(sig2 || '|' || sig3) AS band_key FROM sigs
    )
  ) WHERE bn <= {_CAP}
), drops_minhash AS (
  SELECT DISTINCT id_b AS doc_id FROM (
    SELECT l.doc_id AS id_a, r.doc_id AS id_b,
           list_distinct(regexp_split_to_array(trim(l.text), '\\s+')) AS ta,
           list_distinct(regexp_split_to_array(trim(r.text), '\\s+')) AS tb
    FROM bands l JOIN bands r
      ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
  )
  WHERE CAST(CAST(len(list_intersect(ta, tb)) AS DECIMAL(18,4))
             / greatest(len(ta) + len(tb) - len(list_intersect(ta, tb)), 1)
             AS DECIMAL(18,6)) >= 0.80
), sh AS (
  SELECT doc_id, source, CAST({_DUCK_SIMHASH_FROM_TH} AS INTEGER) AS simhash
  FROM (SELECT doc_id, source, {_DUCK_TH} AS th FROM documents)
), drops_simhash AS (
  SELECT DISTINCT r.doc_id FROM sh l JOIN sh r
    ON l.source = r.source AND l.doc_id < r.doc_id
  WHERE bit_count(xor(l.simhash, r.simhash)) <= 2
)
SELECT method, n_drops FROM (
  SELECT 'exact' AS method, COUNT(*) AS n_drops FROM drops_exact
  UNION ALL SELECT 'minhash_lsh', COUNT(*) FROM drops_minhash
  UNION ALL SELECT 'simhash', COUNT(*) FROM drops_simhash
  UNION ALL SELECT 'any_policy', COUNT(*) FROM (
    SELECT doc_id FROM drops_exact
    UNION SELECT doc_id FROM drops_minhash
    UNION SELECT doc_id FROM drops_simhash
  )
)
ORDER BY method
"""


@declared_query(
    "q_dedup_multi_policy",
    oracle=_MULTI_POLICY_ORACLE,
    ops=("TXT-dedup-exact", "TXT-minhash-lsh", "TXT-simhash", "U1"),
    doc="Dedup policy dashboard: the drop set of each policy over the "
    "same corpus — exact fingerprints, capped MinHash-LSH (Jaccard "
    ">=0.8), source-blocked SimHash (hamming<=2) — plus their distinct "
    "union ('any_policy').  Exactly the report a curation team reads to "
    "pick a policy mix: overlap between methods shows redundancy, the "
    "union row the combined removal rate.  Each policy is the "
    "already-verified operator (one shuffle each: fingerprint / band "
    "key / block key) and the union is a distinct over ids — no "
    "cross-policy join, so the dashboard costs the sum of its parts.",
)
def q_dedup_multi_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.dedup import lsh_bucket_drops

    docs = load_table(spark, sf_dir, "documents")

    w = Window.partitionBy(fingerprint("text")).orderBy("doc_id")
    drops_exact = (
        docs.select("doc_id", F.row_number().over(w).alias("_rn"))
        .filter(F.col("_rn") > 1)
        .select("doc_id")
    )

    with_toks = docs.select(
        "doc_id", F.array_distinct(tokens()).alias("toks")
    )
    drops_minhash = (
        lsh_bucket_drops(
            with_toks, "doc_id", n_hashes=4, rows_per_band=2, max_bucket=32,
            tokens_col="toks", min_jaccard=0.80,
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )

    sh = docs.withColumn("_th", token_hashes("text")).select(
        "doc_id", "source", simhash16_from_hashes("_th").alias("simhash")
    )
    # band-blocked pair generation (lossless for hamming<=2, see
    # simhash_band_pairs) with source as an extra equi-key — the oracle
    # replays the naive within-source all-pairs form, proving it
    drops_simhash = (
        simhash_band_pairs(sh, block_cols=("source",))
        .filter(hamming16("sh_a", "sh_b") <= 2)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )

    # Tag each policy's drop set and aggregate ONCE: rollup('method')
    # yields the per-method rows plus the grand-total row, and
    # countDistinct gives per-method drop counts (ids are unique within
    # a policy) AND the distinct-union count on the total row — so each
    # policy subtree appears exactly once in the plan instead of twice
    # (own count + union), halving the exchange count.
    tagged = (
        drops_exact.select("doc_id", F.lit("exact").alias("method"))
        .unionByName(drops_minhash.select("doc_id", F.lit("minhash_lsh").alias("method")))
        .unionByName(drops_simhash.select("doc_id", F.lit("simhash").alias("method")))
    )
    rolled = (
        tagged.rollup("method")
        .agg(F.countDistinct("doc_id").alias("n_drops"))
        .select(F.coalesce("method", F.lit("any_policy")).alias("method"), "n_drops")
    )
    # a policy with zero drops has no tagged rows — the report must still
    # carry its 0 row, so join the method spine back (4-row broadcast)
    spine = spark.createDataFrame(
        [("any_policy",), ("exact",), ("minhash_lsh",), ("simhash",)], "method string"
    )
    counts = spine.join(rolled, "method", "left").select(
        "method", F.coalesce("n_drops", F.lit(0)).cast("bigint").alias("n_drops")
    )
    return counts.orderBy("method")


def _ingest_index_path(spark, sf_dir: str) -> str:
    """Build-once stored dedup-ingest index over the corpus slice
    (doc_id %% 10 != 0), cached like the stored ANN indexes: keyed on the
    source file fingerprint, staged + renamed so concurrent queries never
    read a half-written index."""
    import hashlib as _hashlib
    import os
    import tempfile

    from politician_etl_project_spark.operators.ingest import DedupIngestTable

    src = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(src)
        fp = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        fp = "unknown"
    # v2: the store layout changed in r11 (one file per partition dir +
    # prefix manifest) — new key so cached v1 stores rebuild
    key = _hashlib.md5(f"{sf_dir}|ingest-v2|{fp}".encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_ingest_{key}")

    def _build(staging: str) -> None:
        corpus = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 != 0)
        DedupIngestTable(spark, staging).initialize(corpus.select("doc_id", "text"))

    from politician_etl_project_spark.catalog import ensure_built_dir

    return ensure_built_dir(path, _build)


_INGEST_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
), batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
), batch_kept AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text, ROW_NUMBER() OVER (
      PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
      ORDER BY doc_id) AS rn
    FROM batch
  ) WHERE rn = 1
), corpus_fps AS (
  SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp FROM corpus
), no_exact AS (
  SELECT doc_id, text FROM batch_kept
  WHERE md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) NOT IN (SELECT fp FROM corpus_fps)
), bsig AS (
  SELECT doc_id, {_DUCK_DTOKS} AS toks,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('0|' || t)), 'min') AS sig0,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('1|' || t)), 'min') AS sig1,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('2|' || t)), 'min') AS sig2,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('3|' || t)), 'min') AS sig3
  FROM no_exact
), csig AS (
  SELECT doc_id, {_DUCK_DTOKS} AS toks,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('0|' || t)), 'min') AS sig0,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('1|' || t)), 'min') AS sig1,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('2|' || t)), 'min') AS sig2,
         list_aggregate(list_transform({_DUCK_DTOKS}, t -> md5('3|' || t)), 'min') AS sig3
  FROM corpus
), bbands AS (
  SELECT doc_id, toks, 0 AS band_id, md5(sig0 || '|' || sig1) AS band_key FROM bsig
  UNION ALL SELECT doc_id, toks, 1, md5(sig2 || '|' || sig3) FROM bsig
), bband_capped AS (
  -- same in-batch skew cap as the batch rebuild (max_bucket = 32)
  SELECT doc_id, toks, band_id, band_key FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY band_id, band_key ORDER BY doc_id) AS bn
    FROM bbands
  ) WHERE bn <= 32
), batch_near AS (
  SELECT DISTINCT r.doc_id
  FROM bband_capped l JOIN bband_capped r
    ON l.band_id = r.band_id AND l.band_key = r.band_key AND l.doc_id < r.doc_id
  WHERE CAST(CAST(len(list_intersect(l.toks, r.toks)) AS DECIMAL(18,4))
             / greatest(len(l.toks) + len(r.toks) - len(list_intersect(l.toks, r.toks)), 1)
             AS DECIMAL(18,6)) >= 0.80
), batch_clean AS (
  SELECT doc_id FROM bsig WHERE doc_id NOT IN (SELECT doc_id FROM batch_near)
), cbands AS (
  SELECT doc_id, toks, 0 AS band_id, md5(sig0 || '|' || sig1) AS band_key FROM csig
  UNION ALL SELECT doc_id, toks, 1, md5(sig2 || '|' || sig3) FROM csig
), near AS (
  SELECT DISTINCT b.doc_id
  FROM bbands b JOIN cbands c ON b.band_id = c.band_id AND b.band_key = c.band_key
  WHERE b.doc_id IN (SELECT doc_id FROM batch_clean)
    AND CAST(CAST(len(list_intersect(b.toks, c.toks)) AS DECIMAL(18,4))
             / greatest(len(b.toks) + len(c.toks) - len(list_intersect(b.toks, c.toks)), 1)
             AS DECIMAL(18,6)) >= 0.80
)
SELECT stage, n FROM (
  SELECT 'n_in' AS stage, COUNT(*) AS n FROM batch
  UNION ALL SELECT 'n_batch_dup', (SELECT COUNT(*) FROM batch) - COUNT(*) FROM batch_kept
  UNION ALL SELECT 'n_exact_dup', (SELECT COUNT(*) FROM batch_kept) - COUNT(*) FROM no_exact
  UNION ALL SELECT 'n_batch_near_dup', COUNT(*) FROM batch_near
  UNION ALL SELECT 'n_near_dup', COUNT(*) FROM near
  UNION ALL SELECT 'n_ingested', (SELECT COUNT(*) FROM batch_clean) - COUNT(*) FROM near
)
ORDER BY stage
"""


@declared_query(
    "q_dedup_incremental",
    oracle=_INGEST_ORACLE,
    ops=("TXT-dedup-exact", "TXT-minhash-lsh", "T5", "S13"),
    doc="Incremental dedup-on-ingest, driver-verified end to end: the "
    "corpus slice (doc_id %% 10 != 0) is a STORED index (fingerprint + "
    "LSH-band parquet, partition-pruned probes — operators/ingest."
    "DedupIngestTable, built once and cached like the stored ANN "
    "indexes) and the held-out slice arrives as a new batch.  The "
    "report counts within-batch exact dups, exact dups vs the store, "
    "within-batch NEAR dups (capped LSH + Jaccard — without this stage "
    "two near-dups arriving together would both ingest), band-join "
    "near-dups vs the store (Jaccard >= 0.8), and survivors — the "
    "oracle replays every probe in SQL against the same slices.  dry_run "
    "keeps the query pure (no index mutation), so reruns are "
    "idempotent.  This is the production ingestion shape: each batch "
    "reads O(batch) index partitions, never the corpus.",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.ingest import DedupIngestTable

    index = DedupIngestTable(spark, _ingest_index_path(spark, sf_dir))
    batch = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )
    rep = index.ingest(batch, dry_run=True)
    rows = [
        ("n_in", rep.n_in),
        ("n_batch_dup", rep.n_batch_dup),
        ("n_exact_dup", rep.n_exact_dup),
        ("n_batch_near_dup", rep.n_batch_near_dup),
        ("n_near_dup", rep.n_near_dup),
        ("n_ingested", rep.n_ingested),
    ]
    vals = ", ".join(f"('{s}', CAST({n} AS BIGINT))" for s, n in rows)
    return spark.sql(f"SELECT stage, n FROM VALUES {vals} AS t(stage, n) ORDER BY stage")


@declared_query(
    "q_lm_quality_score",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
), vocab AS (
  SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
), tot AS (
  SELECT SUM(cnt) AS t FROM vocab
), scored AS (
  SELECT tok.doc_id,
         CAST(FLOOR(1000000 * ln(CAST(v.cnt AS DOUBLE) / CAST(tt.t AS DOUBLE))) AS BIGINT) AS lp
  FROM tok JOIN vocab v USING (token), tot tt
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(lp) AS BIGINT) AS sum_logp_micro,
       CAST(FLOOR(CAST(SUM(lp) AS DOUBLE) / COUNT(*)) AS BIGINT) AS avg_logp_micro
FROM scored
GROUP BY doc_id
ORDER BY avg_logp_micro DESC, doc_id
LIMIT 50
""",
    ops=("TXT-lm-quality", "A2", "J7"),
    doc="Unigram language-model quality score — the KenLM-style "
    "perplexity filter of pretraining pipelines, exact: the corpus "
    "unigram model (token count / total) trains in one aggregate, each "
    "token's log-prob is fixed-pointed to micro-units "
    "(floor(1e6*ln(p)), the tfidf idiom) so per-doc sums are "
    "order-independent BIGINTs, and the top-50 most-typical docs rank "
    "by floor(sum/n) — floor of one double division, identical on "
    "both engines (integer DIV would disagree on negative log-probs: "
    "Spark truncates toward zero, DuckDB floors).  Scale: vocab is a "
    "small frame joined back by broadcast; two aggregates + one map — "
    "at 100 TB the model trains on a sample and the scoring pass is "
    "narrow.",
)
def q_lm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
    vocab = tok.groupBy("token").agg(F.count("*").alias("cnt")).localCheckpoint(eager=False)
    tot = vocab.agg(F.sum("cnt").alias("t"))
    scored = (
        tok.join(F.broadcast(vocab), "token")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.floor(
                F.lit(1_000_000)
                * F.log(F.col("cnt").cast("double") / F.col("t").cast("double"))
            )
            .cast("bigint")
            .alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("lp").cast("bigint").alias("sum_logp_micro"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_logp_micro",
            F.floor(F.col("sum_logp_micro").cast("double") / F.col("n_tokens"))
            .cast("bigint")
            .alias("avg_logp_micro"),
        )
        .orderBy(F.desc("avg_logp_micro"), "doc_id")
        .limit(50)
    )


@declared_query(
    "q_simhash_banded",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, CAST({_DUCK_SIMHASH_FROM_TH} AS INTEGER) AS simhash
  FROM (SELECT doc_id, {_DUCK_TH} AS th FROM documents WHERE doc_id < 300)
)
SELECT l.doc_id AS id_a, r.doc_id AS id_b,
       CAST(bit_count(xor(l.simhash, r.simhash)) AS INTEGER) AS hamming
FROM sh l JOIN sh r ON l.doc_id < r.doc_id
WHERE bit_count(xor(l.simhash, r.simhash)) <= 2
ORDER BY id_a, id_b
""",
    ops=("TXT-simhash", "J9", "TXT-banding"),
    doc="Band-blocked SimHash near-dup pairs, corpus-GLOBAL (no source "
    "blocking): the 16-bit sketch splits into 3 bands (6/5/5 bits); by "
    "pigeonhole any pair within hamming<=2 flips bits in at most 2 "
    "bands, so it MUST agree exactly on at least one band — candidates "
    "are the per-band equi-join union, verified by bit_count(xor).  "
    "Banding is therefore a LOSSLESS optimization (exact recall), "
    "which the oracle PROVES by computing the naive all-pairs form and "
    "hash-matching it.  Scale: three shuffles on tiny band keys "
    "replace the quadratic cross-source join; near-dup corpora "
    "concentrate band values far more than the random fixture does, "
    "so bucket sizes shrink exactly where it matters.",
)
def q_simhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    sh = docs.withColumn("_th", token_hashes("text")).select(
        "doc_id", simhash16_from_hashes("_th").alias("simhash")
    )
    return (
        simhash_band_pairs(sh)
        .withColumn("hamming", hamming16("sh_a", "sh_b"))
        .filter(F.col("hamming") <= 2)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


# THE count-min bucket formula, parameterized on the hashed column —
# single definition shared by q_countmin_sketch (token), the event-
# stream twin (queries/events.py, event_type) and the streaming
# maintenance path (streaming/pipelines._event_cms), so the sketch a
# stream maintains can never silently drift from the batch/oracle
# formula ({d} = row index, left for per-depth .format).
CMS_SPARK_BUCKET_FMT = (
    "cast(conv(substring(md5(concat(cast({d} as string), '|', {col})), 1, 8), 16, 10)"
    " as bigint) % {width}"
)
CMS_DUCK_BUCKET_FMT = (
    "CAST('0x' || substr(md5(CAST({d} AS VARCHAR) || '|' || {col}), 1, 8) AS BIGINT) % {width}"
)
_CMS_SPARK_BUCKET = CMS_SPARK_BUCKET_FMT.replace("{col}", "token").replace("{width}", "64")
_CMS_DUCK_BUCKET = CMS_DUCK_BUCKET_FMT.replace("{col}", "token").replace("{width}", "64")


@declared_query(
    "q_countmin_sketch",
    oracle=f"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
), cms AS (
  SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT dd.d,
           CASE dd.d WHEN 0 THEN {_CMS_DUCK_BUCKET.format(d=0)}
                     WHEN 1 THEN {_CMS_DUCK_BUCKET.format(d=1)}
                     ELSE {_CMS_DUCK_BUCKET.format(d=2)} END AS bucket
    FROM tok CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS d) dd
  ) GROUP BY d, bucket
), exact AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM tok GROUP BY token
  ORDER BY exact_cnt DESC, token LIMIT 10
)
SELECT e.token, e.exact_cnt,
       CAST(least(c0.c, c1.c, c2.c) AS BIGINT) AS cms_est
FROM exact e
JOIN cms c0 ON c0.d = 0 AND c0.bucket = {_CMS_DUCK_BUCKET.format(d=0)}
JOIN cms c1 ON c1.d = 1 AND c1.bucket = {_CMS_DUCK_BUCKET.format(d=1)}
JOIN cms c2 ON c2.d = 2 AND c2.bucket = {_CMS_DUCK_BUCKET.format(d=2)}
ORDER BY e.exact_cnt DESC, e.token
""",
    ops=("TXT-countmin", "A2", "DQ-sketch"),
    doc="Count-min sketch over the corpus token stream: depth 3 x width "
    "64 integer counters keyed by md5-derived hashes — a mergeable "
    "heavy-hitter estimator (per-shard sketches ADD, the same "
    "incremental contract as the HLL/moments sketches) whose estimate "
    "min(row counters) >= exact count always.  The report joins the "
    "estimate against the exact top-10 so the overcount bias is "
    "visible.  Every counter is an exact BIGINT, so unlike sampled "
    "heavy-hitter estimators the whole sketch is hash-verifiable.  "
    "Scale: the sketch is depth x width = 192 cells regardless of "
    "corpus size — the aggregate shuffles 192 rows.",
)
def q_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
    cms_rows = None
    for depth in (0, 1, 2):
        rows = tok.select(
            F.lit(depth).alias("d"),
            F.expr(_CMS_SPARK_BUCKET.format(d=depth)).alias("bucket"),
        )
        cms_rows = rows if cms_rows is None else cms_rows.unionByName(rows)
    cms = (
        cms_rows.groupBy("d", "bucket")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    exact = (
        tok.groupBy("token")
        .agg(F.count("*").cast("bigint").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "token")
        .limit(10)
    )
    out = exact
    for depth in (0, 1, 2):
        lut = cms.filter(F.col("d") == depth).select(
            F.col("bucket").alias(f"bk{depth}"), F.col("c").alias(f"c{depth}")
        )
        out = out.withColumn(
            f"bk{depth}", F.expr(_CMS_SPARK_BUCKET.format(d=depth))
        ).join(F.broadcast(lut), f"bk{depth}")
    return out.select(
        "token",
        "exact_cnt",
        F.least("c0", "c1", "c2").cast("bigint").alias("cms_est"),
    ).orderBy(F.desc("exact_cnt"), "token")


# --- iterative BPE merge TRAINING (3 exact rounds) --------------------------

# One BPE round as DuckDB CTE fragments: pairs over the current word
# table {w}, the argmax pair {t}, and the merged word table {w_next}.
# w{n} uses LEFT JOIN ON TRUE (not a comma cross join) so an EXHAUSTED
# round — t{r} empty because no word has two symbols left — passes the
# word table through unchanged, matching _bpe_train's early break
# instead of collapsing everything downstream to zero rows (review
# finding r4).
_BPE_ROUND_SQL = """p{r} AS (
  SELECT sy[i] || ' ' || sy[i + 1] AS pair, SUM(wc) AS cnt
  FROM (SELECT str_split(trim(s, '<>'), '><') AS sy, wc FROM {w})
     , unnest(range(1, len(sy))) AS t(i)
  WHERE len(sy) >= 2
  GROUP BY 1
), t{r} AS (
  SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair LIMIT 1
), w{n} AS (
  SELECT CASE WHEN t{r}.pair IS NULL THEN s
              ELSE replace(s,
                 '<' || split_part(t{r}.pair, ' ', 1) || '><' || split_part(t{r}.pair, ' ', 2) || '>',
                 '<' || replace(t{r}.pair, ' ', '') || '>') END AS s,
         wc
  FROM {w} LEFT JOIN t{r} ON TRUE
)"""

_BPE_TRAIN_ORACLE = (
    """WITH w0 AS (
  SELECT regexp_replace(w, '(.)', '<\\1>', 'g') AS s, CAST(COUNT(*) AS BIGINT) AS wc
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents)
  WHERE length(w) >= 2
  GROUP BY 1
), """
    + ", ".join(
        _BPE_ROUND_SQL.format(r=r, n=r + 1, w=f"w{r}") for r in range(3)
    )
    + """
SELECT merge_round, sym_a, sym_b, merged, n_occurrences FROM (
  SELECT 0 AS merge_round, split_part(pair, ' ', 1) AS sym_a,
         split_part(pair, ' ', 2) AS sym_b, replace(pair, ' ', '') AS merged,
         CAST(cnt AS BIGINT) AS n_occurrences FROM t0
  UNION ALL
  SELECT 1, split_part(pair, ' ', 1), split_part(pair, ' ', 2),
         replace(pair, ' ', ''), CAST(cnt AS BIGINT) FROM t1
  UNION ALL
  SELECT 2, split_part(pair, ' ', 1), split_part(pair, ' ', 2),
         replace(pair, ' ', ''), CAST(cnt AS BIGINT) FROM t2
)
ORDER BY merge_round
"""
)


@declared_query(
    "q_bpe_train_merges",
    oracle=_BPE_TRAIN_ORACLE,
    ops=("TXT-bpe-train", "A2", "GRAPH-iterative"),
    doc="Iterative BPE tokenizer TRAINING, three exact merge rounds — the "
    "full loop q_bpe_merge_candidates only scores once: each round "
    "counts every adjacent symbol pair across the (weighted) word "
    "table, merges the argmax pair corpus-wide, and repeats on the "
    "merged representation.  Words are '<sym><sym>...' wrapped strings, "
    "so the merge is a plain string replace (leftmost non-overlapping — "
    "identical Java/DuckDB semantics) and pair extraction is "
    "split + transform in codegen; no Python touches row data.  The "
    "DuckDB oracle unrolls the identical three rounds in chained CTEs, "
    "so the merge table (round, pair, count) is hash-exact — ties "
    "break count-desc-then-pair-asc on both engines.  Scale: each "
    "round is one explode + one pair-key shuffle over DISTINCT words "
    "(Zipf-bounded, millions of rows at any corpus size — not corpus "
    "rows), the merged table is a narrow map, and only the single "
    "argmax row ever reaches the driver; this is exactly how "
    "distributed tokenizer-training jobs (e.g. Spark-based BPE "
    "pipelines) are structured.",
)
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows, _final = _bpe_train(spark, sf_dir, rounds=3)
    return spark.createDataFrame(
        rows, "merge_round int, sym_a string, sym_b string, merged string, n_occurrences bigint"
    ).orderBy("merge_round")


def _bpe_train(spark: SparkSession, sf_dir: str, rounds: int = 3):
    """Shared BPE training loop (see q_bpe_train_merges for the contract):
    returns ``(merge_rows, final_word_table)`` where merge_rows is the
    list of (round, sym_a, sym_b, merged, count) and final_word_table is
    the '<sym>'-wrapped word table after applying every merge."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).alias("w")
        )
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("wc"))
        .select(F.regexp_replace("w", "(.)", "<$1>").alias("s"), "wc")
        .localCheckpoint(eager=False)  # word table reused across rounds
    )

    def _top_pair(cur: DataFrame):
        c = cur.select(
            F.split(F.expr("trim(BOTH '<>' FROM s)"), "><").alias("sy"), "wc"
        ).filter(F.size("sy") >= 2)
        pairs = (
            c.select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(sy) - 1), "
                        "i -> concat(element_at(sy, i), ' ', element_at(sy, i + 1)))"
                    )
                ).alias("pair"),
                "wc",
            )
            .groupBy("pair")
            .agg(F.sum("wc").cast("bigint").alias("cnt"))
        )
        return pairs.orderBy(F.desc("cnt"), F.asc("pair")).limit(1).collect()

    rows = []
    cur = words
    for rnd in range(rounds):
        hit = _top_pair(cur)  # O(1) driver transfer: the argmax row only
        if not hit:  # empty corpus / fully merged: no pair left to merge
            break
        top = hit[0]
        a, b = top["pair"].split(" ")
        rows.append((rnd, a, b, a + b, top["cnt"]))
        cur = cur.select(
            F.expr(f"replace(s, '<{a}><{b}>', '<{a + b}>')").alias("s"), "wc"
        ).localCheckpoint(eager=False)
    return rows, cur


@declared_query(
    "q_bpe_vocab_stats",
    oracle=(
        """WITH w0 AS (
  SELECT regexp_replace(w, '(.)', '<\\1>', 'g') AS s, CAST(COUNT(*) AS BIGINT) AS wc
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents)
  WHERE length(w) >= 2
  GROUP BY 1
), """
        + ", ".join(_BPE_ROUND_SQL.format(r=r, n=r + 1, w=f"w{r}") for r in range(3))
        + """
SELECT sym, CAST(SUM(wc) AS BIGINT) AS n_occurrences
FROM (SELECT unnest(str_split(trim(s, '<>'), '><')) AS sym, wc FROM w3)
GROUP BY sym
ORDER BY n_occurrences DESC, sym
LIMIT 15
"""
    ),
    ops=("TXT-bpe-train", "TXT-tokens", "A2"),
    doc="BPE vocabulary application — the top-15 symbols (by weighted "
    "occurrence) of the corpus AFTER the three learned merges are "
    "applied, closing the train->apply loop that q_bpe_train_merges "
    "opens: training picks the merges, this query tokenizes the corpus "
    "with them and reports the resulting symbol distribution (the "
    "statistic a tokenizer-training job monitors for vocabulary "
    "convergence).  The oracle re-derives the SAME three merges in "
    "chained CTEs and unnests the merged word table, so the symbol "
    "table is hash-exact.  Scale: symbol explosion is one shuffle over "
    "distinct words; merges apply as narrow string maps.",
)
def q_bpe_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _rows, final = _bpe_train(spark, sf_dir, rounds=3)
    syms = final.select(
        F.explode(F.split(F.expr("trim(BOTH '<>' FROM s)"), "><")).alias("sym"), "wc"
    )
    return (
        syms.groupBy("sym")
        .agg(F.sum("wc").cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("sym"))
        .limit(15)
    )


@declared_query(
    "q_segment_dedup",
    oracle="""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
), segs AS (
  SELECT doc_id,
         CAST(i AS INTEGER) AS seg_idx,
         array_to_string(w[CAST(i*3+1 AS BIGINT):CAST(i*3+3 AS BIGINT)], ' ') AS seg
  FROM toks, unnest(range(CAST(ceil(len(w) / 3.0) AS BIGINT))) AS t(i)
), ranked AS (
  SELECT doc_id, seg_idx, seg,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
  FROM segs
), kept AS (
  SELECT doc_id, seg_idx, seg FROM ranked WHERE rn = 1
), totals AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs FROM segs GROUP BY doc_id
), kd AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(seg, ' ' ORDER BY seg_idx) AS kept_text
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, t.n_segs, COALESCE(k.n_kept, CAST(0 AS BIGINT)) AS n_kept, k.kept_text
FROM totals t LEFT JOIN kd k USING (doc_id)
ORDER BY t.doc_id
""",
    ops=("DEDUP-segment", "A14", "U2"),
    doc="Corpus-level exact segment (line/paragraph) dedup — the C4/CCNet "
    "stage missing from the dedup family: 3-token segments, keep-first "
    "corpus-wide, docs reassembled from survivors.  Spark's winner per "
    "segment is min(struct(doc_id, seg_idx)) under a plain groupBy — "
    "map-side combine collapses boilerplate-hot segments BEFORE the "
    "exchange, where the oracle's row_number window (fine at oracle "
    "scale) would sort a 100 TB hot key on one task.  DIGEST-KEYED "
    "since r11 (the operator default): the winner exchange carries a "
    "16-byte MD5 + ids instead of segment text — the builder's own "
    "sf0.5 sweep caught the direct form's winner exchange growing "
    "4.17x on raw text, the fattest shuffle in the engine — and "
    "survivor text is re-derived row-locally by re-slicing each doc's "
    "own token array at the surviving indices.  operators/"
    "dedup.segment_dedup.",
)
def q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.dedup import segment_dedup

    docs = load_table(spark, sf_dir, "documents")
    return segment_dedup(docs, "doc_id", "text", seg_tokens=3).orderBy("doc_id")


_SEGMENT_DEDUP_ORACLE = REGISTRY["q_segment_dedup"].oracle


@declared_query(
    "q_segment_dedup_direct",
    oracle=_SEGMENT_DEDUP_ORACLE,
    ops=("DEDUP-segment", "A14", "U2"),
    doc="q_segment_dedup's STRING-KEYED twin (segment_dedup(key="
    "'direct'), the pre-r11 default): the raw segment text is the "
    "winner groupBy key — one fewer projection, fine at short segment "
    "width on a small corpus, but its winner exchange is output-bound "
    "on segment text at scale (4.17x growth on the sweep's 5x step, "
    "SCALE.md), which is why the digest form is now the default.  "
    "Shares q_segment_dedup's oracle verbatim — a green hash on BOTH "
    "twins IS the proof the digest path loses nothing vs the direct "
    "form.",
)
def q_segment_dedup_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.dedup import segment_dedup

    docs = load_table(spark, sf_dir, "documents")
    return segment_dedup(docs, "doc_id", "text", seg_tokens=3, key="direct").orderBy(
        "doc_id"
    )


@declared_query(
    "q_segment_dedup_digest",
    oracle=_SEGMENT_DEDUP_ORACLE,
    ops=("DEDUP-segment", "A14", "U2"),
    doc="The digest-keyed segment dedup under its HISTORICAL NAME "
    "(driver-checked r6, benched every round since): when r11 made "
    "the digest plan q_segment_dedup's default, this name kept its "
    "exact pre-r11 computation and plan (segment_dedup(key='digest')) "
    "— bench/oracle entries are never removed or renamed, so the "
    "round-over-round per-query delta baseline stays unbroken.  Same "
    "shared oracle as both twins; its plan is now identical to "
    "q_segment_dedup's.",
)
def q_segment_dedup_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from politician_etl_project_spark.operators.dedup import segment_dedup

    docs = load_table(spark, sf_dir, "documents")
    return segment_dedup(docs, "doc_id", "text", seg_tokens=3, key="digest").orderBy(
        "doc_id"
    )
