"""Cross-validation of the expression-based MinHash-LSH near-dup pipeline
against (a) exact all-pairs ground truth and (b) spark.ml's MinHashLSH +
approxSimilarityJoin — the stock library alternative (SURVEY §7 phase 7).

Both pipelines block with minhash bands and verify candidates with exact
Jaccard, so every emitted pair must be a true >=0.8 pair (soundness); the
band stage only affects recall.  The corpus is deterministic, so observed
recall is pinned with a margin.

Why we keep the expression pipeline as the engine default instead of
spark.ml: the signatures are pure codegen'd SQL (md5/array ops — no
Python, no mllib vector conversion), the oracle can replay them in DuckDB
for hash-exact verification, and the band/bucket layout (plus the
max_bucket skew cap) is explicit rather than hidden in approxSimilarityJoin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from politician_etl_project_spark.catalog import load_table
from politician_etl_project_spark.operators.dedup import jaccard, tokens
from politician_etl_project_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"
THRESH = 0.80


@pytest.fixture(scope="module")
def truth(spark):
    """Exact all-pairs unigram-Jaccard >= 0.8 over the 500-doc corpus —
    O(n^2) is fine at this scale and only here; both pipelines under test
    avoid it by construction."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.array_distinct(tokens()).alias("toks")
    )
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("toks_a"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("toks_b"))
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", jaccard("toks_a", "toks_b").alias("j"))
        .filter(F.col("j") >= THRESH)
    )
    return {(r.id_a, r.id_b) for r in pairs.collect()}


def test_expression_lsh_sound_and_recalls(spark, truth):
    ours = {
        (r.id_a, r.id_b)
        for r in load_all()["q_near_dup_pairs"].fn(spark, SF_DIR).collect()
    }
    assert ours <= truth, f"unsound pairs: {sorted(ours - truth)[:5]}"
    assert len(truth) > 0
    recall = len(ours) / len(truth)
    # deterministic corpus: 2 bands of 2 hashes catch the bulk of >=0.8 pairs
    assert recall >= 0.60, f"recall {recall:.3f}"


def test_sparkml_minhash_agrees(spark, truth):
    """spark.ml MinHashLSH over binary token vectors: approxSimilarityJoin
    post-filters on exact Jaccard distance, so its output is also a sound
    subset of the truth; recall depends on its random hash family (pinned
    seed)."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.array_distinct(tokens()).alias("toks")
    )
    cv = CountVectorizer(inputCol="toks", outputCol="vec", binary=True).fit(docs)
    vecs = cv.transform(docs).select("doc_id", "vec")
    lsh = MinHashLSH(inputCol="vec", outputCol="hashes", numHashTables=4, seed=42).fit(vecs)
    joined = lsh.approxSimilarityJoin(vecs, vecs, 1.0 - THRESH + 1e-9, distCol="dist")
    ml_pairs = {
        (r.a, r.b)
        for r in joined.select(
            F.col("datasetA.doc_id").alias("a"), F.col("datasetB.doc_id").alias("b")
        )
        .filter(F.col("a") < F.col("b"))
        .collect()
    }
    assert ml_pairs <= truth, f"unsound pairs: {sorted(ml_pairs - truth)[:5]}"
    recall = len(ml_pairs) / len(truth)
    assert recall >= 0.60, f"recall {recall:.3f}"
