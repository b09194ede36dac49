"""RAG lifecycle tests (SURVEY §3.3): deterministic hash embeddings,
self-retrieval, metadata join-back, stubbed LLM slots."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from politician_etl_project_spark import rag
from politician_etl_project_spark.catalog import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def corpus(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    return rag.embed_corpus(docs).cache()


def test_embedding_shape_and_norm(corpus):
    row = corpus.select("embedding").first()
    assert len(row.embedding) == 64
    norm = sum(v * v for v in row.embedding) ** 0.5
    assert norm == pytest.approx(1.0, abs=1e-5)


def test_embedding_deterministic(spark, corpus):
    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    again = rag.embed_corpus(docs)
    a = {r.doc_id: list(r.embedding) for r in corpus.select("doc_id", "embedding").collect()}
    b = {r.doc_id: list(r.embedding) for r in again.select("doc_id", "embedding").collect()}
    assert a == b


def test_self_retrieval_top1(spark, corpus):
    """Querying with a document's own text must return that document
    first (identical token set -> identical vector -> cosine 1)."""
    target = corpus.select("doc_id", "text").first()
    hits = rag.semantic_search(corpus, target.text, k=3).collect()
    assert hits[0].score == pytest.approx(1.0, abs=1e-3)
    top_texts = {h.text for h in hits if h.score >= hits[0].score - 1e-6}
    assert target.text in top_texts  # exact-dup texts may tie at 1.0


def test_keyword_stub():
    kws = rag.llm_extract_keywords("What is the total of donations and votes?")
    assert kws == ["total", "donations", "votes"]
    assert "the" not in kws and "of" not in kws


def test_answer_question_assembles_context(spark, corpus):
    stats = spark.createDataFrame([("donations_total", 3)], "stat string, value long")
    out = rag.answer_question(corpus, "key table scan", metric_frames={"stats": stats}, k=3)
    assert len(out["hits"]) == 3
    assert all("text" in h and "score" in h for h in out["hits"])
    assert "QUESTION: key table scan" in out["answer"]
    assert "stats (1 rows)" in out["answer"]


def test_sparse_replay_matches_dense_cosine(spark):
    """The sparse integer replay behind q_semantic_search_e2e must score
    each doc EXACTLY like cosine over the dense rag.hash_embedding
    vectors (both sides L2-normalize the same signed counts, so the
    scores agree to float32 rounding).  Also pins the driver-side
    hashlib replay against the Spark md5 expression: one drifted
    formula spelling and both checks here diverge."""
    from politician_etl_project_spark.queries.vector import (
        _SEARCH_QUESTION,
        q_semantic_search_e2e,
    )

    sparse = {
        r["doc_id"]: r["score"]
        for r in q_semantic_search_e2e(spark, SF_SMALL).collect()
    }
    assert sparse, "fixture corpus must produce hits"

    docs = load_table(spark, SF_SMALL, "documents")
    corpus_emb = rag.embed_corpus(docs)
    dense = {
        r["doc_id"]: r["score"]
        for r in rag.semantic_search(corpus_emb, _SEARCH_QUESTION, k=10).collect()
    }
    assert set(sparse) == set(dense), "top-10 sets diverge between replays"
    for doc_id, s in sparse.items():
        assert dense[doc_id] == pytest.approx(s, abs=2e-4), doc_id
