"""RAG hybrid-query lifecycle (SURVEY §3.3; reference ``app/app.py``
AI tab: extract_keywords → embed → Pinecone top-k → metric fan-out →
GPT synthesis, app/app.py:338-519).

The engine-side stages (embedding column, top-k search, metadata
join-back, metric fan-out) are real Spark jobs; the two LLM calls
(keyword extraction V4, synthesis V5) are driver-side orchestration
*outside the correctness surface* and are deterministic stubs here,
clearly marked — swap ``llm_extract_keywords``/``llm_synthesize`` for
real clients in production.

Embeddings use a deterministic hash-embedding (feature hashing: token →
md5 bucket, ±1 sign, L2-normalized) so offline tests need no model and
both query- and corpus-side vectors come from the same pure expression.
The reference's truncation ladder (hydrate_vectors.py:80-95) becomes a
single ``substring`` guard.

Scale: corpus embedding is a narrow map (no shuffle) materialized once;
query-time top-k broadcasts the 1-row query vector and runs
TakeOrderedAndProject — the same plan family as V2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from politician_etl_project_spark.operators.similarity import knn_bruteforce

_STOPWORDS = {"the", "a", "an", "of", "and", "or", "to", "in", "is", "what", "which", "who", "how"}

# The ONE hash-embedding formula, as format strings shared by the dense
# Column expression below, the sparse integer replay in
# queries/vector.q_semantic_search_e2e, and its DuckDB oracle twin —
# defined once so the three can never drift (the CMS_*_FMT discipline,
# queries/textops.py).
HASH_EMBED_TOKENS_FMT = (
    "array_distinct(split(trim(lower(substring({ident}, 1, {max_chars}))), '\\\\s+'))"
)
HASH_EMBED_BUCKET_FMT = "cast(conv(substring(md5({t}), 1, 7), 16, 10) as int) % {dim}"
HASH_EMBED_SIGN_INT_FMT = (
    "(case when conv(substring(md5({t}), 8, 1), 16, 10) % 2 = 0 then 1 else -1 end)"
)
HASH_EMBED_DUCK_BUCKET_FMT = "CAST('0x' || substr(md5({t}), 1, 7) AS BIGINT) % {dim}"
HASH_EMBED_DUCK_SIGN_FMT = (
    "(CASE WHEN CAST('0x' || substr(md5({t}), 8, 1) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END)"
)


def hash_embedding_components(text: str, dim: int = 64, max_chars: int = 10_000) -> dict[int, int]:
    """Driver-side replay of the SAME formula for a constant string
    (e.g. a search question): {bucket: signed count} over distinct
    tokens.  hashlib.md5 == Spark md5 == DuckDB md5, so a literal
    VALUES table built from this is exact on both engines.

    Tokenization replays the ENGINES' semantics, not Python's: Spark's
    ``trim`` and DuckDB's ``trim`` strip only the space character (so
    ``strip(' ')``, never Unicode-aware ``strip()``), and Java/DuckDB
    ``\\s`` is the ASCII class ``[ \\t\\n\\x0b\\f\\r]`` (Python ``re``
    ``\\s`` would also split on Unicode whitespace like U+00A0 and
    diverge)."""
    import hashlib
    import re

    comp: dict[int, int] = {}
    seen: set[str] = set()
    for t in re.split(r"[ \t\n\x0b\f\r]+", text[:max_chars].lower().strip(" ")):
        if t in seen:
            continue
        seen.add(t)
        h = hashlib.md5(t.encode()).hexdigest()
        b = int(h[:7], 16) % dim
        s = 1 if int(h[7], 16) % 2 == 0 else -1
        comp[b] = comp.get(b, 0) + s
    return comp


def hash_embedding(col: str, dim: int = 64, max_chars: int = 10_000) -> Column:
    """Deterministic feature-hash embedding: each distinct token adds ±1
    to bucket md5(token)%dim (sign from the next md5 nibble); the result
    is L2-normalized.  Pure Column expression — embeds 100 TB of text as
    a narrow map with zero Python.

    ``col`` is a column NAME (quoted into the expression as a SQL
    identifier).  Accepting only names keeps this Spark-Connect-safe:
    rendering an arbitrary Column to SQL text needs the private
    ``Column._jc`` JVM handle, which Connect clients don't have."""
    if not isinstance(col, str):
        raise TypeError(
            "hash_embedding takes a column name (str); alias the expression "
            "into a column first — Column objects can't be rendered to SQL "
            "without private JVM APIs"
        )
    ident = "`" + col.replace("`", "``") + "`"
    toks = HASH_EMBED_TOKENS_FMT.format(ident=ident, max_chars=max_chars)
    bucket = HASH_EMBED_BUCKET_FMT.format(t="t", dim=dim)
    sign = f"cast({HASH_EMBED_SIGN_INT_FMT.format(t='t')} as double)"
    # transform's lambda index i is 0-BASED (verified on Spark 4.1.2) —
    # comparing i-1 here would shift every token up one slot, leave
    # index 0 permanently zero, and silently DROP tokens hashing to
    # bucket dim-1 (an all-such-token doc embeds as the zero vector and
    # cosine NULLs out)
    raw = (
        f"aggregate({toks}, array_repeat(0.0D, {dim}), "
        f"(acc, t) -> transform(acc, (v, i) -> v + (case when i = {bucket} then {sign} else 0.0D end)))"
    )
    norm = f"sqrt(aggregate({raw}, 0.0D, (s, v) -> s + v * v))"
    return F.expr(
        f"transform({raw}, v -> cast(v / greatest({norm}, 1e-12D) as float))"
    )


def embed_corpus(docs: DataFrame, text_col: str = "text", dim: int = 64) -> DataFrame:
    """V1: materialize the embedding column on the corpus (the
    hydrate_vectors batch, hydrate_vectors.py:72-106 — here one narrow
    map, no external vector store)."""
    return docs.withColumn("embedding", hash_embedding(text_col, dim))


def llm_extract_keywords(question: str) -> list[str]:
    """V4 STUB — the reference calls gpt-4o-mini in JSON mode
    (app/app.py:374-398).  Deterministic fallback mirroring its failure
    path: stopword-filtered lowercase tokens, order-preserving dedup."""
    seen: dict[str, None] = {}
    for t in question.lower().split():
        t = t.strip(".,?!\"'")
        if t and t not in _STOPWORDS:
            seen.setdefault(t, None)
    return list(seen)


def semantic_search(
    corpus_emb: DataFrame,
    question: str,
    k: int = 10,
    id_col: str = "doc_id",
    dim: int | None = None,
) -> DataFrame:
    """V2+V3: embed the query with the SAME expression family, top-k
    cosine, join hit metadata back from the corpus (no duplicated
    metadata store, unlike Pinecone's per-vector payloads).

    ``dim`` defaults to the CORPUS embedding width (one size() probe of
    a single row) — hardcoding a default would pad mismatched zip_with
    lanes with NULLs and silently return arbitrary first-k-by-id hits
    with score=None whenever the corpus was embedded at another dim."""
    spark = corpus_emb.sparkSession
    if dim is None:
        row = corpus_emb.select(F.size("embedding")).first()
        dim = row[0] if row is not None else 64
    qdf = spark.createDataFrame([(question,)], "q_text string").select(
        hash_embedding("q_text", dim).alias("q")
    )
    hits = knn_bruteforce(corpus_emb, qdf, k=k, vec_col="embedding", id_col=id_col)
    meta_cols = [c for c in corpus_emb.columns if c != "embedding"]
    return (
        F.broadcast(hits)
        .join(corpus_emb.select(*meta_cols), id_col)
        .orderBy(F.desc("score"), F.asc(id_col))
    )


def llm_synthesize(question: str, context: dict) -> str:
    """V5 STUB — the reference prompts gpt-4o with assembled metric
    frames (app/app.py:401-519).  Deterministic fallback: a structured
    digest of the retrieved context (what the prompt would contain)."""
    lines = [f"QUESTION: {question}"]
    for section, rows in context.items():
        lines.append(f"== {section} ({len(rows)} rows) ==")
        lines.extend(str(r) for r in rows[:5])
    return "\n".join(lines)


def answer_question(
    corpus_emb: DataFrame,
    question: str,
    metric_frames: dict[str, DataFrame] | None = None,
    k: int = 5,
) -> dict:
    """The full §3.3 pipeline: keywords → semantic top-k → analytical
    fan-out → synthesis.  Returns the intermediate artifacts so callers
    (and tests) can inspect each stage."""
    keywords = llm_extract_keywords(question)
    hits = semantic_search(corpus_emb, question, k=k)
    hit_rows = [r.asDict() for r in hits.collect()]
    context = {"semantic_hits": hit_rows}
    for name, df in (metric_frames or {}).items():
        context[name] = [r.asDict() for r in df.limit(20).collect()]
    return {
        "keywords": keywords,
        "hits": hit_rows,
        "answer": llm_synthesize(question, context),
    }
