"""Realistic-density near-dup bench corpus (round-6 verdict item 6).

The driver's synthetic documents fixture draws from a ~30-word vocab, so
at sf0.1 ~60% of all doc pairs verify at Jaccard>=0.8 — the UNCAPPED
near-dup query's cost there is pure output volume, which says nothing
about engine efficiency and forced a bench exclusion.  Real web corpora
carry 1-10% near-duplication (the regime MinHash-LSH is designed for),
so this module generates a deterministic twin corpus at that density:

- same schema and row count as the sf0.1 `documents` table;
- a 20k-token vocab so unrelated docs share almost no shingles
  (expected Jaccard between two random 40-token docs ~ 0.1%);
- an exact `DUP_RATE` fraction of docs get ONE near-dup partner —
  the partner copies the doc's token list with 1-2 tokens swapped
  (Jaccard ~ 0.95), so the verified-pair count is known by
  construction (~n_docs*DUP_RATE/2 pairs) and the bench measures
  candidate generation + verification, not answer printing.

Pure numpy + pyarrow (no Spark session) and fully seeded: every call
writes byte-identical parquet, cached under /tmp and reused.
"""

from __future__ import annotations

import os

N_DOCS = 5000
DUP_RATE = 0.03
SEED = 20260815
_BASE_FMT = "/tmp/spark_graft_docs_sparse_v2_n{n}_d{d}"


def ensure_sparse_docs(n_docs: int = N_DOCS, dup_rate: float = DUP_RATE) -> str:
    """Idempotently materialize the sparse corpus; returns the directory
    usable as an sf_dir for documents-only queries.

    The cache path encodes (n_docs, dup_rate) — round-7 verdict #3: the
    v1 cache keyed on nothing, so a non-default call silently returned
    the default corpus."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = _BASE_FMT.format(n=n_docs, d=f"{dup_rate:g}".replace(".", "p"))
    out = os.path.join(base, "documents.parquet")
    if os.path.exists(out):
        return base

    rng = np.random.default_rng(SEED)
    vocab = np.array([f"w{i:05d}" for i in range(20_000)])
    langs = np.array(["en", "de", "fr", "zh", "es"])
    n_pairs = int(n_docs * dup_rate / 2)
    n_base = n_docs - n_pairs

    texts: list[str] = []
    for _ in range(n_base):
        k = int(rng.integers(30, 80))
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), k)]))
    # each dup partner edits 1-2 token positions of a distinct base doc
    victims = rng.choice(n_base, size=n_pairs, replace=False)
    for v in victims:
        toks = texts[int(v)].split(" ")
        for pos in rng.choice(len(toks), size=int(rng.integers(1, 3)), replace=False):
            toks[int(pos)] = str(vocab[int(rng.integers(0, len(vocab)))])
        texts.append(" ".join(toks))

    n = len(texts)
    table = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs[rng.integers(0, len(langs), n)], type=pa.string()),
            "source": pa.array([f"src{i % 7}" for i in range(n)], type=pa.string()),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    tmp_dir = f"{base}.tmp-{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    pq.write_table(table, os.path.join(tmp_dir, "documents.parquet"))
    try:
        os.rename(tmp_dir, base)
    except OSError:  # concurrent writer won; its output is identical
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
    return base


if __name__ == "__main__":
    print(ensure_sparse_docs())
