"""Synthesize the 4th scale point for the serving-tier sweep:
documents + embeddings at 5x sf0.1 under /tmp/spark_graft_sf0.5/.

The r5 verdict noted the stored-index flatness claims (BM25 / ANN
serving measured flat across sf0.001->0.1) rest on a 100x spread whose
largest corpus is 5k docs; this extends the axis another 5x using ONLY
the two tables those tiers read — /root/testdata is read-only, so the
extra point lives in the temp dir and is rebuilt on demand.

Replication is deterministic: replica k offsets doc_id/vec_id by
k * (max_id + 1), appends a per-replica tag token to text (so segment /
minhash content is not trivially identical across replicas), and
perturbs the first embedding component by k * 1e-3 (distinct vectors,
same distribution).  Derived columns (n_chars) are recomputed.

Run: python tools/gen_bigdocs.py   (idempotent; ~seconds)
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

SRC = "/root/testdata/sf0.1"
REPLICAS = 5

BIGDOCS_DIR = os.path.join(tempfile.gettempdir(), "spark_graft_sf0.5")


def ensure_bigdocs() -> str:
    """Build (idempotently) and return the sf0.5 directory."""
    import duckdb

    d = Path(BIGDOCS_DIR)
    docs_out = d / "documents.parquet"
    emb_out = d / "embeddings.parquet"
    if docs_out.exists() and emb_out.exists():
        return str(d)
    staging = Path(tempfile.mkdtemp(prefix="sf05-", dir=tempfile.gettempdir()))
    con = duckdb.connect()
    reps = ", ".join(str(k) for k in range(REPLICAS))
    con.execute(
        f"""
        COPY (
          SELECT doc_id + k.k * (SELECT MAX(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')) AS doc_id,
                 CASE WHEN k.k = 0 THEN text ELSE text || ' r' || k.k END AS text,
                 lang, source,
                 CAST(length(CASE WHEN k.k = 0 THEN text ELSE text || ' r' || k.k END) AS BIGINT) AS n_chars
          FROM read_parquet('{SRC}/documents.parquet'), (SELECT unnest([{reps}]) AS k) k
          ORDER BY doc_id
        ) TO '{staging}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT vec_id + k.k * (SELECT MAX(vec_id) + 1 FROM read_parquet('{SRC}/embeddings.parquet')) AS vec_id,
                 CASE WHEN k.k = 0 THEN embedding
                      ELSE list_prepend(embedding[1] + k.k * 0.001, embedding[2:])
                 END AS embedding,
                 label
          FROM read_parquet('{SRC}/embeddings.parquet'), (SELECT unnest([{reps}]) AS k) k
          ORDER BY vec_id
        ) TO '{staging}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    os.makedirs(d, exist_ok=True)
    for name in ("documents.parquet", "embeddings.parquet"):
        target = d / name
        if not target.exists():
            os.replace(staging / name, target)
    for leftover in staging.iterdir():
        leftover.unlink()
    staging.rmdir()
    return str(d)


if __name__ == "__main__":
    import duckdb

    path = ensure_bigdocs()
    con = duckdb.connect()
    nd = con.execute(f"SELECT COUNT(*) FROM read_parquet('{path}/documents.parquet')").fetchone()[0]
    ne = con.execute(f"SELECT COUNT(*) FROM read_parquet('{path}/embeddings.parquet')").fetchone()[0]
    print(f"{path}: documents={nd} embeddings={ne}")
