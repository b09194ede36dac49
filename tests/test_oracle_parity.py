"""Differential test: every declared query with an oracle must hash-match
DuckDB on the small scale factor.  This is the local replica of the
driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from politician_etl_project_spark.queries import load_all
from tests.oracle_utils import compare

SPECS = load_all()
WITH_ORACLE = sorted(name for name, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(name for name, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    compare(spark, SPECS[name], sf_dir)


@pytest.mark.parametrize(
    "name",
    ROWS_ONLY
    or [
        pytest.param(
            "none",
            marks=pytest.mark.skip(
                reason="no rows-only oracles — all declared queries are hash-checked"
            ),
        )
    ],
)
def test_rows_only_runs(spark, sf_dir, name):
    df = SPECS[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)


def test_bpe_queries_on_exhausted_corpus(spark, tmp_path):
    """Degenerate corpus where the merge supply runs dry before round 3
    (every word is one repeated bigram — after merging it, no word has
    two symbols left): Spark's _bpe_train breaks early and keeps the
    merged word table, and the oracle's LEFT JOIN ON TRUE round
    fragments must pass the table through unchanged rather than
    collapsing to zero rows (round-4 review finding)."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from politician_etl_project_spark.queries import load_all
    from tests.conftest import SF_SMALL
    from tests.oracle_utils import compare

    sf = str(tmp_path / "degenerate_sf")
    os.makedirs(sf)
    for fname in os.listdir(SF_SMALL):
        if fname.endswith(".parquet") and fname != "documents.parquet":
            shutil.copy(os.path.join(SF_SMALL, fname), os.path.join(sf, fname))
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["ab ab ab", "ab ab", "ab"]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s0"] * 3),
            "n_chars": pa.array([8, 5, 2], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(sf, "documents.parquet"))

    specs = load_all()
    for name in ("q_bpe_train_merges", "q_bpe_vocab_stats"):
        compare(spark, specs[name], sf)
    # sanity: only ONE merge is possible ('a b' -> 'ab'), then exhaustion
    rows = specs["q_bpe_train_merges"].fn(spark, sf).collect()
    assert [(r.merge_round, r.merged) for r in rows] == [(0, "ab")]
