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


@pytest.mark.parametrize("name", ROWS_ONLY)
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
