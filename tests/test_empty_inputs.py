"""Robustness sweep: every declared query must EXECUTE on empty tables.

An engine that crashes on an empty partition/table is not 100 TB-safe —
empty inputs are routine (a fresh partition, a filter that eliminates a
source, a cold-start incremental run).  Typical bug classes this
catches: driver-side ``.first()`` returning None (ANN query vectors),
aggregates over zero rows feeding non-null arithmetic, and window/join
compositions that assume at least one group.

The empty mirror preserves the exact parquet STORAGE schema (pyarrow
``schema.empty_table``), so type-sensitive readers (events ns/us
timestamps) run their real code paths.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow.parquet as pq
import pytest

from politician_etl_project_spark.queries import load_all
from tests.conftest import SF_SMALL

SPECS = load_all()


@pytest.fixture(scope="session")
def empty_sf_dir() -> str:
    path = os.path.join(tempfile.gettempdir(), "spark_graft_empty_sf_v1")
    os.makedirs(path, exist_ok=True)
    for fname in os.listdir(SF_SMALL):
        if not fname.endswith(".parquet"):
            continue
        out = os.path.join(path, fname)
        if not os.path.exists(out):
            schema = pq.read_schema(os.path.join(SF_SMALL, fname))
            pq.write_table(schema.empty_table(), out)
    return path


@pytest.mark.parametrize("name", sorted(SPECS))
def test_runs_on_empty_tables(spark, empty_sf_dir, name):
    df = SPECS[name].fn(spark, empty_sf_dir)
    # some sources are fixture-backed (q_src_*) and legitimately non-empty;
    # the contract here is only "no crash, well-formed result"
    assert df.count() >= 0
    assert len(df.columns) > 0
