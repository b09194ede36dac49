"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``politician_etl_project_spark``; this module just
adapts the declared-query registry to the driver's interface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from politician_etl_project_spark.queries import load_all  # noqa: E402


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the package to Python workers via addPyFile.

    Queries that drop into mapInPandas / pandas_udf reference module
    functions; cloudpickle serializes those *by module name*, so worker
    processes must be able to import ``politician_etl_project_spark`` even when
    the driver was launched from an arbitrary cwd.  This is also exactly
    how the package deploys to a real multi-executor cluster."""
    sc = spark.sparkContext
    if getattr(sc, "_politician_etl_shipped", False):
        return
    import shutil
    import tempfile

    staging = tempfile.mkdtemp(prefix="politician-etl-pyfiles-")
    zip_path = shutil.make_archive(
        f"{staging}/politician_etl_project_spark",
        "zip",
        root_dir=_REPO_ROOT,
        base_dir="politician_etl_project_spark",
    )
    sc.addPyFile(zip_path)
    sc._politician_etl_shipped = True


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 6-way star join with
    broadcast dims (q05) — the engine's equivalent of the reference's
    most-traveled donations ⋈ politicians ⋈ donors metric path."""
    _ensure_shipped(spark)
    specs = load_all()
    return specs["q05_region_volume"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator-query from SURVEY.md §2."""
    return {name: _wrap(spec.fn) for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every SQL-expressible declared query."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
