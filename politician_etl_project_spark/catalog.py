"""Table catalog over the driver-generated parquet testdata.

Mirrors the reference's data-access layer (``app/database.py:18-45`` —
pooled SQLAlchemy sessions over fixed tables) as lazy parquet scans with
registered temp views, so every query can run either through the DataFrame
API or ``spark.sql``.

Scale note: at 100 TB these would be partitioned/bucketed managed tables
(partition by date/congress, bucket by join key); a parquet directory scan
keeps the same interface.  Filters and projections declared downstream are
pushed into the scan by Catalyst (check ``PushedFilters`` in
``.explain("formatted")``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast in joins, even at 100 TB
# fact scale (region: 5 rows, nation: 25 — these are bounded-domain dims).
ALWAYS_BROADCAST = ("region", "nation")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view (idempotent) and return the dict."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
