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
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark
    has no native type for.  Read nanos as long (legacy knob, settable at
    runtime) and truncate to microseconds with *integer* division — ns
    epochs (~1.7e18) overflow double's 53-bit mantissa, so ``/ 1000`` via
    double would corrupt low digits.  DuckDB performs the same ns→µs
    truncation on read, keeping the oracle exact."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view (idempotent) and return the dict."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
