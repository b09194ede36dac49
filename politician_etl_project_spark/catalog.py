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


def tmp_cache_key(sf_dir: str, *rel_files: str, version: str = "") -> str:
    """Stable cross-process cache key for /tmp build-once artifacts: md5
    of the ABSOLUTE sf_dir plus each named source file's (size, mtime)
    fingerprint — so a regenerated corpus rebuilds, identical corpora
    referenced by different relative paths share one cache, and the key
    never depends on Python's per-process-salted hash().  Pass a
    ``version`` token when the BUILD LOGIC (not just the data) can
    change — bumping it invalidates caches built by old code.  Shared by the
    analytics_ext tmp stores and the merge-replay table; the stored ANN
    index caches (queries/vector._stored_index_path) follow the same
    discipline with extra per-kind version terms."""
    import hashlib
    import os

    sf_dir = os.path.abspath(sf_dir)
    parts = [sf_dir, version] if version else [sf_dir]
    for rf in rel_files:
        path = os.path.join(sf_dir, rf)
        try:
            st = os.stat(path)
            parts.append(f"{rf}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            parts.append(f"{rf}:unknown")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def ensure_built_dir(path: str, build) -> str:
    """Build-once /tmp artifact discipline, shared by every stored-index /
    tmp-store cache in the repo: if ``path`` exists it is served as-is;
    otherwise ``build(staging_path)`` populates a process-unique staging
    dir that is atomically renamed into place.

    The protocol (previously copy-pasted at five call sites with
    drifting error handling):

    - staging is suffixed with pid + random hex, so concurrent builders
      never share a half-written dir;
    - the staging dir is PRE-CREATED — a builder whose write emits no
      files (empty corpus) still publishes a valid empty artifact
      instead of failing the rename;
    - a failed build removes its staging (no /tmp litter);
    - a lost publish race (another process renamed first) is benign —
      ONLY if the destination actually exists; a real rename failure
      (EXDEV, permissions, stale parent) surfaces."""
    import os
    import shutil
    import uuid

    if os.path.isdir(path):
        return path
    staging = f"{path}.building-{os.getpid()}-{uuid.uuid4().hex[:6]}"
    os.makedirs(staging, exist_ok=True)
    try:
        build(staging)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    try:
        os.replace(staging, path)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        if not os.path.isdir(path):
            raise
    return path


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


# --- JDBC twin (SURVEY §2.1 S9) --------------------------------------------
# The reference reads/writes Postgres through pooled SQLAlchemy sessions
# (app/database.py:25-45) and psycopg2 batch inserts
# (scripts/ingest_fec_links.py:63).  The Spark-first equivalent is the
# built-in JDBC source: the SAME load_table interface, but the scan happens
# on executors with predicate pushdown into the database and
# partition-parallel reads.  No JDBC driver jar ships in this container,
# so connecting is environment-gated — but the option construction (the
# part that encodes the scale decisions) is plain code, unit-tested
# without a database.


def jdbc_scan_options(
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
    driver: str | None = None,
) -> dict[str, str]:
    """Build the option map for a partition-parallel JDBC scan.

    Scale contract: without ``partition_column`` a JDBC read is ONE
    executor pulling the whole table through one cursor — fine for dims,
    fatal for facts.  With (column, bounds, n) Spark issues n range
    predicates and reads in parallel; ``fetch_size`` keeps the cursor
    streaming instead of buffering the table driver-side (psycopg2's
    itersize analog).
    """
    if not url.startswith("jdbc:"):
        raise ValueError(f"JDBC url must start with 'jdbc:': {url!r}")
    opts = {"url": url, "dbtable": table, "fetchsize": str(fetch_size)}
    if driver:
        opts["driver"] = driver
    elif url.startswith("jdbc:postgresql:"):
        opts["driver"] = "org.postgresql.Driver"
    bounds = (partition_column, lower_bound, upper_bound)
    if any(b is not None for b in bounds):
        if any(b is None for b in bounds):
            raise ValueError(
                "partition_column, lower_bound and upper_bound must be set together"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def load_table_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    **kwargs,
) -> DataFrame:
    """JDBC-backed twin of :func:`load_table` — same lazy-DataFrame
    interface, database scan instead of parquet.  Catalyst pushes filters
    and projections into the generated SQL (`PushedFilters` in explain),
    so downstream queries behave identically.  Requires the driver jar on
    the classpath (spark.jars / --packages); see :func:`jdbc_scan_options`
    for the partition-parallel scan contract."""
    reader = spark.read.format("jdbc")
    for k, v in jdbc_scan_options(url, table, **kwargs).items():
        reader = reader.option(k, v)
    return reader.load()
