"""Registry of declared queries.

Each query is a pure function ``(spark, sf_dir) -> DataFrame`` paired with
an equivalent ANSI-SQL oracle string that DuckDB runs over the same parquet
tables (driver contract in ``__spark_entry__.py``).  Conventions shared by
both sides so the order-insensitive value-hash matches (FIXTURES.md §
"Canonicalization rules"):

- every computed column is aliased identically in Spark and SQL;
- money math is done in DECIMAL — doubles are cast to ``DECIMAL(12,2)``
  *before* aggregation so sums are exact and order-independent — but the
  FINAL projection must carry no DECIMAL (or DuckDB HUGEINT) column:
  the driver canonicalizes the DuckDB side through a float conversion
  (shortest repr), so Spark's fixed-scale Decimal rendering ("1085.40")
  hash-mismatches DuckDB's float ("1085.4") even when every cell is
  value-identical (CORRECTNESS_r01: 17 such false-fails).  The registry
  therefore casts every DecimalType output column to DOUBLE automatically
  (``_canonical_output_types`` below — the decimal value is already exact,
  so the double is deterministic), and each oracle must wrap
  integer-typed SUM/CASE sums in ``CAST(... AS BIGINT)`` (DuckDB SUM over
  INTEGER yields HUGEINT, which the driver floats to "4421.0" while Spark
  LongType renders "4421").  ``tests/oracle_utils.compare`` enforces both
  rules with a DESCRIBE-based type guard;
- time buckets are rendered as strings (``yyyy-MM-dd HH:mm:ss``) because
  Spark's ``date_trunc`` returns TIMESTAMP while DuckDB's returns DATE;
- no NULLable NUMERIC column may reach the final projection: the driver's
  float conversion runs the oracle through pandas, where a nullable int64
  column floats every value ("49666" -> "49666.0") and a NULL float
  renders NaN, while Spark keeps int/NULL — coalesce boundary offsets /
  unmatched-left-join measures to a typed sentinel (-1) on BOTH sides
  (r02 driver-sim finding: q_asof_join, q_window_lag_lead).  NULLable
  STRING outputs are safe (pandas keeps them as None);
- LIMIT queries impose a total order with a unique-key tie-break first.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # ANSI SQL for DuckDB; None => rows-only check
    ops: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 ids covered
    doc: str = ""


def _canonical_output_types(df: DataFrame) -> DataFrame:
    """Cast DecimalType output columns to DOUBLE at the projection boundary.

    Internal arithmetic stays in DECIMAL (exact, order-independent); only
    the *final* projection is widened so the driver's float-based value
    hash sees identical shortest-repr strings on the Spark and DuckDB
    sides.  No-op when the schema has no decimals."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if not any(isinstance(f.dataType, T.DecimalType) for f in df.schema.fields):
        return df
    return df.select(
        *[
            F.col(f.name).cast("double").alias(f.name)
            if isinstance(f.dataType, T.DecimalType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def declared_query(name: str, oracle: Optional[str], ops: tuple[str, ...] = (), doc: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate declared query: {name}")

        def canonical_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _canonical_output_types(fn(spark, sf_dir))

        canonical_fn.__name__ = fn.__name__
        canonical_fn.__doc__ = fn.__doc__
        canonical_fn.__wrapped__ = fn
        REGISTRY[name] = QuerySpec(
            name=name, fn=canonical_fn, oracle=oracle, ops=tuple(ops), doc=doc or (fn.__doc__ or "")
        )
        return fn

    return wrap
