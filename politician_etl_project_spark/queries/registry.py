"""Registry of declared queries.

Each query is a pure function ``(spark, sf_dir) -> DataFrame`` paired with
an equivalent ANSI-SQL oracle string that DuckDB runs over the same parquet
tables (driver contract in ``__spark_entry__.py``).  Conventions shared by
both sides so the order-insensitive value-hash matches (FIXTURES.md §
"Canonicalization rules"):

- every computed column is aliased identically in Spark and SQL;
- money math is done in DECIMAL — doubles are cast to ``DECIMAL(12,2)``
  *before* aggregation so sums are exact and order-independent, and the
  final cast never reduces scale (no rounding divergence between engines);
- time buckets are rendered as strings (``yyyy-MM-dd HH:mm:ss``) because
  Spark's ``date_trunc`` returns TIMESTAMP while DuckDB's returns DATE;
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


def declared_query(name: str, oracle: Optional[str], ops: tuple[str, ...] = (), doc: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate declared query: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, ops=tuple(ops), doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap
