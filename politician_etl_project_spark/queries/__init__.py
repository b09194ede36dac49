"""Declared-query registry: every operator from SURVEY.md §2 gets at least
one named query with a Spark implementation and (where SQL-expressible) a
DuckDB oracle."""

from politician_etl_project_spark.queries.registry import REGISTRY, QuerySpec, declared_query


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so the registry is fully populated."""
    from politician_etl_project_spark.queries import (  # noqa: F401
        tpch,
        tpch_ext,
        relational,
        windows,
        events,
        textops,
        vector,
        multimodal,
        coverage_ext,
        temporal,
        pipeline,
    )

    return dict(REGISTRY)


__all__ = ["REGISTRY", "QuerySpec", "declared_query", "load_all"]
