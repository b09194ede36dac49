"""politician_etl_project_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL project ``aprabhu28/politician-etl-project``
(see SURVEY.md): relational metric queries, ETL scan/flatten/coercion
operators, entity-resolution fuzzy joins, incremental/watermark pipelines,
and an embedding/text layer — plus the LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) designed for
100 TB scale.

Everything is declared through the DataFrame/SQL API so Catalyst handles
predicate pushdown, column pruning, join selection and AQE re-planning;
Python only appears in Arrow-batched `pandas_udf`s on genuinely
non-relational paths.
"""

from politician_etl_project_spark.session import get_spark
from politician_etl_project_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_tables", "register_views"]
