from politician_etl_project_spark.functions.scalar import (
    money,
    disc_price,
    charge,
    composite_key,
    normalize_name,
    parse_last_first,
)

__all__ = [
    "money",
    "disc_price",
    "charge",
    "composite_key",
    "normalize_name",
    "parse_last_first",
]
