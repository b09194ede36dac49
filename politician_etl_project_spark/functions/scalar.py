"""Scalar-function layer (SURVEY.md §2.8, F1-F18).

Every scalar computation the reference performs in Python/pandas/SQL is
re-expressed as a *native* Column expression — JVM-side, inside
whole-stage codegen, no Python in the hot path.  Reference citations are
in each function's docstring.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- money / decimal conventions -------------------------------------------
# The reference stores money as NUMERIC(12,2) (app/models.py:57) and sums it
# (app/metrics.py:50).  We cast doubles to DECIMAL(12,2) *before* any
# arithmetic so aggregation is exact and order-independent — a requirement
# both for the DuckDB hash-oracle and for reproducible results on a
# 1000-executor cluster where partial-aggregation order is nondeterministic.


def money(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(12,2)")


def disc_price(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """extendedprice * (1 - discount), exact decimal (scale 4)."""
    return money(price) * (F.lit(1) - money(discount))


def charge(price: str = "l_extendedprice", discount: str = "l_discount", tax: str = "l_tax") -> Column:
    """extendedprice * (1 - discount) * (1 + tax), exact decimal (scale 6)."""
    return disc_price(price, discount) * (F.lit(1) + money(tax))


# --- string/key functions ---------------------------------------------------


def composite_key(*cols: str | Column, sep: str = "|") -> Column:
    """NULL-safe composite business key, e.g. the donor uid
    ``NAME|ZIP|EMPLOYER`` (reference scripts/ingest_bulk_donations.py:98-100,
    SURVEY F6).  Empty string for NULL segments so the key is total."""
    parts = [F.coalesce(F.col(c) if isinstance(c, str) else c, F.lit("")) for c in cols]
    return F.concat_ws(sep, *parts)


def normalize_name(col: str | Column) -> Column:
    """Uppercase, strip periods/commas, collapse whitespace, trim —
    the reference's ``normalize_name`` (scripts/ingest_fec_links.py:34-43,
    SURVEY F3/D1) as a native expression instead of a Python UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.upper(c), r"[.,]", ""), r"\s+", " "))


def parse_last_first(col: str | Column) -> Column:
    """Split ``"Last, First[, Suffix]"`` on the first comma into a struct
    (first_name, last_name); no comma => whole string is last_name
    (reference scripts/ingest_politicians.py:124-136, SURVEY F4)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r",\s*", 2)
    has_comma = F.size(parts) >= 2
    return F.struct(
        F.when(has_comma, F.trim(parts.getItem(1))).alias("first_name"),
        F.trim(parts.getItem(0)).alias("last_name"),
    )
