"""Dynamic predicate builder (SURVEY P3).

The reference builds WHERE fragments by f-string interpolation of user
input (``app/app.py:94-117`` — an injection bug class).  This engine
composes ``Column`` expressions from a filters dict instead: values never
enter a SQL string, and Catalyst still pushes every predicate into the
scan.

Supported keys: plain ``col`` (equality), ``col__eq`` (explicit
equality — the escape hatch for a column whose NAME contains ``__``),
``col__ge``/``__gt``/``__le``/``__lt`` (range), ``col__in`` (IN-list),
``col__like`` (case-insensitive contains), ``col__isnull``
(True/False).  The op is the suffix after the LAST ``__`` — a first-
``__`` split would misparse ``vote__count__eq`` into column ``vote``.
Empty dict => lit(True), mirroring the reference's ``WHERE 1=1``
default; a ``None`` value skips its clause (the optional-API-param
pattern — express IS NULL via ``col__isnull``).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

_OPS = {
    "eq": lambda c, v: c == v,
    "ge": lambda c, v: c >= v,
    "gt": lambda c, v: c > v,
    "le": lambda c, v: c <= v,
    "lt": lambda c, v: c < v,
    "in": lambda c, v: c.isin(list(v)),
    "like": lambda c, v: F.lower(c).contains(str(v).lower()),
    "isnull": lambda c, v: c.isNull() if v else c.isNotNull(),
}


def build_predicate(filters: Mapping[str, Any]) -> Column:
    pred = F.lit(True)
    for key, value in filters.items():
        if value is None:
            continue
        col_name, _, op = key.rpartition("__")
        if not col_name:  # no '__' at all: rpartition puts the key in `op`
            col_name, op = key, ""
        col = F.col(col_name)
        if not op:
            clause = col == value
        elif op in _OPS:
            clause = _OPS[op](col, value)
        else:
            raise ValueError(f"unknown filter op {op!r} in {key!r}")
        pred = pred & clause
    return pred
