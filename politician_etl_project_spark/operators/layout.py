"""Data-layout operators: z-order (Morton) clustering for multi-column
pruning.

The problem at 100 TB: directory partitioning prunes on ONE column
hierarchy, and sorting a table by (a, b) only clusters the leading
column — a range filter on ``b`` alone still touches every file.
Interleaving the bits of both columns into one Morton value and sorting
by it keeps rows that are close in EITHER dimension close on disk, so
parquet footer min/max statistics prune files for filters on ``a``, on
``b``, or on both (the technique behind Delta/Databricks
``OPTIMIZE ZORDER BY`` and Iceberg's z-ordered rewrites — public
lakehouse practice; Spark itself ships no layout operator).

Reference analog: the reference leans on Postgres B-tree indexes per
column (sql/creations.sql); a columnar lake replaces those with layout +
statistics, which is exactly what this module provides.

Everything is integer bit math inside whole-stage codegen — the z-value
is hash-exact across engines, so the declared query (q_zorder_layout)
verifies the interleave itself against DuckDB bit-for-bit, and
tests/test_operators.py measures the pruning effect from real parquet
footers (files overlapping a point slice: z-ordered << linear layout on
the trailing dimension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(a: str | Column, b: str | Column, bits: int = 20) -> Column:
    """Morton interleave of two non-negative integer columns into one
    BIGINT: bit i of ``a`` lands at position 2i+1, bit i of ``b`` at 2i.
    Inputs are masked to ``bits`` low bits (callers quantize wider
    domains first — rank/bucket the column, don't feed raw 64-bit ids).

    2*bits must stay <= 62 so the result fits a BIGINT; the expression
    is a flat OR-chain of shift/mask terms — pure codegen, no UDF, no
    shuffle."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    mask = (1 << bits) - 1
    am = a.cast("bigint").bitwiseAND(F.lit(mask))
    bm = b.cast("bigint").bitwiseAND(F.lit(mask))
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftright(am, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(bm, i).bitwiseAND(F.lit(1))
        out = out.bitwiseOR(F.shiftleft(abit, 2 * i + 1)).bitwiseOR(
            F.shiftleft(bbit, 2 * i)
        )
    return out


def zorder_sql(a: str, b: str, bits: int = 20) -> str:
    """DuckDB replica of :func:`zorder_value` — identical mask/shift/OR
    arithmetic, so both engines produce the same BIGINT for any row."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    mask = (1 << bits) - 1
    am = f"(CAST({a} AS BIGINT) & {mask})"
    bm = f"(CAST({b} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({am} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({bm} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    a: str,
    b: str,
    n_files: int = 8,
    bits: int = 12,
) -> None:
    """Write ``df`` as parquet clustered by the (a, b) z-curve.

    Both columns are first QUANTIZED to ``bits`` via min/max scaling —
    the step every production z-order does (Delta range-partitions each
    column first): interleaving raw values whose significant widths
    differ makes one dimension's high bit outrank the other's, and a
    curve segment crossing that bit boundary resets the weaker column
    across its whole domain, destroying its footer min/max.  Equal-width
    quantized dimensions alternate bits fairly, so every contiguous
    curve segment is a compact rectangle in (a, b) space and each output
    file's footer min/max is narrow on BOTH columns — the property the
    pruning test measures from real footers.

    One tiny min/max aggregate + one range shuffle + local sorts; at
    100 TB this is the standard OPTIMIZE-style maintenance job run per
    partition, off the ingest hot path."""
    if "_z" in df.columns:
        raise ValueError("write_zordered reserves the column name '_z'")
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(a), F.max(a), F.min(b), F.max(b)
    ).collect()[0]
    if lo_a is None or lo_b is None:  # empty input: schema-true empty write
        df.write.mode("overwrite").parquet(path)
        return
    def _q(col: str, lo, hi) -> Column:
        # hybrid quantizer, overflow-safe at any span:
        # - small spans STRETCH to fill all 2^bits cells via
        #   ((x-lo)*top) div span — without the stretch a narrow column
        #   leaves its high bits constant and the interleave goes
        #   unbalanced again;
        # - spans >= 2^(63-bits) would overflow the multiply
        #   (span * top approaches 2^63 — ANSI aborts, non-ANSI wraps
        #   into garbage z-values and silently corrupt footers), but
        #   they already fill every bit, so plain division suffices.
        #   The threshold must track ``bits``: at bits=20 a 2^50-span
        #   column would push the product past 2^63.
        span = max(int(hi) - int(lo), 1)
        top = (1 << bits) - 1
        if span < (1 << (63 - bits)):
            return F.expr(
                f"((cast({col} as bigint) - {int(lo)}) * {top}) div {span}"
            )
        step = span // (1 << bits) + 1
        return F.expr(f"(cast({col} as bigint) - {int(lo)}) div {step}")

    z = zorder_value(_q(a, lo_a, hi_a), _q(b, lo_b, hi_b), bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
