"""Temporal join operators: as-of join and range join (north-star custom
operators — Spark has no native ASOF/RANGE join; the reference has no
temporal joins at all, SURVEY §2.3 closing note).

Both are implemented as compositions of existing DataFrame ops (the
preferred strategy ladder: composition > pandas UDF > mapPartitions),
chosen for their scale shape:

- ``asof_join``: union-and-carry — tag both sides, union, ONE shuffle on
  (key), per-key event-time sort inside the window, and
  last-non-null-carry-forward pulls the right side's latest at-or-before
  value onto each left row.  O(n log n) per key, no pair blowup, and the
  same plan works for any number of left rows per right row.  This is
  the classic distributed as-of algorithm (union + LOCF) rather than a
  per-row lookup.
- ``range_join_binned``: time-bin blocking — bin both sides by the range
  width, explode the probe side into (bin, bin+1), equi-join on
  (key, bin), refine with the exact inequality.  Every qualifying pair
  shares a bin under the pigeonhole bound, and the shuffle key is
  (key, bin) — never a cross product.  Catalyst alone would execute the
  raw inequality as BroadcastNestedLoopJoin (O(n·m)); the binning turns
  it into a hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_val: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the right side's greatest ``ts`` that is
    <= the left row's ``ts`` (per ``key``), plus ``right_val`` from that
    row if given.  Right rows sort before left rows at equal timestamps,
    so ties resolve to at-or-before (DuckDB ASOF JOIN semantics)."""
    val_col = right_val or ts
    out_col = f"{val_col}{suffix}"
    l_cols = [c for c in left.columns if c not in (key, ts)]
    clash = sorted(({"_rv", "_side", "_asof", out_col}) & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join reserves working/output columns {clash}; rename them "
            "in the left input or pass a different suffix"
        )
    # the carried value is a one-field STRUCT, not the bare value: LOCF
    # must pick the latest right ROW at-or-before, and a bare-value
    # last(ignorenulls) would skip a right row whose value column is
    # NULL and wrongly surface an OLDER row's value (DuckDB ASOF
    # matches the row, then returns its — possibly NULL — value)
    r_tag = right.select(
        key, ts, F.struct(F.col(val_col).alias("v")).alias("_rv"), F.lit(0).alias("_side")
    )
    null_rv = F.lit(None).cast(r_tag.schema["_rv"].dataType)
    # single select per side (a withColumn-per-payload-column loop nests
    # one projection each — quadratic analysis on wide frames)
    l_u = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("_side"), null_rv.alias("_rv"), *l_cols
    )
    r_u = r_tag.select(
        key,
        ts,
        "_side",
        "_rv",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
    )
    unioned = l_u.unionByName(r_u)
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc(ts), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_asof", F.last("_rv", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("_side") == 1)
        .withColumn(out_col, F.col("_asof.v"))
        .drop("_side", "_rv", "_asof")
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    width_seconds: int = 600,
    left_prefix: str = "a_",
    right_prefix: str = "b_",
) -> DataFrame:
    """All (left, right) pairs with the same ``key`` where
    ``0 < right.ts - left.ts <= width_seconds``.

    Bin = floor(epoch/width).  A qualifying right row lands in the left
    row's bin or the next one, so probing two bins is exhaustive; the
    exact inequality refines after the equi-join."""
    def binify(df, prefix):
        return df.select(
            key,
            *[
                F.col(c).alias(f"{prefix}{c}")
                for c in df.columns
                if c != key
            ],
        )

    l = binify(left, left_prefix).withColumn(
        "_bin", F.floor(F.unix_timestamp(f"{left_prefix}{ts}") / width_seconds)
    )
    r = binify(right, right_prefix).withColumn(
        "_rbin", F.floor(F.unix_timestamp(f"{right_prefix}{ts}") / width_seconds)
    )
    probe = l.withColumn("_probe", F.explode(F.array(F.col("_bin"), F.col("_bin") + 1)))
    lts, rts = F.col(f"{left_prefix}{ts}"), F.col(f"{right_prefix}{ts}")
    return (
        probe.join(r, (probe["_probe"] == r["_rbin"]) & (probe[key] == r[key]))
        .drop(r[key])
        .filter((rts > lts) & (rts <= lts + F.expr(f"INTERVAL {width_seconds} SECONDS")))
        .drop("_bin", "_rbin", "_probe")
    )
