"""Measure the DISTRIBUTED connected-components branch at sizes that
actually engage it (r8 verdict #3: every bench fixture falls under the
1M-edge driver threshold, so the star-rounds branch had correctness
property tests but no wall-clock evidence).

Builds deterministic synthetic edge sets (no RNG: ids are arithmetic,
extra edges come from xxhash64) with the star algorithm's worst-ish
shape — long chains, where naive min-label propagation would need
O(chain length) rounds — plus hash-attached cross links, then times:

- the distributed alternating-star path (driver_threshold=0) at sizes
  ABOVE the 1M default threshold, recording rounds-to-convergence;
- the driver union-find path FORCED at the same sizes (threshold on),
  giving the measured crossover;
- agreement of both paths (component count + xxhash of assignment).

Run: python tools/measure_cc.py   (prints a markdown table for SCALE.md)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from politician_etl_project_spark.operators.components import (  # noqa: E402
    connected_components,
)

CHAIN_LEN = 1_000  # component diameter: the anti-naive-propagation case


def build_edges(spark: SparkSession, n_edges: int):
    """~n_edges deterministic edges: 90% chain links (i -> i+1 inside
    1000-node blocks) + 10% hash-derived intra-block shortcuts."""
    n_chain = int(n_edges * 0.9)
    chain = (
        spark.range(n_chain)
        .filter((F.col("id") + 1) % CHAIN_LEN != 0)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    n_extra = n_edges - n_chain
    extra = spark.range(n_extra).select(
        (F.col("id") * 10).alias("id_a"),
        # shortcut to a pseudo-random node in the SAME block (keeps the
        # component structure = blocks, so expected counts are exact)
        (
            (F.col("id") * 10 / CHAIN_LEN).cast("long") * CHAIN_LEN
            + F.abs(F.xxhash64("id")) % CHAIN_LEN
        ).alias("id_b"),
    )
    return chain.union(extra)


def assignment_digest(comp) -> tuple[int, int, int]:
    row = comp.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("component").alias("k"),
        F.coalesce(F.expr("bit_xor(xxhash64(node, component))"), F.lit(0)).alias("h"),
    ).first()
    return (row["n"], row["k"], row["h"])


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    print("| edges | path | wall (s) | star rounds | components |")
    print("|---|---|---|---|---|")
    for n_edges in (2_000_000, 8_000_000):
        edges = build_edges(spark, n_edges).cache()
        edges.count()  # materialize input off the clock

        import politician_etl_project_spark.operators.components as cc_mod

        rounds = {"n": 0}
        orig_small = cc_mod._small_star

        def counting_small(e, _orig=orig_small, _r=rounds):
            _r["n"] += 1
            return _orig(e)

        cc_mod._small_star = counting_small
        try:
            t0 = time.time()
            dist = connected_components(edges, driver_threshold=0)
            d_dist = assignment_digest(dist)
            t_dist = time.time() - t0
        finally:
            cc_mod._small_star = orig_small

        t0 = time.time()
        drv = connected_components(edges, driver_threshold=n_edges + 1)
        d_drv = assignment_digest(drv)
        t_drv = time.time() - t0

        agree = "agree" if d_dist == d_drv else f"MISMATCH {d_dist} vs {d_drv}"
        print(
            f"| {n_edges:,} | distributed star | {t_dist:.1f} | {rounds['n']} "
            f"| {d_dist[1]:,} |"
        )
        print(f"| {n_edges:,} | driver union-find | {t_drv:.1f} | — | {d_drv[1]:,} ({agree}) |")
        edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
