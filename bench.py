"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed (collect) after a warm-up pass of the
catalog; per-query time includes planning + execution, matching how the
reference's 1-2 s BigQuery analytical band is measured (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from politician_etl_project_spark.session import get_spark
from politician_etl_project_spark.queries import load_all

# Headline set: scan-agg, selective join top-k, star join, pushdown scalar —
# the shapes that dominate at 100 TB.  Extended per round as operators land.
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_volume",
    "q06_forecast_revenue",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    names = [n for n in BENCH_QUERIES if n in specs]

    # JVM/codegen warm-up on the smallest table so q1 doesn't pay startup cost
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    times: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_suite_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
