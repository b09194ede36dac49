"""Isolated clean-capture measurement for any benched entry (r9 verdict
#8: the clean-bench protocol, the CC-at-size and streaming-floor tools
each had their own invocation lore; this is the ONE command that
reproduces any SCALE.md "Measured" claim).

Protocol (the same discipline SCALE.md's clean captures document):
  1. load gate: wait (bounded, 10 min) until the 1-minute load average
     falls under 0.2 — stricter than bench.py's suite gate because a
     single query has no self-load excuse;
  2. fresh SparkSession in THIS process only (no other queries ran
     before it besides the explicit warm-up);
  3. one discarded warm-up run, then min of 3 timed runs with
     clearCache() between them.

Run:  python tools/isolate.py q_dedup_incremental [q_pagerank ...]
      python tools/isolate.py --gate 0.5 etl_fec_500k
Flags: --gate L (override the 0.2 load gate), --sf DIR (default
$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1).
Emits one JSON line per query and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _gate(threshold: float, max_wait: int = 600) -> float:
    waited = 0
    load = os.getloadavg()[0]
    while load > threshold and waited < max_wait:
        print(
            json.dumps({"load_gate_waiting": round(load, 2), "waited_sec": waited}),
            file=sys.stderr,
        )
        time.sleep(15)
        waited += 15
        load = os.getloadavg()[0]
    return load


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--gate", type=float, default=0.2)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    start_load = _gate(args.gate)

    import bench
    from politician_etl_project_spark.queries import load_all
    from politician_etl_project_spark.session import get_spark

    spark = get_spark("isolate")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__

    __spark_entry__._ensure_shipped(spark)
    specs = load_all()
    overrides = bench._bench_sf_override()

    results: dict[str, float] = {}
    for name in args.queries:
        if name == "etl_fec_500k":
            bench.bench_etl(spark)  # warm-up
            runs = [bench.bench_etl(spark)[0] for _ in range(args.runs)]
        elif name == "metrics_bundle_parts_sum":
            # _bench_bundle_parts already applies warm-up + min-of-2;
            # repeat it for the min-of-N
            runs = [bench._bench_bundle_parts(spark, args.sf) for _ in range(args.runs)]
        elif name in specs:
            q_dir = overrides.get(name, args.sf)
            specs[name].fn(spark, q_dir).collect()  # warm-up
            spark.catalog.clearCache()
            runs = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                specs[name].fn(spark, q_dir).collect()
                runs.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
        else:
            print(json.dumps({"query": name, "error": "not in registry"}))
            continue
        results[name] = min(runs)
        print(
            json.dumps(
                {"query": name, "sec": min(runs), "runs": runs, "sf_dir": overrides.get(name, args.sf)}
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "protocol": "isolated-clean-capture",
                "load_gate": args.gate,
                "load_avg_start": round(start_load, 2),
                "load_gate_ok": start_load <= args.gate,
                "results": results,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
