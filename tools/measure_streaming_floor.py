"""Measure the live streaming queries' fixed cost and its levers
(r8 verdict #7: q_stream_interval_join_live / q_stateful_totals_live are
the suite's #2/#3 entries at ~5.2/4.5 s and ~95% of that is state-store
commit bookkeeping at KB scale — the 8-partition pin already bought 4x;
find out whether RocksDB or fewer partitions shave the rest, or record
the measured floor).

Each variant times the FULL declared query (staging cached, so the
measured cost is the streaming run itself) twice and reports the min.

Run: python tools/measure_streaming_floor.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def timed(spark, name, fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn(spark, SF).collect()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    import politician_etl_project_spark.queries.events as ev
    from politician_etl_project_spark.queries import load_all

    specs = load_all()
    targets = ["q_stateful_totals_live", "q_stream_interval_join_live"]

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm: builds the staged inputs + JVM
    for t in targets:
        specs[t].fn(spark, SF).collect()

    orig_pin = ev._pinned_state_partitions
    print("| variant | " + " | ".join(targets) + " |")
    print("|---|---|---|")

    import contextlib

    def pin_n(n):
        @contextlib.contextmanager
        def _pin(spark_, n_default=8):
            with orig_pin(spark_, n):
                yield
        return _pin

    for label, n_parts, extra_conf in [
        ("baseline: 8 state partitions, HDFS-backed store", 8, {}),
        ("4 state partitions", 4, {}),
        ("2 state partitions", 2, {}),
        ("1 state partition", 1, {}),
        ("8 partitions + RocksDB provider", 8,
         {"spark.sql.streaming.stateStore.providerClass": ROCKSDB}),
        ("8 partitions + async progress off / no-data batch off", 8,
         {"spark.sql.streaming.noDataMicroBatches.enabled": "false"}),
    ]:
        prev = {}
        for k, v in extra_conf.items():
            try:
                prev[k] = spark.conf.get(k)
            except Exception:
                prev[k] = None
            spark.conf.set(k, v)
        ev._pinned_state_partitions = pin_n(n_parts)
        try:
            times = [timed(spark, t, specs[t].fn) for t in targets]
        finally:
            ev._pinned_state_partitions = orig_pin
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
        print("| " + label + " | " + " | ".join(f"{s:.2f} s" for s in times) + " |", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
