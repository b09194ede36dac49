"""CLI runner: execute any declared query by name against a data dir.

  python -m politician_etl_project_spark list
  python -m politician_etl_project_spark run q01_pricing_summary --sf /root/testdata/sf0.01 -n 20
  python -m politician_etl_project_spark explain q_ann_lsh --sf /root/testdata/sf0.001
  python -m politician_etl_project_spark oracle q01_pricing_summary   # print the DuckDB SQL twin
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="politician_etl_project_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list declared queries")
    for c in ("run", "explain", "oracle"):
        p = sub.add_parser(c)
        p.add_argument("name")
        p.add_argument("--sf", default="/root/testdata/sf0.01")
        if c == "run":
            p.add_argument("-n", type=int, default=20, help="rows to show")
    args = ap.parse_args(argv)

    from politician_etl_project_spark.queries import load_all

    specs = load_all()
    if args.cmd == "list":
        for name, spec in specs.items():
            print(f"{name:32s} {' '.join(spec.ops or ())}")
        return 0
    if args.name not in specs:
        print(f"unknown query {args.name!r}; `list` shows all {len(specs)}", file=sys.stderr)
        return 2
    if args.cmd == "oracle":
        print(specs[args.name].oracle or "(no SQL oracle — see the query docstring)")
        return 0

    from politician_etl_project_spark.session import get_spark

    spark = get_spark(f"cli-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = specs[args.name].fn(spark, args.sf)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.n, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
