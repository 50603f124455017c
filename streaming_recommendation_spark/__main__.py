"""CLI: run registry queries, show results or plan audits.

    python -m streaming_recommendation_spark list
    python -m streaming_recommendation_spark run q01_pricing_summary
    python -m streaming_recommendation_spark run q12_asof_last_event --explain
    python -m streaming_recommendation_spark run q03_top_orders \
        --sf-dir /root/testdata/sf0.01 --limit 5
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="streaming_recommendation_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registry queries")

    runp = sub.add_parser("run", help="run one query")
    runp.add_argument("name")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--explain", action="store_true", help="print plan audit")

    args = p.parse_args(argv)

    from .queries import registry

    reg = registry()

    if args.cmd == "list":
        for name, q in sorted(reg.items()):
            kind = "oracle" if q.oracle else "rows-only"
            print(f"{name:36s} [{kind}] {q.doc.splitlines()[0] if q.doc else ''}")
        return 0

    if args.name not in reg:
        print(f"unknown query {args.name!r}; `list` shows options", file=sys.stderr)
        return 2

    from .session import get_spark

    spark = get_spark(app_name=f"cli-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    df = reg[args.name].fn(spark, args.sf_dir)

    if args.explain:
        from .plans import audit

        a = audit(df)
        plan = a.pop("plan")
        print(json.dumps(a, indent=2))
        print(plan)
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
