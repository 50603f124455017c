"""Dump .explain("formatted") for a list of queries to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> <suffix> q178,q188,...
Writes plans/<tag>/<short>_<suffix>.txt for each query (short id =
name up to the first underscore). Construction runs jobs for the
ITERATIVE operators — that is fine, we only need the final plan.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from streaming_recommendation_spark.queries import queries  # noqa: E402
from streaming_recommendation_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(tag: str, suffix: str, names: list[str]) -> None:
    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    full = {n.split("_", 1)[0]: n for n in qs}
    os.makedirs(f"plans/{tag}", exist_ok=True)
    for short in names:
        name = full[short]
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = f"plans/{tag}/{short}_{suffix}.txt"
        with open(out, "w") as fh:
            fh.write(f"# {name} @ {SF_DIR}\n")
            fh.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3].split(","))
