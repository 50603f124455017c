"""One-shot audit: for every registry oracle, compare the pandas dtypes
of the Spark result (toPandas) against DuckDB's .df() — the driver's
value-hash goes through pandas, so a DuckDB HUGEINT (-> float64) vs a
Spark BIGINT (-> int64) hashes differently even when values are equal
(the q20 round-2 red row). Prints every column whose dtype kind
differs; exit code 1 if any.

Run: python scripts/audit_oracle_dtypes.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from streaming_recommendation_spark.queries import registry  # noqa: E402
from streaming_recommendation_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main(sf_dir: str) -> int:
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = 0
    for name, q in registry().items():
        if q.oracle is None:
            continue
        try:
            spdf = q.fn(spark, sf_dir).toPandas()
            ddf = con.execute(q.oracle).df()
        except Exception as e:  # pragma: no cover - audit tool
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            bad += 1
            continue
        sp = {c.lower(): spdf[c].dtype for c in spdf.columns}
        du = {c.lower(): ddf[c].dtype for c in ddf.columns}
        for col in sorted(set(sp) | set(du)):
            a, b = sp.get(col), du.get(col)
            if a is None or b is None:
                print(f"{name}.{col}: missing on one side (spark={a}, duck={b})")
                bad += 1
            elif a.kind != b.kind:
                print(f"{name}.{col}: spark={a} duck={b}")
                bad += 1
    print(f"audit done: {bad} dtype mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
