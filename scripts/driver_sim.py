"""Full driver-contract simulation at sf0.01: entry smoke + every
queries() entry vs its oracle_sql() (row count + schema + canonical
value compare), plus a pandas-dtype-kind parity check (the driver
hashes through pandas). Writes SELFCHECK.json. Run:
  python scripts/driver_sim.py [sf_dir] [out_json] [--only q105,q106]
(--only: comma-separated name prefixes; skips SELFCHECK rewrite unless
 every query runs)
"""
from __future__ import annotations

import datetime
import json
import math
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from streaming_recommendation_spark.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def canon_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted((tuple(canon(r[i]) for i in order) for r in rows), key=repr)


def main(sf_dir, out_path, only=None):
    spark = get_spark(app_name="driver-sim")
    smoke = E.entry(spark).collect()
    print(f"entry smoke: {len(smoke)} rows", flush=True)
    assert len(smoke) > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = E.oracle_sql()
    out = {}
    n_bad = 0
    selected = {
        name: fn
        for name, fn in E.queries().items()
        if only is None or any(name.startswith(p) for p in only)
    }
    for name, fn in selected.items():
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "dtype_match": None, "spark_rows": None, "oracle_rows": None,
               "err": None}
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = [c.lower() for c in sdf.columns]
            spark_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(spark_rows)
            if name not in oracles:
                rec["err"] = "no_oracle"
                out[name] = rec
                print(f"{name}: rows-only ({len(spark_rows)} rows)", flush=True)
                continue
            res = con.execute(oracles[name])
            duck_cols = [d[0].lower() for d in res.description]
            duck_rows = res.fetchall()
            rec["oracle_rows"] = len(duck_rows)
            rec["rows_match"] = len(spark_rows) == len(duck_rows)
            rec["schema_match"] = sorted(spark_cols) == sorted(duck_cols)
            s = canon_rows(spark_cols, spark_rows)
            d = canon_rows(duck_cols, duck_rows)
            rec["hash_match"] = s == d
            # full conversion, not a limit() sample: a nullable int
            # column whose first null appears late flips int64->float64
            # only on the full result — exactly the class this checks
            sp_pd = sdf.toPandas()
            du_pd = con.execute(oracles[name]).df()
            sp_k = {c.lower(): sp_pd[c].dtype.kind for c in sp_pd.columns}
            du_k = {c.lower(): du_pd[c].dtype.kind for c in du_pd.columns}
            rec["dtype_match"] = sp_k == du_k
        except Exception as e:
            rec["err"] = f"{type(e).__name__}: {e}"
        ok = (rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
              and rec["dtype_match"]) or rec["err"] == "no_oracle"
        if not ok:
            n_bad += 1
        print(f"{name}: {'OK' if ok else 'FAIL ' + str({k: v for k, v in rec.items() if v not in (True, None)})}",
              flush=True)
        out[name] = rec
    if only is None:
        json.dump(out, open(out_path, "w"), indent=1)
        dest = out_path
    else:
        dest = "(subset run, SELFCHECK not rewritten)"
    print(f"done: {len(out)} queries, {n_bad} failing -> {dest}", flush=True)
    return 1 if n_bad else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1].split(",")
        args = args[:i] + args[i + 2:]
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "SELFCHECK.json"
    raise SystemExit(main(sf, out, only))
