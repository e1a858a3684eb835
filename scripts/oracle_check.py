#!/usr/bin/env python3
"""Local pre-check mimicking the driver's t2 DuckDB oracle compare.

Usage:
  python3 scripts/oracle_check.py <sfDir> <outDir> [query ...]

Expects <outDir> to already contain Verify output:
  <outDir>/<name>/  (spark parquet dir, coalesced to 1 file)
  <outDir>/oracle_sql.json

For each query: runs the oracle SQL in DuckDB 1.0 (tables registered
as views over {sfDir}/<table>.parquet), loads the Spark parquet, sorts
columns by name (as the driver does), and compares row-by-row values.
Exit code = number of mismatching queries.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            failures += 1
            continue
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns oracle={sorted(exp_cols)} spark={sorted(got_cols)}")
            failures += 1
            continue
        # driver sorts columns by name before hashing values
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        e = [tuple(norm(r[i]) for i in eidx) for r in exp_rows]
        g = [tuple(norm(r[i]) for i in gidx) for r in got_rows]
        if len(e) != len(g):
            print(f"FAIL {name}: rows oracle={len(e)} spark={len(g)}")
            failures += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(e, g)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(e)} rows differ; first at row {i}:")
            print(f"  cols   : {sorted(exp_cols)}")
            print(f"  oracle : {a}")
            print(f"  spark  : {b}")
            failures += 1
        else:
            print(f"OK   {name}: {len(e)} rows")
    sys.exit(min(failures, 125))


if __name__ == "__main__":
    main()
