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
import os
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


def set_compare(con, name, sql, out_dir):
    """Order-invariant compare for corpus-sized outputs (r14 heavy-row
    sweep): materialize both sides as DuckDB temp tables and diff them
    with EXCEPT ALL in BOTH directions — exact multiset equality
    (NULL-safe, duplicate-aware) without fetching millions of rows
    into Python. Row ORDER is deliberately not checked here; use the
    default positional path for order-sensitive small outputs."""
    con.execute(f"CREATE OR REPLACE TEMP TABLE _exp AS ({sql})")
    con.execute("CREATE OR REPLACE TEMP TABLE _got AS "
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
    def cols_of(t):
        return dict(con.execute(
            "SELECT column_name, data_type FROM information_schema.columns "
            f"WHERE table_name = '{t}'").fetchall())
    exp_t, got_t = cols_of("_exp"), cols_of("_got")
    if sorted(exp_t) != sorted(got_t):
        print(f"FAIL {name}: columns oracle={sorted(exp_t)} spark={sorted(got_t)}")
        return "fail_schema"
    n_exp = con.execute("SELECT count(*) FROM _exp").fetchone()[0]
    n_got = con.execute("SELECT count(*) FROM _got").fetchone()[0]
    if n_exp != n_got:
        print(f"FAIL {name}: rows oracle={n_exp} spark={n_got}")
        return "fail_rows"
    cols = sorted(got_t)
    # cast the oracle side to the parquet side's types so e.g. a
    # DECIMAL-typed oracle aggregate compares against the DOUBLE the
    # engine wrote under the same value-equality the driver uses
    sel_exp = ", ".join(f'CAST("{c}" AS {got_t[c]}) AS "{c}"' for c in cols)
    sel_got = ", ".join(f'"{c}"' for c in cols)
    only_exp = con.execute(
        f"SELECT count(*) FROM (SELECT {sel_exp} FROM _exp "
        f"EXCEPT ALL SELECT {sel_got} FROM _got)").fetchone()[0]
    only_got = con.execute(
        f"SELECT count(*) FROM (SELECT {sel_got} FROM _got "
        f"EXCEPT ALL SELECT {sel_exp} FROM _exp)").fetchone()[0]
    if only_exp or only_got:
        print(f"FAIL {name}: multiset diff oracle-only={only_exp} spark-only={only_got} of {n_exp}")
        return "fail_values"
    print(f"OK   {name}: {n_exp} rows (set-compare)")
    return f"ok_set:{n_exp}"


def main():
    argv = list(sys.argv[1:])
    json_out = None
    set_names = set()
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: oracle_check.py [--json OUT] [--setcompare q1,q2] <sfDir> <outDir> [query ...]")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    if "--setcompare" in argv:
        i = argv.index("--setcompare")
        if i + 1 >= len(argv):
            sys.exit("usage: oracle_check.py [--json OUT] [--setcompare q1,q2] <sfDir> <outDir> [query ...]")
        set_names = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    if len(argv) < 2:
        sys.exit("usage: oracle_check.py [--json OUT] [--setcompare q1,q2] <sfDir> <outDir> [query ...]")
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        # fixture tables are single files; GenScale outputs (e.g. the
        # 10x /tmp/graft_sf1) are Spark directories -- glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if name in set_names:
            try:
                results[name] = set_compare(con, name, sql, out_dir)
            except Exception as e:
                print(f"FAIL {name}: exception {e}")
                results[name] = "fail_exception"
            if results[name].startswith("fail"):
                failures += 1
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
            results[name] = "fail_exception"
            failures += 1
            continue
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns oracle={sorted(exp_cols)} spark={sorted(got_cols)}")
            results[name] = "fail_schema"
            failures += 1
            continue
        # driver sorts columns by name before hashing values
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        e = [tuple(norm(r[i]) for i in eidx) for r in exp_rows]
        g = [tuple(norm(r[i]) for i in gidx) for r in got_rows]
        if len(e) != len(g):
            print(f"FAIL {name}: rows oracle={len(e)} spark={len(g)}")
            results[name] = "fail_rows"
            failures += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(e, g)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(e)} rows differ; first at row {i}:")
            print(f"  cols   : {sorted(exp_cols)}")
            print(f"  oracle : {a}")
            print(f"  spark  : {b}")
            results[name] = "fail_values"
            failures += 1
        else:
            print(f"OK   {name}: {len(e)} rows")
            results[name] = f"ok:{len(e)}"
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "out_dir": out_dir,
                       "n_checked": len(results), "n_fail": failures,
                       "queries": results}, f, indent=1, sort_keys=True)
    sys.exit(min(failures, 125))


if __name__ == "__main__":
    main()
