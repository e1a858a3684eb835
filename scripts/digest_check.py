#!/usr/bin/env python3
"""Oracle side of the order-invariant cross-engine digest (r15; see
graft.tools.QueryDigest for the engine side and the formula): runs a
query's oracleSql in DuckDB, computes rows = COUNT(*) and digest =
SUM(60-bit md5 prefix of the comma-joined row in sorted-column order)
— WITHOUT materializing the output — and compares against the engine
JSON produced by QueryDigest. For outputs too large for
oracle_check.py --setcompare (the EXCEPT ALL multiset diff needs both
sides as temp tables; the digest streams).

Usage: digest_check.py <sfDir> <query> <engine_json_file> [oracle_sql_json]
  oracle_sql_json defaults to dumping SparkEntry.oracleSql is NOT
  available here; pass a Verify outDir's oracle_sql.json (any scale's
  dump works — the SQL is scale-independent).
Exit 0 on match, 1 on mismatch.
"""
import duckdb, json, sys, glob, os, re, time

def main():
    sf, query, engine_json = sys.argv[1], sys.argv[2], sys.argv[3]
    sql_file = sys.argv[4] if len(sys.argv) > 4 else None
    if sql_file is None:
        sys.exit("pass an oracle_sql.json path (from any graft.Verify dump)")
    sql = json.load(open(sql_file))[query]
    # The digest is order-invariant, but a trailing ORDER BY inside
    # the subquery makes DuckDB SORT the full output before the
    # aggregate — at 4.15B rows that spilled >67 GB of temp and died.
    # Strip the terminal ORDER BY (never semantically load-bearing
    # under an ungrouped aggregate) — UNLESS a LIMIT follows it
    # (ORDER BY ... LIMIT N is a top-N, where the order IS the
    # semantics; r16, ADVICE r15 #1 — the old pattern ate the LIMIT
    # too and digested the full result, a false FAIL on every
    # top-N-shaped oracle).
    sql = re.sub(r"ORDER BY(?:(?!LIMIT)[^)])*$", "", sql, flags=re.IGNORECASE)
    eng = json.loads(open(engine_json).read().strip())
    assert eng["query"] == query, f"engine json is for {eng['query']}"

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duck_digest'")
    con.execute("SET memory_limit='90GB'")
    # the digest doesn't care about row order; letting operators
    # reorder keeps the join → aggregate pipeline streaming
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET threads=16")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        if glob.glob(src) or os.path.isfile(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    coltypes = {r[0]: r[1] for r in con.execute(
        f"DESCRIBE SELECT * FROM ({sql}) LIMIT 0").fetchall()}
    # Canonical per-column rendering - byte-identical to QueryDigest's:
    #  - DOUBLE/FLOAT (r16): native double->string rules differ across
    #    engines (and printf tie-rounding differs), so decompose with
    #    pure IEEE arithmetic: floor(x) ':' floor((x-floor(x))*1e18+0.5)
    #    - every op is bit-deterministic and identical on both sides.
    #  - NULL sentinel per column (ADVICE r15 #4): concat_ws DROPS NULL
    #    arguments in both engines, so ('a', NULL) and ('a', '') would
    #    canonicalize identically. chr(1) mirrors QueryDigest's 0x01.
    def canon(c):
        if coltypes[c].upper() in ("DOUBLE", "FLOAT", "REAL"):
            d = f'CAST("{c}" AS DOUBLE)'
            return (f"concat(CAST(CAST(floor({d}) AS BIGINT) AS VARCHAR), ':', "
                    f"CAST(CAST(floor(({d} - floor({d})) * 1e18 + 0.5) AS BIGINT) AS VARCHAR))")
        return f'CAST("{c}" AS VARCHAR)'
    joined = "concat_ws(',', " + ", ".join(
        f"coalesce({canon(c)}, chr(1))" for c in sorted(coltypes)) + ")"
    # 60-bit md5 prefix, exactly QueryDigest's conv(substr(md5,1,15),16,10)
    rowhash = f"CAST(concat('0x', substr(md5({joined}), 1, 15)) AS BIGINT)"
    t0 = time.time()
    rows, digest = con.execute(
        f"SELECT count(*), coalesce(sum(CAST({rowhash} AS HUGEINT)), 0) FROM ({sql})"
    ).fetchone()
    # coalesce ↑ mirrors QueryDigest: an EMPTY result digests as "0"
    # on both sides instead of NULL-vs-None comparing unequal.
    ok = rows == eng["rows"] and str(digest) == eng["digest"]
    print(json.dumps({
        "query": query, "oracle_rows": rows, "oracle_digest": str(digest),
        "engine_rows": eng["rows"], "engine_digest": eng["digest"],
        "match": ok, "oracle_sec": round(time.time() - t0, 1)}))
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
