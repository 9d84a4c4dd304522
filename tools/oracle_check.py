#!/usr/bin/env python3
"""DEV-ONLY harness (not part of the engine): mimic the driver's t2 check.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

For each query result parquet written by `graft.Verify`, run the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf parquet tables,
canonicalize both sides (columns sorted by name, rows sorted, doubles
rounded), and diff.
"""
import json, math, os, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            rr.append((str(type(v).__name__) if v is not None else "none", str(v)))
        out.append(tuple(rr))
    return sorted(out)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    # big-fixture sweeps OOM'd at default limits when JVMs shared the box;
    # cap the oracle so it degrades to spilling instead of failing
    con.execute("SET memory_limit = '32GB'")
    con.execute("SET threads = 16")
    # spill outside the repo (the default is ./.tmp, which left 57 GB of
    # duckdb_temp_storage files in the working tree during the sf1 sweep)
    con.execute("SET temp_directory = '/tmp/duckdb_oracle_spill'")
    for t in TABLES:
        # driver testdata ships single files; GenScale fixtures are
        # Spark-written DIRECTORIES named <t>.parquet — glob those
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    times = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols, got = got_rel.columns, got_rel.fetchall()
            exp_rel = con.sql(sql)
            exp_cols, exp = exp_rel.columns, exp_rel.fetchall()
        except Exception as e:
            times[name] = time.time() - t0
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            times[name] = time.time() - t0
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        cg, ce = canon(got, got_cols), canon(exp, exp_cols)
        times[name] = time.time() - t0
        if cg == ce:
            print(f"PASS {name} ({len(got)} rows, {times[name]:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {len(got)} rows vs {len(exp)} rows")
            diff_g = [r for r in cg if r not in set(ce)][:3]
            diff_e = [r for r in ce if r not in set(cg)][:3]
            for r in diff_g:
                print(f"   spark-only: {r}")
            for r in diff_e:
                print(f"   duck-only:  {r}")
    print(f"== {n_pass} pass / {n_fail} fail, "
          f"{sum(times.values()):.1f}s oracle wall ==")
    print("slowest twins:")
    for n, s in sorted(times.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {s:7.1f}s  {n}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
