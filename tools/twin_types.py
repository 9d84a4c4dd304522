#!/usr/bin/env python3
"""DEV-ONLY harness (not part of the engine): type-audit the DuckDB twins.

Usage: python3 tools/twin_types.py <sfDir> <verifyOutDir> [query ...]

DESCRIBEs every twin SQL in oracle_sql.json against the sf parquet tables and
flags result columns DuckDB types as HUGEINT (sum over INTEGER) or DECIMAL —
the driver's pandas bridge renders those as float64/object and the hash check
against Spark's int64/float64 fails even when values are equal. Every flagged
column needs an explicit CAST in the twin (and a matching Spark-side type).
"""
import json, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD = ("HUGEINT", "DECIMAL", "UHUGEINT")

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            cols = con.sql(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_bad += 1
            continue
        flagged = [(c[0], c[1]) for c in cols if any(b in c[1] for b in BAD)]
        if flagged:
            n_bad += 1
            print(f"FLAG {name}: {flagged}")
    print(f"-- {n_bad} twins flagged of {len(oracle)}")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
