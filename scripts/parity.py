#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB correctness compare.

Usage: python3 scripts/parity.py <sfDir> <verifyOutDir>
  (run `sbt "runMain graft.Verify <sfDir> <out>"` first)

For each query dumped by graft.Verify: run its oracle SQL in DuckDB over the
same parquet tables, sort columns by name (as the driver does), and compare
row-by-row values. Exit nonzero if any DIFF.
"""
import sys, os, json, math
import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        dump = os.path.join(out_dir, name)
        if not os.path.isdir(dump):
            print(f"[MISS] {name}: no spark dump"); n_bad += 1; continue
        try:
            duck = con.execute(sql)
            dcols = [c[0] for c in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}"); n_bad += 1; continue
        try:
            sp = con.execute(f"SELECT * FROM read_parquet('{dump}/*.parquet')")
            scols = [c[0] for c in sp.description]
            srows = sp.fetchall()
        except Exception as e:
            print(f"[DUMP-ERR] {name}: {e}"); n_bad += 1; continue
        if sorted(dcols) != sorted(scols):
            print(f"[COLS] {name}: spark={sorted(scols)} duck={sorted(dcols)}")
            n_bad += 1; continue
        # sort columns by name (driver discipline)
        dperm = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sperm = sorted(range(len(scols)), key=lambda i: scols[i])
        dr = [tuple(norm(r[i]) for i in dperm) for r in drows]
        sr = [tuple(norm(r[i]) for i in sperm) for r in srows]
        if len(dr) != len(sr):
            print(f"[ROWS] {name}: spark={len(sr)} duck={len(dr)}"); n_bad += 1; continue
        diff = next((i for i, (a, b) in enumerate(zip(sr, dr)) if a != b), None)
        if diff is not None:
            print(f"[DIFF] {name}: first diff at row {diff}")
            print(f"   cols : {sorted(dcols)}")
            print(f"   spark: {sr[diff]}")
            print(f"   duck : {dr[diff]}")
            n_bad += 1
        else:
            print(f"[OK] {name} ({len(sr)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
