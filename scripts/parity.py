#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB correctness compare.

Usage: python3 scripts/parity.py <sfDir> <verifyOutDir>
  (run `sbt "runMain graft.Verify <sfDir> <out>"` first)

For each query dumped by graft.Verify: run its oracle SQL in DuckDB over the
same parquet tables, sort columns by name (as the driver does), and compare
row-by-row values. Exit nonzero if any DIFF.

Round 13 (VERDICT r12 #2): values alone are not enough — the driver hashes
TYPED results, so a DuckDB HUGEINT (e.g. sum(BIGINT)) vs a Spark int64 dump
hash-mismatches even when every value is identical (both arrive in Python as
`int`, so fetchall() comparison said [OK] while the driver said FAIL —
win_range_banded, round 12). We therefore also DESCRIBE both sides and
compare canonicalized type names. Canonicalization mirrors what the driver's
hash is actually sensitive to: int widths (INTEGER vs BIGINT — e.g. DuckDB
ntile() is BIGINT while Spark's is int32) and float widths collapse, but
HUGEINT and DECIMAL stay distinct → a [TYPE] failure.
"""
import sys, os, json, math, re
import duckdb

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def canon_type(t):
    """Collapse type spellings the driver's hash treats as equal; keep the
    ones it distinguishes (HUGEINT, DECIMAL) verbatim."""
    t = t.upper()
    # U? : DuckDB's unsigned widths (UTINYINT..UBIGINT) hash like their
    # signed spellings too; HUGEINT/UHUGEINT stay distinct (no \b between
    # U and TINYINT would otherwise never match — hence the explicit U?).
    t = re.sub(r"\bU?(TINYINT|SMALLINT|INTEGER|BIGINT)\b", "INT", t)
    t = re.sub(r"\b(REAL|FLOAT|DOUBLE)\b", "FLOAT", t)
    t = re.sub(r"\bTIMESTAMP(_NS|_MS|_S)?( WITH TIME ZONE)?\b", "TIMESTAMP", t)
    return t

def describe_types(con, sql):
    """column -> canonical DuckDB type for an arbitrary SELECT."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: canon_type(r[1]) for r in rows}

def main(sf_dir, out_dir, types_only=False):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    n_ok = n_bad = 0
    if types_only:
        # Static oracle-type audit (no Verify dump needed beyond
        # oracle_sql.json): Spark can NEVER emit an int128, so a
        # HUGEINT/UHUGEINT output column in an oracle is always a bug
        # (sum(<integer>) without CAST — the win_range_banded class).
        for name in sorted(oracle):
            try:
                dtypes = describe_types(con, oracle[name])
            except Exception as e:
                print(f"[ORACLE-ERR] {name}: {e}"); n_bad += 1; continue
            bad = {c: t for c, t in dtypes.items() if "HUGEINT" in t}
            if bad:
                print(f"[TYPE] {name}: un-Spark-representable oracle output "
                      f"{bad} — wrap the integer sum in CAST(... AS BIGINT)")
                n_bad += 1
            else:
                n_ok += 1
        print(f"\n[types-only] {n_ok} ok, {n_bad} bad")
        return 1 if n_bad else 0
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
        # typed-hash faithfulness: DESCRIBE both sides, canonical compare
        try:
            dtypes = describe_types(con, sql)
            stypes = describe_types(
                con, f"SELECT * FROM read_parquet('{dump}/*.parquet')")
        except Exception as e:
            print(f"[TYPE-ERR] {name}: {e}"); n_bad += 1; continue
        tmism = [(c, stypes[c], dtypes[c]) for c in sorted(dtypes)
                 if c in stypes and stypes[c] != dtypes[c]]
        if tmism:
            for c, st, dt in tmism:
                print(f"[TYPE] {name}.{c}: spark={st} duck={dt} "
                      "(typed driver hash WILL mismatch even if values agree)")
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sys.exit(main(args[0], args[1], types_only="--types-only" in sys.argv))
