#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped library is pure Scala/Spark). Runs DuckDB on the oracle SQL dumped
by graft.Verify and compares with the Spark parquet outputs:
columns sorted by name, rows sorted, values normalized, then compared.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
from itertools import zip_longest
import duckdb

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # repr-level compare; engines should be bit-identical by design
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_rows_only = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        g_cols, g_rows = canon(got.fetchall(), got.columns)
        if name not in oracle:
            print(f"ROWS  {name}: {len(g_rows)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            want = con.sql(oracle[name])
            w_cols, w_rows = canon(want.fetchall(), want.columns)
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        if g_cols != w_cols:
            print(f"FAIL  {name}: cols {g_cols} != {w_cols}")
            n_fail += 1
        elif g_rows != w_rows:
            # zip_longest: plain zip truncates to the shorter side, hiding
            # extra/missing rows when the counts differ
            diffs = [(a, b) for a, b in zip_longest(g_rows, w_rows) if a != b]
            print(f"FAIL  {name}: {len(g_rows)}/{len(w_rows)} rows, "
                  f"{len(diffs)} mismatched; first: {diffs[:2] if diffs else (g_rows[:1], w_rows[:1])}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(g_rows)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
