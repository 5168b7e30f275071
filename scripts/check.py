#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped library is pure Scala/Spark). Runs DuckDB on the oracle SQL dumped
by graft.Verify and compares with the Spark parquet outputs:
columns sorted by name, rows sorted, values normalized, then compared.

DTYPE-FAITHFUL (r16): the driver materializes both sides as pandas frames
and its hash is dtype-sensitive — an uncast DuckDB HUGEINT (e.g. a SUM or
`//` chain) arrives as float64 and hash-fails against Spark's int64 even
when every value is numerically equal (that is exactly how r15's q202
shipped red). So this gate now (a) fetches both sides via .df() and
compares per-column pandas dtypes, and (b) normalizes values FROM the
pandas frame so 2375343.0 (float64) != 2375343 (int64) fails loudly here
before it can fail on the driver.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
from itertools import zip_longest
import duckdb

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # repr-level compare; engines should be bit-identical by design.
        # An int64-vs-float64 dtype slip also shows up here ("1" vs "1.0").
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def canon(rel):
    """Canonicalize a DuckDB relation the way the driver does: through a
    pandas frame (dtype-sensitive), columns sorted by name, rows sorted."""
    df = rel.df()
    cols = list(df.columns)
    dtypes = {c: str(df[c].dtype) for c in cols}
    order = sorted(cols)
    # .tolist() converts numpy scalars to Python values; NULL-bearing int
    # columns become float64 on BOTH sides (both go through DuckDB→pandas),
    # so only genuine oracle-vs-Spark dtype divergence trips the gate.
    lists = [df[c].tolist() for c in order]
    rows = [tuple(norm(v) for v in vals) for vals in zip(*lists)]
    rows.sort()
    return order, rows, dtypes

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
        g_cols, g_rows, g_dt = canon(con.sql(f"SELECT * FROM '{qdir}/*.parquet'"))
        if name not in oracle:
            print(f"ROWS  {name}: {len(g_rows)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            w_cols, w_rows, w_dt = canon(con.sql(oracle[name]))
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        if g_cols != w_cols:
            print(f"FAIL  {name}: cols {g_cols} != {w_cols}")
            n_fail += 1
        elif g_dt != w_dt:
            bad = {c: (g_dt[c], w_dt[c]) for c in g_cols if g_dt[c] != w_dt[c]}
            print(f"FAIL  {name}: dtype mismatch (spark, oracle): {bad}")
            # the dtype branch fires BEFORE the row compare, so also show
            # the first differing rows (r16 ADVICE): an int64-vs-float64
            # mismatch is usually either a missing CAST in the oracle OR a
            # one-sided NULL promoting pandas int64 to float64 — the row
            # diff tells which
            diffs = [(a, b) for a, b in zip_longest(g_rows, w_rows) if a != b]
            if diffs:
                print(f"      first differing rows (spark, oracle): {diffs[:2]}")
            else:
                print("      rows normalize equal — dtype-only divergence "
                      "(missing CAST, or a one-sided NULL promoting int64 "
                      "to float64)")
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
