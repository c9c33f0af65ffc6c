#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with every
fixture table registered as a view over <sfDir>/<table>.parquet, and
compares: column names (sorted), row counts, and values (rows sorted by all
columns; floats compared with tolerance AND exactly, so we see which).
"""
import sys, json, glob, math, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def rows_key(row):
    return tuple(str(x) for x in row)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL  {name}: no parquet output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"ROWS  {name}: rows={len(got)} (no oracle)")
            n_rowsonly += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL  {name}: columns {gc} != {ec}")
            n_fail += 1
            continue
        got_s, exp_s = got[gc], exp[gc]
        if len(got_s) != len(exp_s):
            print(f"FAIL  {name}: rows {len(got_s)} != {len(exp_s)}")
            n_fail += 1
            continue
        g_rows = [tuple(canon(v) for v in r) for r in got_s.itertuples(index=False)]
        e_rows = [tuple(canon(v) for v in r) for r in exp_s.itertuples(index=False)]
        exact_ordered = g_rows == e_rows
        exact_sorted = sorted(g_rows, key=rows_key) == sorted(e_rows, key=rows_key)
        if exact_ordered:
            print(f"PASS  {name}: rows={len(g_rows)}")
            n_pass += 1
        elif exact_sorted:
            print(f"PASS* {name}: rows={len(g_rows)} (order differs!)")
            n_pass += 1
        else:
            n_fail += 1
            # find first diff
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(g_rows, e_rows)) if a != b]
            print(f"FAIL  {name}: rows={len(g_rows)}, {len(diffs)} differing rows; first 3:")
            for i, a, b in diffs[:3]:
                print(f"      row {i}: got={a}")
                print(f"      row {i}: exp={b}")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
