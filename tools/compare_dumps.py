#!/usr/bin/env python3
"""Compare two graft.Verify output dirs entry by entry (row multisets,
column names) — used for the ANSI-parity audit: a dump under
spark.sql.ansi.enabled=true must equal the ansi=false dump exactly.

Usage: python3 tools/compare_dumps.py <dirA> <dirB>
"""
import sys, os, glob
import duckdb

def main(a, b):
    con = duckdb.connect()
    names_a = {d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d))}
    names_b = {d for d in os.listdir(b) if os.path.isdir(os.path.join(b, d))}
    n_same = n_diff = 0
    for only, d in (("only in A", names_a - names_b), ("only in B", names_b - names_a)):
        for name in sorted(d):
            print(f"MISSING {name}: {only}")
            n_diff += 1
    for name in sorted(names_a & names_b):
        fa = glob.glob(os.path.join(a, name, "*.parquet"))
        fb = glob.glob(os.path.join(b, name, "*.parquet"))
        if not fa or not fb:
            print(f"EMPTY  {name}: a={len(fa)} b={len(fb)} files")
            n_diff += 1
            continue
        ra = con.execute(f"SELECT * FROM read_parquet({fa!r})").fetchall()
        rb = con.execute(f"SELECT * FROM read_parquet({fb!r})").fetchall()
        ca = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({fa!r})").fetchall()]
        cb = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({fb!r})").fetchall()]
        if ca != cb:
            print(f"SCHEMA {name}: {ca} vs {cb}")
            n_diff += 1
            continue
        sa = sorted(tuple(str(x) for x in r) for r in ra)
        sb = sorted(tuple(str(x) for x in r) for r in rb)
        if sa != sb:
            diffs = [(x, y) for x, y in zip(sa, sb) if x != y][:3]
            print(f"DIFF   {name}: rows {len(sa)} vs {len(sb)}; first diffs: {diffs}")
            n_diff += 1
        else:
            n_same += 1
    print(f"== {n_same} identical, {n_diff} different ==")
    return 1 if n_diff else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
