#!/usr/bin/env python3
"""Standalone parity check for the DuckDB XXH64 kernel mirror
(graft.queries.XxhSql) against Spark's XXH64 — independent of the entry
oracles, so a kernel regression is localized here before it shows up as
three opaque hash mismatches in the gate.

The Scala probe emits ONE runnable statement with the Spark-computed
truth inlined (byte-length ladder across every XXH64 code path — empty,
byte tail, 8-byte words, the 4-byte chunk, 32-byte 4-lane stripes — at
five seeds); this script executes it and asserts h == want per case.

Usage:
    sbt "runMain graft.tools.XxhProbe sql" > /tmp/xxh_kernel.sql
    python3 tools/check_xxh64.py /tmp/xxh_kernel.sql
(strip sbt log lines first if capturing with a logger; the probe's
output starts at the WITH RECURSIVE line.)
"""
import sys
import duckdb

def main(path):
    raw = open(path).read()
    # tolerate sbt noise around the statement
    start = raw.find("WITH RECURSIVE")
    if start < 0:
        print("no WITH RECURSIVE statement found in", path)
        return 1
    sql = raw[start:]
    end = sql.find("[success]")
    if end > 0:
        sql = sql[:end]
    rows = duckdb.connect().execute(sql).fetchall()
    bad = [r for r in rows if r[1] != r[2]]
    print(f"xxh64 kernel: {len(rows) - len(bad)}/{len(rows)} cases match")
    for r in bad[:10]:
        print(f"  MISMATCH gid={r[0]} want={r[1]} got={r[2]}")
    return 1 if bad or not rows else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/xxh_kernel.sql"))
