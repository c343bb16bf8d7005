#!/usr/bin/env python3
"""Dev-only replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir] [skip1,skip2,...]

Runs each oracle SQL from oracle_sql.json against the testdata parquet and
compares with the parquet the Spark Verify main dumped. NOT part of the Scala
library — mirrors the driver harness so failures surface before round end.

The optional third arg skips named queries: the sf0.1 full sweep needs
`graph_cc,graph_cc_incr` skipped (their recursive-CTE DuckDB oracles
materialize a transitive closure that explodes past 100 GB on the sf0.1
giant component; the driver gate runs them at sf0.01 where they are fine).
"""
import duckdb, json, sys, glob, os
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
for name in skip & set(oracle):
    print(f"SKIP {name}")
    del oracle[name]
fails, passed = [], 0
for name in sorted(oracle):
    sql = oracle[name]
    rd = f"{out}/{name}"
    try:
        if not glob.glob(f"{rd}/*.parquet"):
            fails.append((name, "no spark output")); continue
        s = con.execute(f"SELECT * FROM '{rd}/*.parquet'").fetchdf()
        d = con.execute(sql).fetchdf()
        s = s[sorted(s.columns)].reset_index(drop=True)
        d = d[sorted(d.columns)].reset_index(drop=True)
        if list(s.columns) != list(d.columns):
            fails.append((name, f"cols {list(s.columns)} vs {list(d.columns)}")); continue
        if len(s) != len(d):
            fails.append((name, f"rows {len(s)} vs {len(d)}")); continue
        bad = None
        for c in s.columns:
            a, b = s[c], d[c]
            if str(a.dtype) != str(b.dtype):
                # surface dtype drift but keep comparing values
                note = f"dtype {c}: {a.dtype} vs {b.dtype}"
            else:
                note = None
            av = a.astype(object).where(pd.notna(a), None)
            bv = b.astype(object).where(pd.notna(b), None)
            neq = [i for i in range(len(av)) if av[i] != bv[i]]
            if neq:
                i = neq[0]
                bad = f"col {c} row {i}: spark={av[i]!r} duck={bv[i]!r} ({len(neq)} diffs)"
                break
            if note:
                bad = bad or None
                print(f"WARN {name}: {note}")
        if bad:
            fails.append((name, bad)); continue
        passed += 1
        print(f"OK   {name} ({len(s)} rows)")
    except Exception as e:
        fails.append((name, f"error: {str(e)[:300]}"))

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{passed}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
