#!/usr/bin/env python3
"""Dev-only replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir] [skip1,skip2,...]

Runs each oracle SQL from oracle_sql.json against the testdata parquet and
compares with the parquet the Spark Verify main dumped. NOT part of the Scala
library — mirrors the driver harness so failures surface before round end.

The optional third arg skips named queries. `graph_cc`/`graph_cc_incr` no
longer need it: their recursive-CTE DuckDB oracles (which materialize a
transitive closure that explodes past 100 GB on the sf0.1 giant component)
are replaced here by a Python union-find over the identical DuckDB-derived
edge list (PY_ORACLES below), so the full sweep runs them at every SF.
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


# ---------------------------------------------------------------------------
# Python oracles for the two connected-components queries. Their DuckDB
# recursive-CTE twins materialize the full transitive closure (reach is
# O(|component|^2) rows), which explodes past 100 GB on the sf0.1 giant
# component; a union-find over the same edge list is O(E alpha(V)) and runs
# in seconds at any SF. The edge derivation (2-item co-purchase orders) is
# done IN DuckDB so both engines read the identical pair set; only the
# closure is replaced.
# ---------------------------------------------------------------------------
EDGE_SQL = """SELECT l_orderkey % 10 AS lane,
                     min(l_partkey) AS a, max(l_partkey) AS b
              FROM lineitem GROUP BY l_orderkey
              HAVING count(*) = 2 AND min(l_partkey) <> max(l_partkey)"""


def _components(pairs):
    """Union-find; returns {vertex: min vertex of its component}."""
    parent = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the root IS the component label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {v: find(v) for v in parent}


def _py_graph_cc(con):
    e = con.execute(EDGE_SQL).fetchnumpy()
    comp = _components(zip(e["a"].tolist(), e["b"].tolist()))
    rows = sorted(comp.items())
    return pd.DataFrame({"part": [p for p, _ in rows],
                         "comp": [c for _, c in rows]}).astype("int64")


def _py_graph_cc_incr(con):
    e = con.execute(EDGE_SQL).fetchnumpy()
    pairs = list(zip(e["lane"].tolist(), e["a"].tolist(), e["b"].tolist()))
    before = _components((a, b) for l, a, b in pairs if l != 7)
    after = _components((a, b) for l, a, b in pairs)
    rows = [(p, before.get(p), c) for p, c in sorted(after.items())
            if before.get(p) != c]
    return pd.DataFrame(
        {"part": pd.array([r[0] for r in rows], dtype="int64"),
         "comp_before": pd.array([r[1] for r in rows], dtype="Int64"),
         "comp_after": pd.array([r[2] for r in rows], dtype="int64")})


PY_ORACLES = {"graph_cc": _py_graph_cc, "graph_cc_incr": _py_graph_cc_incr}
fails, passed = [], 0
for name in sorted(oracle):
    sql = oracle[name]
    rd = f"{out}/{name}"
    try:
        if not glob.glob(f"{rd}/*.parquet"):
            fails.append((name, "no spark output")); continue
        s = con.execute(f"SELECT * FROM '{rd}/*.parquet'").fetchdf()
        d = PY_ORACLES[name](con) if name in PY_ORACLES \
            else con.execute(sql).fetchdf()
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
