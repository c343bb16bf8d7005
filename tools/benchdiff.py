#!/usr/bin/env python3
"""Dev-only bench-noise discipline: diff two bench_full.json artifacts.

Usage: python3 tools/benchdiff.py OLD.json NEW.json [ratio_flag=2.0]

Prints per-query deltas sorted by absolute regression, flags queries whose
NEW time exceeds ratio_flag x OLD (the round-12 verdict's "re-run quiet
before accepting a noisy artifact" check), and summarizes added/removed
queries so a total-time move can be attributed to surface growth vs real
regressions vs host weather.
"""
import json
import sys

old = json.load(open(sys.argv[1]))["queries"]
new = json.load(open(sys.argv[2]))["queries"]
flag = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

common = sorted(set(old) & set(new))
added = sorted(set(new) - set(old))
removed = sorted(set(old) - set(new))

deltas = [(new[q] - old[q], q) for q in common]
deltas.sort(reverse=True)
flagged = [q for d, q in deltas if old[q] > 0.05 and new[q] > flag * old[q]]

print(f"common={len(common)} added={len(added)} removed={len(removed)}")
print(f"sum(old common)={sum(old[q] for q in common):.1f}s "
      f"sum(new common)={sum(new[q] for q in common):.1f}s "
      f"sum(added)={sum(new[q] for q in added):.1f}s")
print("\nworst deltas (new-old, s):")
for d, q in deltas[:12]:
    print(f"  {d:+6.2f}  {q}  ({old[q]:.2f} -> {new[q]:.2f})")
print("\nbest deltas:")
for d, q in deltas[-6:]:
    print(f"  {d:+6.2f}  {q}  ({old[q]:.2f} -> {new[q]:.2f})")
if added:
    print(f"\nadded: {', '.join(f'{q}={new[q]:.2f}' for q in added)}")
if removed:
    print(f"removed: {', '.join(removed)}")
print(f"\nflagged (> {flag}x): {flagged or 'none'}")
sys.exit(0)
