#!/usr/bin/env python3
"""Per-query scaling ratios between two BENCH_DETAIL snapshots.

Usage: python3 tools/scaling_report.py SMALL.json BIG.json [factor]

SMALL/BIG are BENCH_DETAIL.json files from graft.Bench runs at two
scale factors (e.g. generated sf0.1 and sf1, factor 10). Prints a
markdown table ranked by ratio (worst scaling first), using per-query
minima when present (queries_min) else medians. Queries whose ratio
exceeds the data growth factor are flagged — their plans grow
super-linearly and deserve a look before a 100× deployment.
"""
import json
import sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0


def times(d):
    return d.get("queries_min") or d["queries"]


s, b = times(small), times(big)
shared = sorted(set(s) & set(b))
rows = []
for q in shared:
    if s[q] and s[q] > 0:
        rows.append((b[q] / s[q], q, s[q], b[q]))
rows.sort(reverse=True)

print(f"| query | small s | big s | ratio | vs {factor:g}x data |")
print("|---|---|---|---|---|")
for r, q, ts, tb in rows:
    flag = "SUPER-LINEAR" if r > factor else ("sublinear" if r < 1.5 else "ok")
    print(f"| {q} | {ts:.2f} | {tb:.2f} | {r:.1f}x | {flag} |")

tot_s = sum(s[q] for q in shared)
tot_b = sum(b[q] for q in shared)
n_super = sum(1 for r, *_ in rows if r > factor)
print(f"\ntotal: {tot_s:.1f}s -> {tot_b:.1f}s "
      f"({tot_b / tot_s:.1f}x on {factor:g}x data); "
      f"{n_super}/{len(rows)} queries super-linear")
