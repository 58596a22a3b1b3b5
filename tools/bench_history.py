#!/usr/bin/env python3
"""Append a round's per-query bench numbers to tools/bench_history.csv.

Makes regression adjudication a diff instead of an archaeology dig:
each row is (round, query, median_sec, min_sec). Sources:
  - BENCH_DETAIL.json (full per-query median + min maps), or
  - BENCH_rNN.json driver snapshots (slowest-64 medians only; min
    column left empty when the round predates minima collection).

Usage: python3 tools/bench_history.py ROUND FILE.json
Idempotent per round: re-running replaces that round's rows.
"""
import csv
import json
import os
import sys


def rows_from(round_tag: str, path: str):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver BENCH_rNN.json wrapper
        d = d["parsed"]
    meds = d.get("queries", {})
    mins = d.get("queries_min", {})
    for q in sorted(meds):
        yield [round_tag, q, f"{meds[q]:.3f}",
               f"{mins[q]:.3f}" if q in mins else ""]


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    round_tag, path = sys.argv[1], sys.argv[2]
    csv_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_history.csv")
    existing = []
    if os.path.exists(csv_path):
        with open(csv_path) as f:
            existing = [r for r in csv.reader(f)
                        if r and r[0] not in ("round", round_tag)]
    new = list(rows_from(round_tag, path))
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["round", "query", "median_sec", "min_sec"])
        w.writerows(existing)
        w.writerows(new)
    print(f"{csv_path}: {len(existing)} kept, {len(new)} added for {round_tag}")


if __name__ == "__main__":
    main()
