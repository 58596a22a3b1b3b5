#!/usr/bin/env python3
"""Append a round's per-query bench numbers to tools/bench_history.csv.

Makes regression adjudication a diff instead of an archaeology dig:
each row is (round, query, median_sec, min_sec, calib_sec, median_wu,
min_wu). The *_wu columns are WORK UNITS — seconds divided by the
round's own calibration job — which cancel the host factor: a fresh VM
shifts every row's seconds but not its work units, so the requeue
thresholds built from this history stay comparable across hosts
(r17 fix; pre-r17 rows may carry empty wu columns and the bench then
falls back to the seconds rule for those queries).

Sources:
  - BENCH_DETAIL.json (full per-query median + min maps + calib_sec), or
  - BENCH_rNN.json driver snapshots (slowest-64 medians only; min
    column left empty when the round predates minima collection).

Usage: python3 tools/bench_history.py ROUND FILE.json
Idempotent per round: re-running replaces that round's rows.
"""
import csv
import json
import os
import sys

COLS = ["round", "query", "median_sec", "min_sec", "calib_sec",
        "median_wu", "min_wu"]


def rows_from(round_tag: str, path: str):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver BENCH_rNN.json wrapper
        d = d["parsed"]
    meds = d.get("queries", {})
    mins = d.get("queries_min", {})
    calib = d.get("calib_sec")
    for q in sorted(meds):
        med_wu = f"{meds[q] / calib:.3f}" if calib else ""
        min_wu = f"{mins[q] / calib:.3f}" if calib and q in mins else ""
        yield [round_tag, q, f"{meds[q]:.3f}",
               f"{mins[q]:.3f}" if q in mins else "",
               f"{calib:.3f}" if calib else "", med_wu, min_wu]


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
        w.writerow(COLS)
        w.writerows(existing)
        w.writerows(new)
    print(f"{csv_path}: {len(existing)} kept, {len(new)} added for {round_tag}")


if __name__ == "__main__":
    main()
