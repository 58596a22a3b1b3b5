#!/usr/bin/env python3
"""Compare two BENCH_DETAIL.json files query by query.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [threshold_ratio]

Prints queries whose median moved more than threshold_ratio (default
1.5x) in either direction, plus totals, error deltas, and the contention
sentinel of each run — so a regression is attributable to code, data, or
a contended host before anyone stares at per-query noise.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main(old_path, new_path, threshold=1.5):
    old, new = load(old_path), load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"old: {old.get('value')}s / {old.get('n_queries')} queries"
          f" (err {old.get('n_err', '?')}, contended {old.get('contended', '?')},"
          f" calib {old.get('calib_sec', '?')})")
    print(f"new: {new.get('value')}s / {new.get('n_queries')} queries"
          f" (err {new.get('n_err', '?')}, contended {new.get('contended', '?')},"
          f" calib {new.get('calib_sec', '?')})")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): " + ", ".join(
            f"{k}={nq[k]}s" for k in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(
            f"{k}={oq[k]}s" for k in removed))
    for label, errs in (("old", old.get("errs", {})), ("new", new.get("errs", {}))):
        if errs:
            print(f"{label} errors: " + ", ".join(errs))
    moved = []
    for k in sorted(set(oq) & set(nq)):
        a, b = oq[k], nq[k]
        if a <= 0 or b <= 0:
            continue
        ratio = b / a
        # ignore sub-100ms wiggle: scheduler noise, not signal
        if (ratio >= threshold or ratio <= 1 / threshold) and abs(b - a) >= 0.1:
            moved.append((ratio, k, a, b))
    for ratio, k, a, b in sorted(moved, key=lambda x: -abs(x[3] - x[2])):
        arrow = "SLOWER" if ratio > 1 else "faster"
        print(f"{arrow} {ratio:5.2f}x  {k}: {a}s -> {b}s")
    if not moved:
        print(f"no common query moved beyond {threshold}x")
    common = set(oq) & set(nq)
    if common:
        tot_a = sum(oq[k] for k in common)
        tot_b = sum(nq[k] for k in common)
        print(f"common-query total: {tot_a:.1f}s -> {tot_b:.1f}s"
              f" ({tot_b / tot_a:.2f}x)")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    try:
        main(sys.argv[1], sys.argv[2],
             float(sys.argv[3]) if len(sys.argv) > 3 else 1.5)
    except BrokenPipeError:  # piped into head — not an error
        sys.exit(0)
