#!/usr/bin/env python3
"""Standing 10x scaling regression gate (r13 VERDICT item 3).

Measures every benched query at two generated scale factors (gen-sf0.1
and gen-sf1, tools/gen_sf.py) and FAILS if any query's runtime ratio
exceeds THRESHOLD on the 10x data — excluding the documented
exact-baseline tiers whose quadratic growth is contractual (each has a
sub-linear scale twin). This is the gate that would have caught the
four r13 scale defects (theil_sen overflow aside, the dhash/phash
Sigma|bucket|^2 miners, embed_two_nn's fixed stride, and
dedup_containment's corpus^2/vocab candidates) before a judge did.

Usage:
  python3 tools/scaling_gate.py --run [--out tools/scaling_r14]
      generate data (if missing), run the full bench at both SFs
      (uncontended box required), snapshot BENCH_DETAIL per SF into
      --out, then gate.
  python3 tools/scaling_gate.py --small S.json --big B.json [--prev DIR]
      gate existing snapshots; with --prev, also print ratio deltas vs
      a prior round's committed snapshots (regression watch).

Exit 0 = all ratios within bounds; exit 1 = at least one super-linear
query outside the exclusion list (listed on stdout).
"""
import argparse
import json
import os
import shutil
import subprocess
import sys

# A mechanically LINEAR query approaches the data factor (10x) as its
# fixed costs wash out, so the fail line sits just under it: genuinely
# super-linear plans (r13: containment 10.3x, dhash 84x, two_nn 15x)
# clear 9x decisively, while scan-bound linear queries (nb_classify
# 8.5x) don't get flagged for being cheap at the small SF.
THRESHOLD = 9.0
FACTOR = 10.0
# documented exact-baseline tiers: quadratic BY CONTRACT, each with a
# sub-linear scale twin that is the 100 TB path
EXCLUDE = {
    "ann_knn_join": "exact ground-truth tier; scale twin ann_knn_join_lsh",
    "dedup_embedding": "exact baseline tier; scale twin dedup_embedding_lsh",
}

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def times(d):
    return d.get("queries_min") or d["queries"]


def run_bench(sf_dir, snap_path):
    # disable the bench's history-based auto-requeue: history medians are
    # sf0.1-testdata numbers, meaningless on the gen legs (the 10x leg
    # would "requeue" the entire suite)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_BENCH_HISTORY="")
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"], cwd=REPO,
                   env=env, check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    shutil.copy(os.path.join(REPO, "BENCH_DETAIL.json"), snap_path)
    # the bench main overwrites the committed full-run snapshot; restore
    subprocess.run(["git", "checkout", "--", "BENCH_DETAIL.json"],
                   cwd=REPO, check=True)


def gate(small, big, prev_dir=None):
    s, b = times(small), times(big)
    shared = sorted(set(s) & set(b))
    rows = sorted(((b[q] / s[q], q, s[q], b[q]) for q in shared
                   if s[q] and s[q] > 0), reverse=True)
    prev = {}
    if prev_dir:
        try:
            ps = times(json.load(open(os.path.join(
                prev_dir, "BENCH_DETAIL_gen_sf0.1.json"))))
            pb = times(json.load(open(os.path.join(
                prev_dir, "BENCH_DETAIL_gen_sf1.json"))))
            prev = {q: pb[q] / ps[q] for q in set(ps) & set(pb)
                    if ps[q] and ps[q] > 0}
        except OSError:
            pass
    lines = ["| query | small s | big s | ratio | verdict |", "|---|---|---|---|---|"]
    failures = []
    for r, q, ts, tb in rows:
        if q in EXCLUDE:
            verdict = f"excluded ({EXCLUDE[q]})"
        elif r > THRESHOLD:
            verdict = "**FAIL super-linear**"
            failures.append((q, r))
        elif r > FACTOR / 2:
            verdict = "watch"
        else:
            verdict = "ok"
        delta = f" (prev {prev[q]:.1f}x)" if q in prev else ""
        lines.append(f"| {q} | {ts:.2f} | {tb:.2f} | {r:.1f}x{delta} | {verdict} |")
    tot_s = sum(s[q] for q in shared)
    tot_b = sum(b[q] for q in shared)
    lines.append("")
    lines.append(f"total: {tot_s:.1f}s -> {tot_b:.1f}s "
                 f"({tot_b / tot_s:.1f}x on {FACTOR:g}x data); "
                 f"{len(failures)} gate failures, "
                 f"{len(EXCLUDE)} contractual exclusions")
    return "\n".join(lines), failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--small")
    ap.add_argument("--big")
    ap.add_argument("--prev")
    ap.add_argument("--data", default="/tmp/gen")
    args = ap.parse_args()

    if args.run:
        out = args.out or "tools/scaling_run"
        os.makedirs(os.path.join(REPO, out), exist_ok=True)
        for sf, name in (("0.1", "sf0.1"), ("1", "sf1")):
            d = os.path.join(args.data, name)
            if not os.path.exists(os.path.join(d, "lineitem.parquet")):
                subprocess.run([sys.executable, "tools/gen_sf.py", sf, d],
                               cwd=REPO, check=True)
            snap = os.path.join(REPO, out, f"BENCH_DETAIL_gen_{name}.json")
            print(f"benching {d} -> {snap}", flush=True)
            run_bench(d, snap)
        args.small = os.path.join(REPO, out, "BENCH_DETAIL_gen_sf0.1.json")
        args.big = os.path.join(REPO, out, "BENCH_DETAIL_gen_sf1.json")
        table_path = os.path.join(REPO, out, "scaling_table.md")
    else:
        table_path = None

    small = json.load(open(args.small))
    big = json.load(open(args.big))
    table, failures = gate(small, big, args.prev)
    print(table)
    if table_path:
        with open(table_path, "w") as f:
            f.write(table + "\n")
        print(f"\nwrote {table_path}")
    if failures:
        print("\nGATE FAILED:", ", ".join(f"{q} {r:.1f}x" for q, r in failures))
        sys.exit(1)
    print("\ngate ok")


if __name__ == "__main__":
    main()
