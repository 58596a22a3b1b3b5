#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Run graft.Verify first (writes <out>/<name>/ parquet + oracle_sql.json),
then this script re-runs each oracle SQL in DuckDB over the same sf dir and
compares: row count, column set, and exact values (columns sorted by name,
rows sorted by all columns).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOut> [query ...]

Optional query names restrict the check (local iteration aid — e.g. the
sf0.1 sweep, where some oracles are O(n2) in DuckDB and a full pass is
impractical; the driver's gate runs at sf0.01).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        # IMPORTANT: plain sort_values, exactly like the driver's harness —
        # it raises on unhashable cells (numpy arrays), so any output shape
        # that would crash the driver crashes HERE first. Do not add a
        # key=astype(str): that silently passes outputs the driver rejects.
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str, only=()) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    try:
        failures = json.load(open(f"{out_dir}/_failures.json"))
    except FileNotFoundError:
        failures = {}
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if name in failures:
            # Verify recorded an execution failure — report it as an
            # explicit err row instead of a confusing missing-parquet IO
            # error (or, worse, silence)
            print(f"err  {name}: {failures[name][:200]}")
            n_bad += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')"
            ).df())
            want = canon(con.execute(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        problems = []
        if list(got.columns) != list(want.columns):
            problems.append(f"cols {list(got.columns)} != {list(want.columns)}")
        elif len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        else:
            for c in got.columns:
                a, b = got[c], want[c]
                try:
                    same = (a.astype(str) == b.astype(str)).all()
                except Exception:  # noqa: BLE001
                    same = False
                if not same:
                    bad = (a.astype(str) != b.astype(str))
                    i = bad.idxmax()
                    problems.append(
                        f"col {c}: first diff row {i}: {a[i]!r} != {b[i]!r} "
                        f"({int(bad.sum())} diffs)")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
