#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Run graft.Verify first (writes <out>/<name>/ parquet + oracle_sql.json),
then this script re-runs each oracle SQL in DuckDB over the same sf dir and
compares: row count, column set, and exact values (columns sorted by name,
rows sorted by all columns).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOut> \
           [--emit CORRECTNESS.json] [query ...]

Optional query names restrict the check (local iteration aid — e.g. the
sf0.1 sweep, where some oracles are O(n2) in DuckDB and a full pass is
impractical; the driver's gate runs at sf0.01).

--emit writes the driver-format per-query map (rows_match/schema_match/
hash_match/spark_rows/oracle_rows/err) so the round's CORRECTNESS_r{N}
.json can be produced locally. The write FAILS LOUDLY if the map would
be empty or smaller than oracle_sql.json (round 14 shipped a literal
`{}` as its correctness artifact and nothing noticed until the judge).
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


def main(sf_dir: str, out_dir: str, only=(), emit=None) -> int:
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
    report = {}
    for name, sql in sorted(oracle.items()):
        if name in failures:
            # Verify recorded an execution failure — report it as an
            # explicit err row instead of a confusing missing-parquet IO
            # error (or, worse, silence)
            print(f"err  {name}: {failures[name][:200]}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None, "err": failures[name][:500]}
            n_bad += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')"
            ).df())
            want = canon(con.execute(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None, "err": str(e)[:500]}
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
        schema_ok = list(got.columns) == list(want.columns)
        rows_ok = len(got) == len(want)
        report[name] = {"rows_match": rows_ok, "schema_match": schema_ok,
                        "hash_match": not problems,
                        "spark_rows": int(len(got)),
                        "oracle_rows": int(len(want)),
                        "err": "; ".join(problems)[:500] or None}
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    if emit:
        # the r14 lesson: an empty/undersized correctness artifact must be
        # an ERROR, never a silently-committed {}
        if not report or len(report) < len(oracle):
            print(f"REFUSING to write {emit}: map has {len(report)} entries "
                  f"for {len(oracle)} oracles")
            return 2
        with open(emit, "w") as f:
            json.dump(report, f, indent=0, sort_keys=True)
            f.write("\n")
        print(f"wrote {emit} ({len(report)} entries)")
    return 1 if n_bad else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    emit = None
    if "--emit" in argv:
        i = argv.index("--emit")
        emit = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0], argv[1], tuple(argv[2:]), emit))
