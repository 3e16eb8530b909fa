#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran (or runs it
with --run). Loads each result parquet, runs the corresponding oracle SQL in
DuckDB over views named after the testdata tables, then compares: columns
sorted by name, rows sorted by all columns, values compared exactly (floats
via bit pattern after round-trip through float64).
"""
import json
import math
import sys
import subprocess
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list:
    problems = []
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        problems.append(f"columns differ: spark={list(s.columns)} duck={list(d.columns)}")
        return problems
    if len(s) != len(d):
        problems.append(f"row count differs: spark={len(s)} duck={len(d)}")
        return problems
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if not values_equal(a, b)]
        if bad:
            i, a, b = bad[0]
            problems.append(f"col {col}: {len(bad)} mismatches, first at row {i}: spark={a!r} duck={b!r}")
    return problems


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = Path(args[1] if len(args) > 1 else "/tmp/verify_out")
    if "--run" in sys.argv:
        subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", check=True)

    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = out_dir / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark result written")
            n_fail += 1
            continue
        try:
            spark_df = pd.read_parquet(res_dir)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_df, duck_df)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1

    # queries without oracle get a rows-only note
    for name in sorted(p.name for p in out_dir.iterdir() if p.is_dir()):
        if name not in oracle:
            try:
                n = len(pd.read_parquet(out_dir / name))
                print(f"NOTE {name}: no oracle, rows={n}")
            except Exception as e:
                print(f"NOTE {name}: no oracle, unreadable: {e}")

    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
