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
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_type(t: pa.DataType) -> str:
    """Normalize an Arrow type to the equivalence class the driver's hash
    respects. String/large_string and tz/unit differences on timestamps are
    representation-only; integer widths, float widths, and decimal-vs-int are
    NOT (DuckDB sum(INTEGER) -> HUGEINT -> decimal128(38,0) was the entire
    round-1 failure class and must be flagged here)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{norm_type(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct<" + ",".join(f"{f.name}:{norm_type(f.type)}" for f in t) + ">"
    if pa.types.is_map(t):
        return f"map<{norm_type(t.key_type)},{norm_type(t.item_type)}>"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    return str(t)


def schema_problems(spark_tbl: pa.Table, duck_tbl: pa.Table) -> list:
    st = {f.name: norm_type(f.type) for f in spark_tbl.schema}
    dt = {f.name: norm_type(f.type) for f in duck_tbl.schema}
    probs = []
    # Scalar-only gate: the DRIVER's harness sorts rows by all columns in
    # pandas before hashing, and ndarray cells are unhashable — a list/
    # struct/map output column errors there even when values are right
    # (round 2: q_dedup_clusters, q_inverted_index). canon_cell below keeps
    # THIS gate able to compare such columns, so without this check the
    # local gate is laxer than the driver exactly where it hurts.
    for name, tbl in (("spark", spark_tbl), ("duck", duck_tbl)):
        for f in tbl.schema:
            if pa.types.is_nested(f.type):
                probs.append(
                    f"non-scalar {name} column {f.name}: {norm_type(f.type)}"
                    " (driver's row-sort hash cannot process; stringify via"
                    " array_join)")
    for name in sorted(set(st) & set(dt)):
        if st[name] != dt[name]:
            probs.append(f"dtype {name}: spark={st[name]} duck={dt[name]}")
    return probs


def canon_cell(v):
    """List/array cells -> tuples so rows containing them sort and hash
    (pandas sort_values factorizes object columns; ndarray is unhashable)."""
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(canon_cell(x) for x in v)
    return v


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(canon_cell)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(
            values_equal(x, y) for x, y in zip(a, b))
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
            spark_tbl = pq.read_table(res_dir)
            spark_df = spark_tbl.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        try:
            duck_tbl = con.execute(sql).arrow()
            duck_df = duck_tbl.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # Dtype-strict gate first: pandas flattens DuckDB HUGEINT to float64
        # and 5 == 5.0 passes, so value compare alone is blind to the type
        # mismatch the driver's hash catches. Compare Arrow types directly.
        problems = schema_problems(spark_tbl, duck_tbl)
        if not problems:
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
