#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB oracle compare.

Usage:
  python3 scripts/check.py [sfDir] [outDir]

Reads each parquet result written by `sbt "runMain graft.Verify <sfDir> <outDir>"`,
runs the corresponding oracle SQL from oracle_sql.json in DuckDB against the
testdata tables, sorts columns by name and rows by all columns, and compares
values exactly. Reports per-query PASS/FAIL with diagnostics.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # decimals / dates → canonical str; floats stay floats
            pass
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list:
    problems = []
    s, o = normalize(spark_df), normalize(oracle_df)
    if list(s.columns) != list(o.columns):
        problems.append(f"columns differ: spark={list(s.columns)} oracle={list(o.columns)}")
        return problems
    if len(s) != len(o):
        problems.append(f"row counts differ: spark={len(s)} oracle={len(o)}")
        return problems
    for c in s.columns:
        sv, ov = s[c], o[c]
        if str(sv.dtype) != str(ov.dtype):
            problems.append(f"col {c}: dtype spark={sv.dtype} oracle={ov.dtype}")
        try:
            if sv.dtype == "float64" or ov.dtype == "float64":
                a = sv.astype(float).to_numpy()
                b = ov.astype(float).to_numpy()
                both_nan = pd.isna(a) & pd.isna(b)
                neq = ~(both_nan | (a == b))
                if neq.any():
                    i = int(neq.argmax())
                    problems.append(
                        f"col {c}: {int(neq.sum())} mismatches; first at row {i}: "
                        f"spark={a[i]!r} oracle={b[i]!r} diff={abs(a[i]-b[i]) if not (math.isnan(a[i]) or math.isnan(b[i])) else 'nan'}")
            else:
                sa = sv.map(lambda x: None if pd.isna(x) else str(x))
                oa = ov.map(lambda x: None if pd.isna(x) else str(x))
                neq = ~(sa.eq(oa) | (sa.isna() & oa.isna()))
                if neq.any():
                    i = int(pd.Series(neq).idxmax())
                    problems.append(
                        f"col {c}: {int(neq.sum())} mismatches; first at row {i}: "
                        f"spark={sa[i]!r} oracle={oa[i]!r}")
        except Exception as e:  # noqa: BLE001
            problems.append(f"col {c}: compare error {e}")
    return problems


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle_sql = json.loads((OUT_DIR / "oracle_sql.json").read_text())
    errors_path = OUT_DIR / "errors.json"
    verify_errors = json.loads(errors_path.read_text()) if errors_path.exists() else {}

    n_pass = n_fail = 0
    result_dirs = sorted(p for p in OUT_DIR.iterdir() if p.is_dir())
    for rd in result_dirs:
        name = rd.name
        if name in verify_errors:
            print(f"ERR  {name}: {verify_errors[name]}")
            n_fail += 1
            continue
        try:
            spark_df = pd.read_parquet(rd)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if "__verify_error" in spark_df.columns:
            print(f"ERR  {name}: error marker present (see errors.json)")
            n_fail += 1
            continue
        if name not in oracle_sql:
            status = "ROWS" if len(spark_df) > 0 else "EMPTY!"
            print(f"{status} {name}: no oracle, {len(spark_df)} rows")
            continue
        try:
            oracle_df = con.execute(oracle_sql[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_df, oracle_df)
        if problems:
            n_fail += 1
            print(f"FAIL {name}:")
            for p in problems[:6]:
                print(f"   {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(spark_df)} rows)")
    # a query that errored AND whose __verify_error marker write also
    # failed produces no result dir — surface it from errors.json (with
    # the error detail) so the failure is never silent; queries covered
    # here are excluded from the plain 'missing' report below so a
    # single broken query is counted once
    dir_names = {p.name for p in result_dirs}
    ghost = set(verify_errors) - dir_names
    for g in sorted(ghost):
        print(f"ERR  {g}: {verify_errors[g]} (no result dir written)")
        n_fail += 1
    missing = set(oracle_sql) - dir_names - ghost
    for m in sorted(missing):
        print(f"FAIL {m}: oracle declared but no spark output")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
