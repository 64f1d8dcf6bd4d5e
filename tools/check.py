#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, creates DuckDB views over the sf
tables, runs each oracle, loads the corresponding spark parquet dump,
sorts columns by name + rows by all values, and compares cell-exact.
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
            duck_df = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok_shape = spark_df.shape == duck_df.shape
        ok_cols = list(spark_df.columns) == list(duck_df.columns)
        # dtype drift (e.g. int64 vs float64 from a HUGEINT-promoted SUM)
        # breaks the driver's value hashing even when astype(object) ==
        # passes (1000 == 1000.0 in object space) — it is a FAIL here so
        # the local gate can never pass what the driver's hash fails
        dtype_drift = []
        if ok_cols:
            dtype_drift = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
                           for c in spark_df.columns
                           if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
        if not (ok_shape and ok_cols):
            print(f"FAIL {name}: shape spark={spark_df.shape} duck={duck_df.shape} "
                  f"cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1
            continue
        # cell-exact comparison (mirrors the driver's value hashing)
        try:
            eq = spark_df.astype(object).where(pd.notna(spark_df), None) \
                .equals(duck_df.astype(object).where(pd.notna(duck_df), None))
        except Exception:
            eq = False
        if eq and dtype_drift:
            print(f"FAIL {name}: dtype drift {dtype_drift} "
                  f"(values equal but the driver's hash differs)")
            n_fail += 1
        elif eq:
            print(f"PASS {name} ({spark_df.shape[0]} rows)")
            n_pass += 1
        else:
            diff = (spark_df != duck_df) & ~(spark_df.isna() & duck_df.isna())
            bad = diff.any(axis=1)
            drift = f" (dtype drift {dtype_drift} — likely root cause)" if dtype_drift else ""
            print(f"FAIL {name}: value mismatch in {int(bad.sum())}/{len(spark_df)} rows{drift}")
            merged = pd.concat(
                [spark_df[bad].head(3).add_prefix("spark_"),
                 duck_df[bad].head(3).add_prefix("duck_")], axis=1)
            print(merged.to_string())
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
