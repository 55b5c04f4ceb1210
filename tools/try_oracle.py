#!/usr/bin/env python3
"""Prototype harness for a candidate oracle SQL: compare a DuckDB query
against an existing Verify dump directory with check.py's norm rules.

Usage: python3 tools/try_oracle.py <sfDir> <verifyOutDir> <queryName> <sqlFile>
"""
import sys, os, glob
import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(__file__))
from check import norm, TABLES


def main(sf_dir, out_dir, name, sql_file):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    sql = open(sql_file).read()
    duck_df = con.execute(sql).fetchdf()
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"SCHEMA_MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
        return 1
    if len(a) != len(b):
        print(f"ROWS_MISMATCH spark={len(a)} duck={len(b)}")
        print("spark head:\n", a.head(), "\nduck head:\n", b.head())
        return 1
    if a.equals(b):
        print(f"PASS rows={len(a)}")
        return 0
    # mirror check.py's float tolerance (atol=1e-9 after the 9-dp
    # rounding in norm) so a 1-ulp difference doesn't reject an oracle
    # the real gate would accept
    import numpy as np
    close = pd.DataFrame(index=a.index)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            close[c] = np.isclose(a[c], b[c], rtol=0, atol=1e-9,
                                  equal_nan=True)
        else:
            close[c] = (a[c] == b[c]) | (a[c].isna() & b[c].isna())
    if close.all(axis=None):
        print(f"PASS_ULP rows={len(a)}")
        return 0
    neq = ~close
    bad = neq.any(axis=1)
    print(f"VALUE_MISMATCH rows={bad.sum()}")
    print("spark:\n", a[bad].head(10))
    print("duck:\n", b[bad].head(10))
    # dtype diagnostics
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            print(f"dtype {c}: spark={a[c].dtype} duck={b[c].dtype}")
    return 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:5]))
