#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ (Spark parquet) and <verifyOutDir>/oracle_sql.json,
runs each SQL in DuckDB with the sf tables registered as views, and compares
(schema-insensitively: columns sorted by name, rows sorted, values hashed).
Dev tool only — the shipped library has no Python dependency.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # Sort FIRST, on raw values — the driver's comparator sorts before any
    # stringification and throws on unsortable cells (numpy.ndarray in an
    # object column, the r16 qc_session_report failure). Stringifying
    # before the sort masked exactly that class of driver failure.
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_path, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_bad += 1; continue
        eq = True
        for c in got.columns:
            a, b = got[c].values, want[c].values
            if np.issubdtype(got[c].dtype, np.floating):
                ok = ((a == b) | (np.isnan(a) & np.isnan(b))).all()
            else:
                ok = (a == b).all()
            if not ok:
                idx = np.where(~((a == b) if not np.issubdtype(got[c].dtype, np.floating)
                                 else ((a == b) | (np.isnan(a) & np.isnan(b)))))[0][:3]
                print(f"FAIL {name}: col {c} differs at rows {idx.tolist()}: "
                      f"spark={a[idx]} oracle={b[idx]}")
                eq = False
        if eq:
            print(f"ok   {name} ({len(got)} rows)"); n_ok += 1
        else:
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
