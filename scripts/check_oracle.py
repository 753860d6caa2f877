#!/usr/bin/env python3
"""Dev-only local oracle check (mirrors the driver's t2 gate).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB over the sf parquet tables,
loads the corresponding Spark parquet dump, sorts columns by name and
rows by value, and compares. Not part of the Scala deliverable.
"""
import json, sys, glob, os
import pyarrow.parquet  # preload the .so BEFORE duckdb: a large
# materialized-CTE oracle can exhaust the process mmap budget and a
# lazy pyarrow import then fails to map its shared object
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if isinstance(v, (list, dict, bytes)) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING spark output: {name}")
            n_fail += 1
            continue
        try:
            duck = canon(con.execute(sql).df())
        except Exception as e:
            print(f"ORACLE ERROR {name}: {e}")
            n_fail += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in spark_files], ignore_index=True))
        if list(duck.columns) != list(got.columns):
            print(f"FAIL {name}: columns duck={list(duck.columns)} spark={list(got.columns)}")
            n_fail += 1
            continue
        if len(duck) != len(got):
            print(f"FAIL {name}: rows duck={len(duck)} spark={len(got)}")
            n_fail += 1
            continue
        # value compare with tolerance-free string canon (matches a hash compare)
        mism = []
        for c in duck.columns:
            a, b = duck[c], got[c]
            try:
                eq = (a.astype(str) == b.astype(str))
            except Exception:
                eq = a == b
            if not eq.all():
                i = (~eq).idxmax()
                mism.append((c, a[i], b[i]))
        if mism:
            print(f"FAIL {name}: value mismatches {mism[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(duck)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
