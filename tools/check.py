#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, read the Spark result parquet, sort columns by
name + rows, and compare schema/rowcount/values exactly."""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

ok = fail = 0
for name in sorted(oracle):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: spark output missing"); fail += 1; continue
    try:
        got = canon(con.sql(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df())
        exp = canon(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}"); fail += 1; continue
    probs = []
    if list(got.columns) != list(exp.columns):
        probs.append(f"cols spark={list(got.columns)} oracle={list(exp.columns)}")
    elif [str(t) for t in got.dtypes] != [str(t) for t in exp.dtypes]:
        probs.append(f"dtypes spark={[str(t) for t in got.dtypes]} oracle={[str(t) for t in exp.dtypes]}")
    if len(got) != len(exp):
        probs.append(f"rows spark={len(got)} oracle={len(exp)}")
    if not probs:
        if not got.equals(exp):
            neq = [c for c in got.columns if not got[c].equals(exp[c])]
            detail = []
            for c in neq[:3]:
                mask = ~(got[c].eq(exp[c]) | (got[c].isna() & exp[c].isna()))
                i = mask.idxmax()
                detail.append(f"{c}[{i}]: spark={got[c][i]!r} oracle={exp[c][i]!r}")
            probs.append("values differ: " + "; ".join(detail))
    if probs:
        print(f"FAIL {name}: " + " | ".join(probs)); fail += 1
    else:
        print(f"OK   {name} ({len(got)} rows)"); ok += 1

no_oracle = [os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
             if os.path.isdir(p) and os.path.basename(p) not in oracle]
print(f"\n{ok} ok, {fail} fail, {len(no_oracle)} rows-only ({', '.join(sorted(no_oracle))})")
sys.exit(1 if fail else 0)
