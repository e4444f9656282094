#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfdir> <verify_out_dir>

Reads each <name>/ parquet dir written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables registered as views over
the sf directory's parquet files), and compares: schema (column names),
row count, and exact values after sorting columns by name.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    con = duckdb.connect()
    df = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    con.close()
    return df

def norm(df):
    df = df[sorted(df.columns)]
    # canonicalize for hashing: stringify everything
    return df.astype(str).reset_index(drop=True)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(outdir)):
        if not os.path.isdir(f"{outdir}/{name}"):
            continue
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(spark_df)}"
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {str(e)[:200]}"
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(s.columns)} duck={list(d.columns)}"
        elif len(s) != len(d):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(s)} duck={len(d)}"
        elif not s.equals(d):
            neq = (s != d).any(axis=1)
            idx = list(s.index[neq])[:3]
            detail = []
            for i in idx:
                detail.append(f"row{i}: spark={s.loc[i].to_dict()} duck={d.loc[i].to_dict()}")
            results[name] = "VALUE_MISMATCH " + " | ".join(detail)
        else:
            results[name] = f"OK rows={len(s)}"
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        flag = "PASS" if v.startswith("OK") else ("INFO" if v.startswith("ROWS_ONLY") else "FAIL")
        print(f"[{flag}] {k}: {v[:400]}")
    nfail = sum(1 for v in results.values()
                if not v.startswith(("OK", "ROWS_ONLY")))
    print(f"\n{npass} pass, {nfail} fail, {len(results)} total")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
