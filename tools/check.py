#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only; the
shipped library is pure Scala). Runs each oracle SQL from
out/verify/oracle_sql.json in DuckDB over the fixture parquet tables,
loads the corresponding Spark result parquet, canonicalizes both
(columns sorted by name, rows sorted, floats rounded to 4dp) and
compares hashes, printing a per-query verdict with a diff preview on
mismatch.

Usage: python3 tools/check.py [sfdir] [outdir]
"""
import json, sys, glob
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/out/verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(4)
        # normalize tz-aware → naive for comparison robustness
        if str(df[c].dtype).startswith("datetime64") and getattr(df[c].dt, "tz", None) is not None:
            df[c] = df[c].dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def main():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        path = f"{outdir}/{name}"
        files = glob.glob(f"{path}/*.parquet")
        if not files:
            results[name] = "MISSING spark output"
            continue
        try:
            got = canon(pd.read_parquet(path))
            exp = canon(con.sql(sql).df())
        except Exception as e:
            results[name] = f"ERROR {e}"
            continue
        if list(got.columns) != list(exp.columns):
            results[name] = f"SCHEMA got={list(got.columns)} exp={list(exp.columns)}"
            continue
        if len(got) != len(exp):
            results[name] = f"ROWS got={len(got)} exp={len(exp)}"
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
            results[name] = "OK"
        except AssertionError as e:
            results[name] = "VALUES " + str(e).split("\n")[0]
            # show first differing rows
            neq = (got != exp) & ~(got.isna() & exp.isna())
            bad = neq.any(axis=1)
            print(f"--- {name} first diffs:")
            print(pd.concat([got[bad].head(3).add_suffix("_got"),
                             exp[bad].head(3).add_suffix("_exp")], axis=1).to_string())
    ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v == 'OK' else 'FAIL':4} {name}: {v}")
    print(f"{ok}/{len(results)} oracle-matched")
    return 0 if ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main())
