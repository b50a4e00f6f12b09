#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
SQL in DuckDB against the parquet tables in <sfDir>, and compares with the
parquet result Spark wrote to <verifyOutDir>/<name>/. Comparison: sort
columns by name, sort rows, exact value equality (the driver hashes, so
exact is the bar). Queries without oracle SQL get a rows>0 check.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable multiset compare (floats via repr → exact)
    return df

def key(df: pd.DataFrame):
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple(repr(v) for v in t))
    return sorted(rows)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            ok = len(got) > 0
            print(f"[{'PASS' if ok else 'FAIL'}] {name}: rows-only check, {len(got)} rows")
            n_pass += ok; n_fail += (not ok)
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"[FAIL] {name}: columns differ: spark={list(g.columns)} duck={list(e.columns)}")
            n_fail += 1
            continue
        # dtype check (int64 vs int32 etc.)
        dt_mismatch = [(c, str(g[c].dtype), str(e[c].dtype))
                       for c in g.columns if str(g[c].dtype) != str(e[c].dtype)]
        kg, ke = key(g), key(e)
        if kg == ke:
            extra = f" (dtypes differ: {dt_mismatch})" if dt_mismatch else ""
            print(f"[PASS] {name}: {len(g)} rows{extra}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"[FAIL] {name}: spark {len(g)} rows vs duck {len(e)} rows")
            sg, se = set(kg), set(ke)
            for r in list(sg - se)[:3]:
                print(f"   spark-only: {r}")
            for r in list(se - sg)[:3]:
                print(f"   duck-only:  {r}")
            if dt_mismatch:
                print(f"   dtypes: {dt_mismatch}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
