#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`: for each query
result parquet in <outDir>, runs the matching oracle SQL from
oracle_sql.json in DuckDB over the same source tables, normalizes both
sides (sort columns by name, sort rows, canonical NULLs/floats), and
compares hashes. Usage: tools/selfcheck.py <sfDir> <outDir> [query...]
"""
import json, sys, os, glob
import duckdb
import pandas as pd
import numpy as np

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64").round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path) or (only and name not in only):
            continue
        files = glob.glob(f"{path}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            print(f"SKIP  {name:24s} rows={len(got)} (no oracle, rows-only check)")
            n_skip += 1
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name:24s} columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
        elif len(g) != len(w):
            print(f"FAIL  {name:24s} rows {len(g)} != {len(w)}")
            n_fail += 1
        elif not g.equals(w):
            diff = (g != w) & ~(g.isna() & w.isna())
            bad = diff.any(axis=1)
            print(f"FAIL  {name:24s} {int(bad.sum())}/{len(g)} rows differ; first:")
            print("  got:", g[bad].head(2).to_dict("records"))
            print(" want:", w[bad].head(2).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS  {name:24s} rows={len(g)}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
