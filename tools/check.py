#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB over the sfDir parquet tables,
loads the corresponding Spark parquet result, sorts columns by name and
rows by value, rounds floats, and diffs.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

ROUND = 6

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(ROUND)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # decimals etc → float
            try:
                df[c] = pd.to_numeric(df[c]).astype(float).round(ROUND)
            except (ValueError, TypeError):
                pass
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = normalize(pd.concat([pd.read_parquet(f) for f in files]))
            want = normalize(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=False, rtol=1e-6, atol=1e-6)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[-1]}"); n_fail += 1
    # queries without oracle: rows-only check (driven by the declared name
    # list so a query that threw and wrote nothing still FAILs)
    have = set(oracles)
    import os
    names_file = f"{out_dir}/names.json"
    all_names = (json.load(open(names_file)) if os.path.exists(names_file)
                 else [d.rstrip("/").split("/")[-1] for d in glob.glob(f"{out_dir}/*/")])
    for name in sorted(all_names):
        if name in have: continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        rows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"{'PASS' if rows > 0 else 'FAIL'} {name} (rows-only: {rows})")
        if rows > 0: n_pass += 1
        else: n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
