#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--timeout=SEC] [query ...]

Extra args restrict the compare to the named queries (local iteration);
with none, every query in oracle_sql.json + names.json is checked.
--timeout=SEC interrupts any single oracle after SEC seconds and counts
it SKIP (not FAIL) — for big-SF sweeps where one quadratic DuckDB oracle
(q38-class LSH pair joins) would run hours while the Spark side is fine.

Runs each oracle_sql.json query in DuckDB over the sfDir parquet tables,
loads the corresponding Spark parquet result, sorts columns by name, and
compares EXACT value renderings — no rounding, no decimal→float coercion.
The real driver hashes rendered values, so a Spark DECIMAL "261.60" vs a
DuckDB decimal-sum-read-as-float "261.6" is a FAIL here exactly like it is
there (this check was previously lossy and reported a false 47/47 in r01).
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np


def render_cell(v) -> str:
    """Canonical rendering of one value, preserving type distinctions.

    float64 99111.0 -> "99111.0"; int64 99111 -> "99111";
    Decimal("261.60") -> "261.60" — all distinct, as in the driver's hash.
    """
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (np.ndarray, list)):
        return "[" + ",".join(render_cell(x) for x in v) + "]"
    return str(v)


def rendered(df: pd.DataFrame) -> pd.DataFrame:
    """Emulate the driver: sort the RAW frame (name-sorted columns), THEN
    render each cell. An array/struct cell makes the raw lexsort throw
    (numpy.ndarray is unhashable/unorderable) — that is an `err` row in the
    driver's CORRECTNESS json, so it must throw → FAIL here too. r08's q241
    shipped red because this function used to sort AFTER rendering."""
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if str(col.dtype).startswith("datetime"):
            col = col.astype("datetime64[us]")
        out[c] = col.map(render_cell)
    return out


def dtypes_of(df: pd.DataFrame) -> dict:
    d = {}
    for c in sorted(df.columns):
        k = str(df[c].dtype)
        if k == "object" and len(df) and df[c].notna().any():
            k = f"object<{type(df[c].dropna().iloc[0]).__name__}>"
        d[c] = k
    return d


def main(sf_dir: str, out_dir: str, only=(), timeout_sec: float = 0) -> int:
    import threading
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        timer = None
        timed_out = []
        if timeout_sec > 0:
            timer = threading.Timer(
                timeout_sec, lambda: (timed_out.append(1), con.interrupt()))
            timer.start()
        try:
            got_raw = pd.concat([pd.read_parquet(f) for f in files])
            want_raw = con.execute(oracles[name]).df()
        except Exception as e:
            if timed_out:
                print(f"SKIP {name}: oracle exceeded {timeout_sec:.0f}s "
                      "(Spark side wrote; DuckDB side interrupted)")
                n_skip += 1; continue
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        finally:
            if timer is not None:
                timer.cancel()
        try:
            got, want = rendered(got_raw), rendered(want_raw)
        except Exception as e:
            print(f"FAIL {name}: driver raw-sort err: {type(e).__name__}: {e}")
            n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        neq = (got.values != want.values)
        if neq.any():
            r, c = map(int, np.argwhere(neq)[0])
            col = got.columns[c]
            print(f"FAIL {name}: value mismatch at sorted-row {r} col {col}: "
                  f"spark={got.iat[r, c]!r} oracle={want.iat[r, c]!r} "
                  f"(dtypes spark={dtypes_of(got_raw)[col]} oracle={dtypes_of(want_raw)[col]}; "
                  f"{int(neq.sum())} cells differ)")
            n_fail += 1; continue
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    # queries without oracle: rows-only check (driven by the declared name
    # list so a query that threw and wrote nothing still FAILs)
    have = set(oracles)
    import os
    names_file = f"{out_dir}/names.json"
    all_names = (json.load(open(names_file)) if os.path.exists(names_file)
                 else [d.rstrip("/").split("/")[-1] for d in glob.glob(f"{out_dir}/*/")])
    for name in sorted(all_names):
        if name in have or (only and name not in only): continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        rows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"{'PASS' if rows > 0 else 'FAIL'} {name} (rows-only: {rows})")
        if rows > 0: n_pass += 1
        else: n_fail += 1
    skipnote = f", {n_skip} skip (oracle timeout)" if n_skip else ""
    print(f"== {n_pass} pass, {n_fail} fail{skipnote}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = sys.argv[3:]
    timeout = 0.0
    names = []
    for a in args:
        if a.startswith("--timeout="):
            timeout = float(a.split("=", 1)[1])
        else:
            names.append(a)
    sys.exit(main(sys.argv[1], sys.argv[2], frozenset(names), timeout))
