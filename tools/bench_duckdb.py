#!/usr/bin/env python3
"""Time every benched oracle in DuckDB on the same parquet tables.

Usage: python3 tools/bench_duckdb.py <sfDir> [meta.jsonl] > BENCH_DUCKDB.json

Machine-generates the "graft vs DuckDB on the identical SQL" comparison
so the ARCHITECTURE table can't drift: the Spark side comes from
graft.Bench (BENCH_r{N}.json), this side runs the exact oracle SQL the
correctness gate uses, 3 passes per query taking the min (same protocol
as graft.Bench). Queries whose oracle is None (rows-only gates) are
skipped.

meta.jsonl is the output of `sbt "runMain graft.Meta"` (lines starting
with "META "); if omitted, runs sbt to produce it.
"""
import sys, json, subprocess, time, hashlib
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]


def load_meta(path=None):
    if path:
        lines = open(path).read().splitlines()
    else:
        out = subprocess.run(
            ["sbt", "-batch", "runMain graft.Meta"],
            capture_output=True, text=True, cwd=sys.path[0] + "/..")
        lines = (out.stdout + out.stderr).splitlines()
    metas = []
    for ln in lines:
        i = ln.find("META {")
        if i >= 0:
            metas.append(json.loads(ln[i + 5:]))
    if not metas:
        sys.exit("no META lines found — did `sbt runMain graft.Meta` run?")
    return metas


def main(sf_dir, meta_path=None):
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    # `is not None`, not truthiness: Bench.scala includes Some("") in the
    # hash set, so an empty-string oracle must be included here too or the
    # oracle_set_hash would permanently mismatch (advice r12)
    metas = [m for m in load_meta(meta_path)
             if m["bench"] and m["oracle"] is not None]
    times, skipped = {}, []
    for m in metas:
        best = None
        try:
            for _ in range(3):
                t0 = time.monotonic()
                con.execute(m["oracle"]).fetchall()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times[m["name"]] = round(best, 3)
        except Exception as e:
            skipped.append({"name": m["name"], "error": str(e).split("\n")[0]})
    # fingerprint of the benched oracle set (names + SQL, sorted) —
    # graft.Bench emits the identical hash, and tools/bench_ratio.py
    # refuses a ratio between artifacts whose hashes differ (an oracle
    # rewrite otherwise leaves this denominator silently stale, r11)
    h = hashlib.md5()
    for m in sorted(metas, key=lambda m: m["name"]):
        h.update(m["name"].encode()); h.update(b"\n")
        h.update(m["oracle"].encode()); h.update(b"\x00")
    doc = {
        "metric": "duckdb_oracle_total", "unit": "sec",
        "sf_dir": sf_dir,
        "value": round(sum(times.values()), 3),
        "n_queries": len(times),
        "queries": dict(sorted(times.items())),
        "skipped": skipped,
        "oracle_set_hash": h.hexdigest(),
        "protocol": "3 passes per query, min; identical oracle SQL to the "
                    "correctness gate; duckdb " + duckdb.__version__,
    }
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
