#!/usr/bin/env python3
"""Compare two graft bench JSONs with host-speed normalization.

Usage: python3 tools/compare_bench.py <old.json|log> <new.json|log>
           [--raw] [--force]

Bench runs on this box vary up to 2x with HOST load invisible to local
loadavg (measured r09: identical code, 30.4s vs 50.7s full-suite, while
the fixed-work load_sentinel went 0.05s -> 0.18s). Each bench JSON
carries `load_sentinel` (per-pass wall time of a constant tiny job);
this tool scales the newer run's per-query times by the sentinel ratio
(mean old / mean new) before diffing, so a "regression" that is
really a slow host window reads as ~1.0x normalized. Runs also carry
`duckdb_denom_total` (a paired PARALLEL fixed-work DuckDB pass, r11) —
preferred for normalization when both sides have it, since the
single-thread sentinel misses parallel-throughput dips. A sentinel or
denominator ratio outside [0.5, 2] REFUSES the comparison (exit 3)
unless --force: past 2x no normalization is trustworthy. --raw skips
normalization AND the refusal guard. Accepts either a bare JSON file
or any log containing
the one-line {"metric": ...} payload (BENCH_r*.json's `tail` field is
also handled).
"""
import json
import re
import signal
import statistics
import sys


def load(path: str) -> dict:
    text = open(path).read()
    try:
        d = json.loads(text)
        if "queries" in d and d["queries"]:
            return d
        # driver-style wrapper: payload fragments under "tail"
        if "tail" in d:
            text = d["tail"].replace('\\"', '"')
    except json.JSONDecodeError:
        pass
    # one statistic for BOTH input forms (advice r10): prefer the headline
    # {"metric"...} payload's `queries` dict — the same thing a bare JSON
    # file carries — and only fall back to min-of-pass fragments when the
    # headline line is absent (e.g. a truncated driver `tail`).
    m = re.search(r'\{"metric".*\}', text)
    if m:
        try:
            d = json.loads(m.group(0))
            if d.get("queries"):
                return d
        except json.JSONDecodeError:
            pass
    best, sentinel = {}, []
    for frag in re.findall(r'\{"q[^{}]*\}', text):
        try:
            for k, v in json.loads(frag).items():
                best[k] = min(best.get(k, float("inf")), float(v))
        except (json.JSONDecodeError, ValueError):
            continue
    m = re.search(r'"load_sentinel":\s*(\[[^\]]*\])', text)
    if m:
        sentinel = json.loads(m.group(1))
    if not best:
        raise SystemExit(f"{path}: no bench payload found")
    print(f"note: {path} had no headline payload — using per-query "
          "min across pass fragments (biased low vs a headline side)")
    return {"queries": best, "load_sentinel": sentinel}


def main(argv):
    raw = "--raw" in argv
    force = "--force" in argv
    paths = [a for a in argv[1:] if not a.startswith("--")]
    if len(paths) != 2:
        print(__doc__)
        return 2
    old, new = load(paths[0]), load(paths[1])
    so = old.get("load_sentinel") or []
    sn = new.get("load_sentinel") or []
    do, dn = old.get("duckdb_denom_total"), new.get("duckdb_denom_total")
    scale = 1.0
    if not raw and so and sn:
        # MEAN, not median: degradation is often intermittent within a
        # run (r09 measured sentinels [0.21, 0.05, 0.06] on a run whose
        # queries were ~1.5x slow overall — the median hides it)
        scale = statistics.mean(so) / statistics.mean(sn)
        print(f"sentinels: old={[round(x,3) for x in so]} "
              f"new={[round(x,3) for x in sn]} -> host-speed scale "
              f"{scale:.2f}")
        if not (0.5 <= scale <= 2.0) and not force:
            print(f"REFUSED: sentinel ratio {scale:.2f} is outside [0.5, 2] "
                  "— the two runs saw hosts too different for any "
                  "normalization to be trusted. Re-run one side in a "
                  "cleaner window, or pass --force.")
            return 3
    elif not raw:
        print("no sentinels on one side — raw comparison")
    # the paired DuckDB denominator (r10 advice): a PARALLEL fixed-work
    # pass, so it tracks the host property the suite actually depends on
    # (the single-thread sentinel missed a 60% parallel-throughput dip).
    # When both sides carry it, prefer it as the normalization scale.
    if not raw and do and dn:
        dscale = do / dn
        print(f"duckdb denominators: old={do:.3f}s new={dn:.3f}s -> "
              f"parallel host-speed scale {dscale:.2f} (used for "
              "normalization; sentinel kept as the refusal guard)")
        if not (0.5 <= dscale <= 2.0) and not force:
            print(f"REFUSED: duckdb denominator ratio {dscale:.2f} outside "
                  "[0.5, 2] — windows not comparable; pass --force.")
            return 3
        scale = dscale
    if not raw and scale != 1.0:
        print(f"normalization scale {scale:.2f} applied to new times")
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    rows = sorted(((qn[k] * scale / qo[k], k, qo[k], qn[k] * scale)
                   for k in common if qo[k] > 0), reverse=True)
    print(f"{len(common)} common queries "
          f"(old-only: {sorted(set(qo)-set(qn))or '-'}, "
          f"new-only: {sorted(set(qn)-set(qo))or '-'})")
    print(f"totals: old {sum(qo[k] for k in common):.1f}s -> "
          f"new(norm) {sum(qn[k]*scale for k in common):.1f}s")
    flagged = [(r, k, a, b) for r, k, a, b in rows if r > 1.3 and b > 0.3]
    print(f"\nregressions >1.3x (and >0.3s):"
          f" {'NONE' if not flagged else ''}")
    for r, k, a, b in flagged:
        print(f"  {k:36s} {a:6.2f} -> {b:6.2f}  ({r:4.2f}x)")
    print("\nbiggest improvements:")
    for r, k, a, b in rows[-8:][::-1]:
        if r < 0.9:
            print(f"  {k:36s} {a:6.2f} -> {b:6.2f}  ({r:4.2f}x)")
    return 0


if __name__ == "__main__":
    signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # survive `| head`
    sys.exit(main(sys.argv))
