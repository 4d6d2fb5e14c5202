#!/usr/bin/env python3
"""Bench regression gate: fail loudly when any query slows down.

Usage: python3 tools/bench_gate.py <prev_bench.json> <new_bench.json> \
           [--ratio 1.5] [--floor 0.75]

Compares the per-query times of two bench JSON lines (the one-line
format Bench.scala prints / the driver records as BENCH_r{N}.json) and
exits non-zero if any query present in BOTH runs exceeds
`ratio` x its previous time AND its new time is above `floor` seconds
(sub-second queries swing ±2x on scheduler noise alone — see
docs/SCALING.md's noise note — so tiny absolute regressions are not
actionable). New queries and removed queries are reported, not gated.

Rationale (VERDICT r3 #7): q39 regressed 2.1x between rounds and nothing
flagged it; this makes the next silent regression a red exit code.
"""
import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    try:  # a whole-file JSON doc (the driver's pretty-printed BENCH_r{N}.json)
        doc = json.loads(text)
    except json.JSONDecodeError:  # raw Bench.scala output: JSON is the last line
        doc = json.loads(text.splitlines()[-1])
    # the driver's BENCH_r{N}.json wraps Bench.scala's line under "parsed",
    # or (when its parse came up empty) embeds it in the "tail" log capture
    if isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    elif "queries" not in doc and "tail" in doc:
        for line in reversed(doc["tail"].splitlines()):
            if '"metric"' in line and '"queries"' in line:
                doc = json.loads(line[line.index("{"):])
                break
        else:
            raise SystemExit(f"{path}: no bench JSON line found in 'tail'")
    queries = doc.get("queries", {})
    if not queries:
        # an empty dict must never silently pass the gate (format drift,
        # a typo'd SPARK_GRAFT_BENCH_ONLY, or a driver parse gone wrong)
        raise SystemExit(f"{path}: no per-query timings found — refusing to gate")
    return dict(queries)  # keep failed (-1) entries: they gate below


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.75)
    args = ap.parse_args()

    prev, new = load(args.prev), load(args.new)
    # a query that FAILS in the new run (-1) is the worst regression of
    # all — it must gate, not vanish; a query failed in BOTH runs is
    # reported but not double-counted as new breakage
    broken = sorted(q for q in new if new[q] < 0 and q in prev and prev[q] >= 0)
    # a query absent from prev that fails on its first run has no baseline
    # time to print — classify separately so the report can't KeyError
    new_broken = sorted(q for q in new if new[q] < 0 and q not in prev)
    still_broken = sorted(q for q in new if new[q] < 0 and prev.get(q, 0) < 0)
    prev = {k: v for k, v in prev.items() if v >= 0}
    new_ok = {k: v for k, v in new.items() if v >= 0}
    shared = sorted(set(prev) & set(new_ok))
    regressions = []
    for q in shared:
        if new_ok[q] > prev[q] * args.ratio and new_ok[q] > args.floor:
            regressions.append((q, prev[q], new_ok[q]))
    for q in sorted(set(new_ok) - set(prev)):
        print(f"NEW  {q}: {new_ok[q]:.2f}s (not gated)")
    for q in sorted(set(prev) - set(new)):
        print(f"GONE {q}: was {prev[q]:.2f}s")
    for q in broken:
        print(f"BROKEN {q}: was {prev[q]:.2f}s, now FAILS (-1)")
    for q in new_broken:
        print(f"NEW+BROKEN {q}: FAILS (-1) in its first recorded run")
    for q in still_broken:
        print(f"STILL-BROKEN {q}: failed in both runs")
    for q, p, n in regressions:
        print(f"REGRESSION {q}: {p:.2f}s -> {n:.2f}s ({n / p:.2f}x > {args.ratio}x)")
    tot_prev = sum(prev[q] for q in shared)
    tot_new = sum(new_ok[q] for q in shared)
    print(f"\nshared-query total: {tot_prev:.2f}s -> {tot_new:.2f}s "
          f"({len(shared)} queries); {len(regressions)} regression(s), "
          f"{len(broken) + len(new_broken)} newly broken")
    return 1 if regressions or broken or new_broken else 0


if __name__ == "__main__":
    sys.exit(main())
