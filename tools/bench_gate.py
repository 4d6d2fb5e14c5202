#!/usr/bin/env python3
"""Bench regression gate: fail loudly when any query slows down.

Usage: python3 tools/bench_gate.py <prev_bench.json> <new_bench.json> \
           [--ratio 1.5] [--floor 0.75] [--round-ref BENCH_rNN.json]

Compares the per-query times of two bench JSON lines (the one-line
format Bench.scala prints / the driver records as BENCH_r{N}.json) and
exits non-zero if any query present in BOTH runs exceeds
`ratio` x its previous time AND its new time is above `floor` seconds
(sub-second queries swing ±2x on scheduler noise alone — see
docs/SCALING.md's noise note — so tiny absolute regressions are not
actionable). New queries and removed queries are reported, not gated.

Rationale (VERDICT r3 #7): q39 regressed 2.1x between rounds and nothing
flagged it; this makes the next silent regression a red exit code.

DRIFT-ADOPTION GUARD (VERDICT r9 #4): the in-bench retry pass and this
gate both compare against the COMMITTED reference — if a genuinely
regressed time is ever committed, both silently adopt it as the new
normal. `--round-ref` (auto-discovered as the highest-numbered
BENCH_r*.json beside the new file when not given) adds an INDEPENDENT
anchor: the previous round's driver record. Any query that passes the
committed comparison but exceeds ratio x its round-record time is
reported as DRIFT and fails the gate — a committed baseline that
slipped round-over-round without a disclosed plan change now names
itself.
"""
import argparse
import json
import os
import re
import subprocess
import sys


def _git_fallback(path: str, text: str) -> dict | None:
    """Salvage a truncated driver bench file (VERDICT r6 tooling nit:
    BENCH_r05.json's tail was cut mid-JSON) from git history.

    Fingerprint whatever complete `"qNN_name":seconds` pairs survive in
    the raw text, then walk committed BENCHOUT.json revisions newest-
    first and return the first whose timings match every salvaged pair —
    that IS the run the truncated file recorded. With no fingerprint
    match, fall back to the salvaged pairs themselves (a partial but
    real comparison point); never silently substitute a different run's
    numbers.

    Pairs are salvaged ONLY from inside the `"queries"` object: the
    bench line carries several other qNN-keyed objects (load, samples,
    peak_mem, probe_only, retried), and a head-truncated artifact that
    lost the `"queries"` key would otherwise salvage loadavg values as
    seconds (BENCH_r09.json did exactly this). No queries region → no
    salvage → the caller refuses to gate on the file.
    """
    region = None
    i = text.find('"queries"')
    if i < 0:
        i = text.find('\\"queries\\"')  # tail-log-escaped form
    if i >= 0:
        j = text.find("{", i)
        if j >= 0:
            k = text.find("}", j)  # flat name:number object — no nesting
            region = text[j:k + 1] if k > 0 else text[j:]
    pairs = {} if region is None else {
        m.group(1): float(m.group(2)) for m in re.finditer(
            r'\\?"(q[a-zA-Z0-9_]+)\\?":\s*(-?[0-9]+(?:\.[0-9]+)?)', region)}
    cwd = os.path.dirname(os.path.abspath(path)) or "."
    try:
        revs = subprocess.run(
            ["git", "rev-list", "HEAD", "--", "BENCHOUT.json"],
            cwd=cwd, capture_output=True, text=True, check=True).stdout.split()
    except (OSError, subprocess.CalledProcessError):
        revs = []
    for rev in revs:  # newest first
        try:
            blob = subprocess.run(
                ["git", "show", f"{rev}:BENCHOUT.json"],
                cwd=cwd, capture_output=True, text=True, check=True).stdout
            doc = json.loads(blob.strip().splitlines()[-1])
        except (OSError, subprocess.CalledProcessError,
                json.JSONDecodeError, IndexError):
            continue
        qs = doc.get("queries") or {}
        if pairs and qs and all(
                abs(qs.get(q, float("-inf")) - v) < 1e-9
                for q, v in pairs.items()):
            print(f"note: {path} is truncated; recovered its full run from "
                  f"git BENCHOUT.json @ {rev[:9]} (fingerprint of "
                  f"{len(pairs)} surviving timings)", file=sys.stderr)
            return dict(qs)
    if pairs:
        print(f"note: {path} is truncated and no git BENCHOUT.json matches; "
              f"gating on the {len(pairs)} salvaged timings only",
              file=sys.stderr)
        return pairs
    return None


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    doc: dict = {}
    try:  # a whole-file JSON doc (the driver's pretty-printed BENCH_r{N}.json)
        doc = json.loads(text)
    except json.JSONDecodeError:  # raw Bench.scala output: JSON is the last line
        try:
            doc = json.loads(text.splitlines()[-1])
        except json.JSONDecodeError:
            doc = {}
    # the driver's BENCH_r{N}.json wraps Bench.scala's line under "parsed",
    # or (when its parse came up empty) embeds it in the "tail" log capture
    if isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    elif "queries" not in doc and "tail" in doc:
        for line in reversed(doc["tail"].splitlines()):
            if '"metric"' in line and '"queries"' in line:
                try:
                    doc = json.loads(line[line.index("{"):])
                except json.JSONDecodeError:
                    continue
                break
    queries = doc.get("queries") or {}
    if not queries:
        # a truncated driver artifact must not lose the gate's comparison
        # point — recover the run from git history by timing fingerprint
        queries = _git_fallback(path, text) or {}
    if not queries:
        # an empty dict must never silently pass the gate (format drift,
        # a typo'd SPARK_GRAFT_BENCH_ONLY, or a driver parse gone wrong)
        raise SystemExit(f"{path}: no per-query timings found — refusing to gate")
    # keep failed (-1) entries: they gate below. peak_mem/spill_bytes
    # (present from round 8 on) ride along for regression attribution.
    return dict(queries), doc.get("peak_mem") or {}, doc.get("spill_bytes") or {}


def discover_round_ref(new_path: str, prev_path: str) -> str | None:
    """Highest-numbered BENCH_r*.json in the new file's directory (the
    previous round's driver record) — skipped when it IS one of the two
    compared files already."""
    d = os.path.dirname(os.path.abspath(new_path)) or "."
    best_n, best = -1, None
    for f in os.listdir(d):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", f)
        if m and int(m.group(1)) > best_n:
            best_n, best = int(m.group(1)), os.path.join(d, f)
    if best and best not in (os.path.abspath(new_path),
                             os.path.abspath(prev_path)):
        return best
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.75)
    ap.add_argument("--round-ref", default=None,
                    help="previous round's BENCH_rNN.json (auto-discovered "
                         "beside the new file when omitted); independent "
                         "drift-adoption anchor")
    args = ap.parse_args()

    (prev, _, _), (new, new_peak, new_spill) = load(args.prev), load(args.new)
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
        # peak_mem/spill attribute pressure blowups (VERDICT r7 #6): a
        # regression with heavy spill is a block-manager-pressure event,
        # not a plan change — triage accordingly.
        mem = ""
        if q in new_peak:
            mem = (f" [peak_mem {new_peak[q] / 1e6:.0f}MB,"
                   f" spill {new_spill.get(q, 0) / 1e6:.0f}MB]")
        print(f"REGRESSION {q}: {p:.2f}s -> {n:.2f}s "
              f"({n / p:.2f}x > {args.ratio}x){mem}")
    # DRIFT-ADOPTION GUARD: compare against the previous ROUND's record
    # too — queries the committed comparison passed but whose time
    # exceeds ratio x the round anchor reveal a baseline that slipped
    # between rounds (the committed file agreeing is exactly the
    # symptom, not an alibi).
    drifts = []
    round_ref = args.round_ref or discover_round_ref(args.new, args.prev)
    if round_ref:
        try:
            ref, _, _ = load(round_ref)
        except SystemExit:
            ref = {}
        flagged = {q for q, _, _ in regressions}
        for q in sorted(set(new_ok) & {k for k, v in ref.items() if v >= 0}):
            if (q not in flagged and new_ok[q] > ref[q] * args.ratio
                    and new_ok[q] > args.floor):
                drifts.append((q, ref[q], new_ok[q]))
        for q, r, n in drifts:
            committed = f"{prev[q]:.2f}s" if q in prev else "absent"
            print(f"DRIFT {q}: {r:.2f}s ({os.path.basename(round_ref)}) -> "
                  f"{n:.2f}s ({n / r:.2f}x > {args.ratio}x) — committed "
                  f"baseline agrees ({committed}): possible drift-adoption")
    tot_prev = sum(prev[q] for q in shared)
    tot_new = sum(new_ok[q] for q in shared)
    print(f"\nshared-query total: {tot_prev:.2f}s -> {tot_new:.2f}s "
          f"({len(shared)} queries); {len(regressions)} regression(s), "
          f"{len(drifts)} drift(s), "
          f"{len(broken) + len(new_broken)} newly broken")
    return 1 if regressions or drifts or broken or new_broken else 0


if __name__ == "__main__":
    sys.exit(main())
