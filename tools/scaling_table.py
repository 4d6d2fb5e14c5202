#!/usr/bin/env python3
"""Regenerate the docs/SCALING.md query table from bench JSON lines.

Usage: python3 tools/scaling_table.py sf0.001.json sf0.01.json \
           sf0.1.json [sf1.json]

Each input is one graft.Bench JSON line. Prints the markdown table
rows (query order = the sf0.1 file's order, i.e. the registry order)
with a ratio column between the LAST and FIRST scale given, plus the
total row. Paste into docs/SCALING.md.
"""
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        for line in f.read().splitlines():
            if '"metric"' in line:
                return json.loads(line[line.index("{"):])
    raise SystemExit(f"{path}: no bench JSON line")


def main(paths: list) -> None:
    runs = [load(p) for p in paths]
    qs = list(runs[-1]["queries"])  # registry order of the widest run
    header = ["query"] + [f"sf{p.split('sf')[-1].removesuffix('.json')}"
                          for p in paths]
    ratio = f"{10 ** (len(paths) - 1)}x data / 1x time"
    print("| " + " | ".join(header + [ratio]) + " |")
    print("|" + "---|" * (len(header) + 1))
    tot = [0.0] * len(runs)
    for q in qs:
        cells = []
        vals = []
        for i, r in enumerate(runs):
            v = r["queries"].get(q)
            vals.append(v)
            if v is not None and v >= 0:
                tot[i] += v
            cells.append("" if v is None else f"{v:.2f}")
        r = (f"{vals[-1] / vals[0]:.1f}x"
             if vals[0] and vals[-1] and vals[0] > 0 else "")
        print("| " + " | ".join([q] + cells + [r]) + " |")
    cells = [f"{t:.2f}" for t in tot]
    print("| **total** | " + " | ".join(cells) +
          f" | {tot[-1] / tot[0]:.1f}x |")


if __name__ == "__main__":
    main(sys.argv[1:])
