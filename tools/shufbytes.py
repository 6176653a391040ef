#!/usr/bin/env python3
"""Shuffle-byte accounting table for SCALING.md (VERDICT r12 ask #3).

Reads two BENCH_DETAIL artifacts produced by the r13+ instrumented
bench (per-query shufReadMB/shufWriteMB/spillMB/inputMB/outputMB) and
prints the top-N shuffle-heaviest queries at the larger SF as a
markdown table: exchange bytes + bytes-growth between the two SFs.
Time ratios prove local CPU shape; bytes-on-exchange is the
cluster-network half that local[32] cannot time.

Usage: python3 tools/shufbytes.py <detail_sf0.1.json> <detail_sf1.json> [N]
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return {k: v for k, v in d["queries"].items() if isinstance(v, dict)}


def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    rows = []
    for k, v in big.items():
        if "shufReadMB" not in v:
            continue
        ex1 = v["shufReadMB"] + v["shufWriteMB"]
        s = small.get(k, {})
        ex0 = (s.get("shufReadMB", 0.0) + s.get("shufWriteMB", 0.0)
               ) if "shufReadMB" in s else None
        rows.append((k, ex1, ex0, v.get("spillMB", 0.0),
                     v.get("inputMB", 0.0), v.get("sec")))
    rows.sort(key=lambda r: -r[1])
    print("| query | exchange MB (sf1) | exchange MB (sf0.1) | growth | "
          "spill MB | input MB | sec (sf1) |")
    print("|---|---|---|---|---|---|---|")
    for k, ex1, ex0, spill, inp, sec in rows[:n]:
        if ex0 is None:
            g = "n/a"
            e0 = "n/a"
        else:
            e0 = f"{ex0:.1f}"
            g = f"{ex1 / ex0:.1f}x" if ex0 > 0.05 else ("flat" if ex1 <= 0.1
                                                        else "new")
        print(f"| {k} | {ex1:.1f} | {e0} | {g} | {spill:.1f} | {inp:.1f} "
              f"| {sec:.2f} |")
    # flag super-linear exchange growth (>10x bytes at 10x rows needs the
    # dedup_semantic treatment per the verdict)
    sup = [(k, ex1, ex0) for k, ex1, ex0, *_ in rows
           if ex0 is not None and ex0 > 1.0 and ex1 / ex0 > 12.0]
    if sup:
        print("\nSUPER-LINEAR exchange growth (>12x at 10x rows):")
        for k, ex1, ex0 in sup:
            print(f"  {k}: {ex0:.1f} -> {ex1:.1f} MB ({ex1 / ex0:.1f}x)")
    else:
        print("\nNo query grows exchange bytes super-linearly "
              "(>12x at 10x rows).")


if __name__ == "__main__":
    main()
