#!/usr/bin/env python3
"""Compare bench runs: bench_full.json vs earlier rounds' recorded tails.

Usage: python3 tools/compare_bench.py [other.json ...]

With no args, diffs bench_full.json against every BENCH_r*.json tail it
can parse (the driver's recorded stdout tail truncates the head of the
full per-query line, so older rounds expose only a suffix of queries —
the comparison uses whatever parses). Flags per-query regressions >1.5x
and prints the aggregate ratio over common queries.
"""
import glob
import json
import re
import sys


def parse_tail(path):
    """Best-effort per-query timings from a driver BENCH_r*.json."""
    d = json.load(open(path))
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]["queries"]
    tail = d.get("tail", "")
    m = re.search(r'"queries":\{(.*?)\},"sf"', tail, re.S)
    # recorded tails usually truncate the HEAD of the full JSON line, so
    # fall back to scanning loose "name":float pairs (the cut-off first
    # pair has no opening quote and is skipped automatically)
    body = m.group(1) if m else tail.split('},"sf"')[0]
    skip = {"metric", "value", "n_queries", "queries_listed"}
    return {k: float(v) for k, v in
            re.findall(r'"([a-z0-9_]+)":(-?[0-9.eE+]+)', body)
            if k not in skip}


def main():
    cur = json.load(open("bench_full.json"))["queries"]
    others = sys.argv[1:] or sorted(glob.glob("BENCH_r0*.json"))
    for path in others:
        try:
            old = parse_tail(path) if path.startswith("BENCH_") \
                else json.load(open(path))["queries"]
        except Exception as e:
            print(f"{path}: unparseable ({e})")
            continue
        common = [k for k in set(old) & set(cur) if old[k] > 0 and cur[k] > 0]
        if not common:
            print(f"{path}: no common queries")
            continue
        to, tc = sum(old[k] for k in common), sum(cur[k] for k in common)
        print(f"\n== {path}: {len(common)} common, "
              f"sum {to:.1f}s -> {tc:.1f}s (ratio {tc / to:.2f}) ==")
        regs = sorted(common, key=lambda k: -(cur[k] / old[k]))
        for k in regs:
            r = cur[k] / old[k]
            if r < 1.5:
                break
            print(f"  REG {k:28s} {old[k]:7.2f} -> {cur[k]:7.2f}  x{r:.2f}")


if __name__ == "__main__":
    main()
