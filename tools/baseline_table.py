#!/usr/bin/env python3
"""Regenerate the recorded-bench-baseline artifacts from the N newest
bench/results/bench-*.json runs (driver-side tooling, like check.py):

- bench/results/r{round}.json : per-query MAX over the runs (conservative
  baseline given run noise), total = sum of maxes
- prints the BASELINE.md two-column markdown table to stdout

Usage: python3 tools/baseline_table.py <round> [n_runs=3]
"""
import glob
import json
import sys


def main(rnd, n=3):
    files = sorted(glob.glob("/root/repo/bench/results/bench-*.json"))[-n:]
    if len(files) < n:
        print(f"only {len(files)} runs found, need {n}", file=sys.stderr)
        return 1
    runs = [json.load(open(f)) for f in files]
    names = set()
    for r in runs:
        names |= set(r["queries"])
    mx = {q: max(r["queries"][q] for r in runs if q in r["queries"])
          for q in sorted(names)}
    rec = {"metric": "total", "value": sum(mx.values()), "unit": "sec",
           "queries": mx, "sf": runs[-1]["sf"],
           "runs": [f.split("/")[-1] for f in files]}
    out = f"/root/repo/bench/results/r{rnd}.json"
    json.dump(rec, open(out, "w"), indent=1)
    print(f"wrote {out}: {len(mx)} queries, total {rec['value']:.1f}s",
          file=sys.stderr)

    qs = sorted(mx)
    half = (len(qs) + 1) // 2
    print("| query | sec | query | sec |")
    print("|---|---|---|---|")
    for i in range(half):
        left = f"{qs[i]} | {mx[qs[i]]:.2f}"
        right = (f"{qs[i + half]} | {mx[qs[i + half]]:.2f}"
                 if i + half < len(qs) else " | ")
        print(f"| {left} | {right} |")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 3))
