#!/usr/bin/env python3
"""Assemble the decade-rehearsal record (driver-side tooling): take N
single-pass full-surface Bench records from the 10x replica, compute the
per-query MIN (the r11 methodology — single 10x passes move multi-second
GC/JIT pauses onto different queries each run, so the decade statistic
is the min over independent runs), ratio each against the per-query 1x
budget record, and write bench/results/sf1-decade-rNN.json.

Usage: decade_report.py <out.json> <budget.json> <run1.json> [run2.json ...]
Prints the ratio table and the super-linear (>10x) offenders, exits 1 if
any query exceeds 10x.
"""
import json
import sys


def main():
    out_path, budget_path = sys.argv[1], sys.argv[2]
    runs = [json.load(open(p)) for p in sys.argv[3:]]
    budget = json.load(open(budget_path))["queries"]
    mins = {}
    for r in runs:
        for q, v in r["queries"].items():
            mins[q] = min(mins.get(q, float("inf")), v)
    caps = {}
    for r in runs:
        for c, v in r.get("capstones", {}).items():
            caps[c] = min(caps.get(c, float("inf")), v)
    errors = sorted({e for r in runs for e in r.get("errors", [])})
    fallbacks = max(r.get("codegen_fallbacks", 0) for r in runs)

    rows = []
    for q in sorted(mins):
        b = budget.get(q)
        ratio = mins[q] / b if b else None
        rows.append((q, mins[q], b, ratio))
    compared = [r for r in rows if r[3] is not None]
    over = [r for r in compared if r[3] > 10.0]
    ratios = sorted(r[3] for r in compared)
    med = ratios[len(ratios) // 2] if ratios else None

    # A budget record that shares no query names with the runs (wrong
    # file, renamed queries) must die with a diagnostic, not a
    # TypeError on `med:.2f` / ValueError on max([]) (ADVICE r13).
    if not compared:
        sys.exit("no comparable queries: budget record shares no query "
                 f"names with the runs (budget={budget_path})")

    print(f"{'query':28s} {'10x_min':>8s} {'1x':>8s} {'ratio':>7s}")
    for q, m, b, ratio in sorted(rows, key=lambda r: -(r[3] or 0)):
        print(f"{q:28s} {m:8.2f} {b if b else -1:8.2f} "
              f"{ratio if ratio else -1:7.2f}")
    print(f"\ncompared={len(compared)} median_ratio={med:.2f} "
          f"worst={max(ratios):.2f} over_10x={len(over)} "
          f"errors={errors} codegen_fallbacks={fallbacks}")
    for q, m, b, ratio in over:
        print(f"  SUPER-LINEAR: {q} {ratio:.1f}x ({b:.2f}s -> {m:.2f}s)")

    rec = {
        "queries": mins,
        "capstones": caps,
        "sf": "/tmp/scale10x (10x sf0.1)",
        "method": f"per-query min over {len(runs)} single-pass runs",
        "budget": budget_path.split("/")[-1],
        "median_ratio": med,
        "worst_ratio": max(ratios),
        "over_10x": [r[0] for r in over],
        "errors": errors,
        "codegen_fallbacks": fallbacks,
    }
    with open(out_path, "w") as f:
        json.dump(rec, f)
    print(f"wrote {out_path}")
    sys.exit(1 if over or errors else 0)


if __name__ == "__main__":
    main()
