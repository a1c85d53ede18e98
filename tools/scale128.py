#!/usr/bin/env python3
"""128x continuation probe of the BANDED family (round 14; driver-side
tooling like scale32.py — NOT library code).

scale32.py already verified the whole adaptive family at 32x. This probe
pushes the sub-linearity claim two more doublings for the queries whose
scale behavior is carried by the banded-LSH knobs themselves (band width
r ~ log n, hot-bucket chunking, earliest-co-band emission, signature
canonicalization, GlobalRowNumber bucket counts) — the pair-listing /
canonicalization dedup surface. The Lloyd-trained members (IVF / PQ /
SemDeDup) are deliberately OUT of the 128x list: their bench-visible
search paths were flat at 32x, and their TRAIN cost is O(n·k) with the
adaptive k = ceil(n/64) — a maintenance-job cost that is priced and
documented separately (DEPLOYMENT.md: bound k or train on a sample at
real scale), not something to launder through a query-wall ratio.

PASS = every query's wall ratio <= the 128x data factor and the rp-band
bucket occupancy stays flat while n grows 128x.

Usage: tools/scale128.py [out.json]
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import scaleprobe

QUERIES = ("q_dedup_embedding,q_ann_lsh,q_jaccard_topk_lsh,"
           "q_simhash_pairs,q_dedup_minhash_lsh,q_embed_dedup_canon,"
           "q_corpus_shuffle,q_mix_materialize")

ADD_OPENS = [a for p in (
    "java.lang java.lang.invoke java.lang.reflect java.io java.net "
    "java.nio java.util java.util.concurrent java.util.concurrent.atomic "
    "sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar").split()
    for a in ("--add-opens", f"java.base/{p}=ALL-UNNAMED")]

CP = "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
TEST_CP = "/root/repo/target/scala-2.13/test-classes:" + CP


def bench(dest):
    # one warmup + one timed pass (the scale32 convention)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=dest, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_PASSES="1",
               SPARK_GRAFT_ONLY=QUERIES, SPARK_GRAFT_BENCH_OUT="off")
    out = subprocess.run(
        ["java", "-Xmx48g", *ADD_OPENS, "-cp", CP, "graft.Bench"],
        env=env, capture_output=True, text=True)
    rec = next(json.loads(l) for l in reversed(out.stdout.strip().splitlines())
               if '"queries"' in l)
    for e in rec.get("errors", []):
        print(f"  DNF at {dest}: {e}", file=sys.stderr)
    return rec["queries"]


def occupancy(dest):
    out = subprocess.run(
        ["java", "-Xmx48g", *ADD_OPENS, "-cp", TEST_CP,
         "graft.queries.ScaleProbeStatsMain", dest],
        env=dict(os.environ, SPARK_GRAFT_CPUS="32"),
        capture_output=True, text=True)
    return next(json.loads(l) for l in reversed(out.stdout.strip().splitlines())
                if l.startswith("{"))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        "bench/results/scale128-r14.json"
    dest1, dest128 = "/tmp/scale1x", "/tmp/scale128x"
    scaleprobe.build(1, dest1)
    print("built 1x", file=sys.stderr)
    scaleprobe.build(128, dest128)
    print("built 128x", file=sys.stderr)

    q1 = bench(dest1)
    print("benched 1x", file=sys.stderr)
    q128 = bench(dest128)
    print("benched 128x", file=sys.stderr)
    occ1, occ128 = occupancy(dest1), occupancy(dest128)

    rows, over = [], []
    print(f"{'query':24s} {'1x':>8s} {'128x':>8s} {'ratio':>7s}")
    for q in sorted(set(q1) | set(q128)):
        a, b = q1.get(q), q128.get(q)
        ratio = (b / a) if a and b else None
        rows.append((q, a, b, ratio))
        if ratio and ratio > 128.0:
            over.append(q)
        print(f"{q:24s} {a or -1:8.2f} {b or -1:8.2f} "
              f"{ratio if ratio else -1:7.2f}")
    ratios = sorted(r for _, _, _, r in rows if r)
    med = ratios[len(ratios) // 2] if ratios else None
    print(f"\nmedian_ratio={med:.2f} worst={max(ratios):.2f} "
          f"over_128x={over}")
    print(f"occupancy 1x  : {occ1}")
    print(f"occupancy 128x: {occ128}")

    rec = {
        "queries_1x": q1, "queries_128x": q128,
        "ratios": {q: r for q, _, _, r in rows if r},
        "median_ratio": med, "worst_ratio": max(ratios),
        "over_128x": over,
        "occupancy_1x": occ1, "occupancy_128x": occ128,
        "method": "one warmup + one timed Bench pass per scale; "
                  "perturbed replicas (scaleprobe.build); banded family "
                  "only — Lloyd-trained members documented separately",
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out_path}")
    sys.exit(1 if over else 0)


if __name__ == "__main__":
    main()
