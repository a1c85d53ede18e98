#!/usr/bin/env python3
"""32x continuation probe of the ADAPTIVE family (VERDICT r13 item 2;
driver-side tooling like scaleprobe.py — NOT library code).

The decade table tops out at 10x; the scale-adaptive knobs — rp-band
width r ~ log n, SemDeDup/IVF k ~ ceil(n/64), PQ probe caps,
GlobalRowNumber bucket counts — claim constant occupancy at ANY scale.
This probe builds the 32x perturbed replica (scaleprobe.build: Caesar-
shifted text, independent sign-flip masks — no manufactured near-dups),
runs the adaptivity-bearing queries at 1x and 32x, runs the occupancy
stats main at both scales, and writes bench/results/scale32-r14.json.

PASS = every query's wall ratio <= the 32x data factor (sub-linear
continuation) and the rp-band bucket occupancy distribution is flat
(avg stays ~target while n grows 32x). Exits 1 on a super-linear query.

Usage: tools/scale32.py [out.json]
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import scaleprobe

QUERIES = ("q_dedup_embedding,q_ann_lsh,q_embed_dedup_canon,q_semdedup,"
           "q_ann_ivf,q_ann_pq,q_ivf_probe_stats,q_jaccard_topk_lsh,"
           "q_corpus_shuffle,q_mix_materialize,q_dedup_minhash_lsh,"
           "q_simhash_pairs")

ADD_OPENS = [a for p in (
    "java.lang java.lang.invoke java.lang.reflect java.io java.net "
    "java.nio java.util java.util.concurrent java.util.concurrent.atomic "
    "sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar").split()
    for a in ("--add-opens", f"java.base/{p}=ALL-UNNAMED")]

CP = "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
TEST_CP = "/root/repo/target/scala-2.13/test-classes:" + CP


def bench(dest):
    # single timed pass at BOTH scales (the decade-run convention): the
    # probe statistic is a cross-scale ratio, so the pass discipline just
    # has to match across scales — and 3 passes at 32x data would triple
    # a long run for no extra ratio information
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
        "bench/results/scale32-r14.json"
    dest1, dest32 = "/tmp/scale1x", "/tmp/scale32x"
    scaleprobe.build(1, dest1)
    print("built 1x", file=sys.stderr)
    scaleprobe.build(32, dest32)
    print("built 32x", file=sys.stderr)

    q1 = bench(dest1)
    print("benched 1x", file=sys.stderr)
    q32 = bench(dest32)
    print("benched 32x", file=sys.stderr)
    occ1, occ32 = occupancy(dest1), occupancy(dest32)

    rows, over = [], []
    print(f"{'query':24s} {'1x':>8s} {'32x':>8s} {'ratio':>7s}")
    for q in sorted(set(q1) | set(q32)):
        a, b = q1.get(q), q32.get(q)
        ratio = (b / a) if a and b else None
        rows.append((q, a, b, ratio))
        if ratio and ratio > 32.0:
            over.append(q)
        print(f"{q:24s} {a or -1:8.2f} {b or -1:8.2f} "
              f"{ratio if ratio else -1:7.2f}")
    ratios = sorted(r for _, _, _, r in rows if r)
    med = ratios[len(ratios) // 2] if ratios else None
    print(f"\nmedian_ratio={med:.2f} worst={max(ratios):.2f} "
          f"over_32x={over}")
    print(f"occupancy 1x : {occ1}")
    print(f"occupancy 32x: {occ32}")

    rec = {
        "queries_1x": q1, "queries_32x": q32,
        "ratios": {q: r for q, _, _, r in rows if r},
        "median_ratio": med, "worst_ratio": max(ratios),
        "over_32x": over,
        "occupancy_1x": occ1, "occupancy_32x": occ32,
        "method": "one warmup + one timed Bench pass per scale; "
                  "perturbed replicas (scaleprobe.build)",
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out_path}")
    sys.exit(1 if over else 0)


if __name__ == "__main__":
    main()
