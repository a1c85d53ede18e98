#!/usr/bin/env python3
"""Scaling probe (driver-side tooling, like check.py — NOT library code):
replicate the sf0.1 fact tables at 2x and 4x (key-offset copies), run the
scale-sensitive queries through graft.Bench at each size, and print the
wall-clock scaling ratios. Linear (ratio ~= size factor) means the plan
has no hidden quadratic or single-task stage; the results are recorded in
BASELINE.md."""
import json
import os
import shutil
import subprocess
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SCALED = {
    "documents": "doc_id + {off} AS doc_id",
    "orders": "o_orderkey + {off} AS o_orderkey",
    "lineitem": "l_orderkey + {off} AS l_orderkey",
}
QUERIES = ("q_quality_score,q_lang_id,q_token_topk,q_dedup_exact,"
           "q_ks_test,q_spearman,q_agg_groupsum,"
           "q_tfidf,q_pmi_bigrams,q_doc_chunks,q_seq_packing")


def build(k, dest):
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        out = f"{dest}/{t}.parquet"
        if t not in SCALED or k == 1:
            shutil.copyfile(src, out)
            continue
        key = SCALED[t]
        selects = []
        for i in range(k):
            off = 100_000_000 * i
            cols = key.format(off=off) if i else key.split(" AS ")[1]
            # replace only the key column; keep the rest verbatim
            selects.append(
                f"SELECT * REPLACE ({key.format(off=off)}) "
                f"FROM read_parquet('{src}')")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{out}' (FORMAT PARQUET)")


def bench(dest):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=dest, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_ONLY=QUERIES)
    out = subprocess.run(
        ["java", "-cp", "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*",
         "-Xmx48g", "graft.Bench"],
        env=env, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])["queries"]


def main():
    results = {}
    for k in (1, 2, 4):
        dest = f"/tmp/scale{k}x"
        build(k, dest)
        results[k] = bench(dest)
        print(f"scale {k}x done", file=sys.stderr)
    qs = sorted(results[1])
    print(f"{'query':24s} {'1x':>7s} {'2x':>7s} {'4x':>7s} {'4x/1x':>6s}")
    for q in qs:
        r = results[4][q] / results[1][q]
        print(f"{q:24s} {results[1][q]:7.2f} {results[2][q]:7.2f} "
              f"{results[4][q]:7.2f} {r:6.2f}")


if __name__ == "__main__":
    main()
