#!/usr/bin/env python3
"""Scaling probe (driver-side tooling, like check.py — NOT library code):
replicate the sf0.1 fact tables at 2x and 4x, run the scale-sensitive
queries through graft.Bench at each size, and print the wall-clock scaling
ratios. Linear (ratio ~= size factor) means the plan has no hidden
quadratic or single-task stage; the results are recorded in BASELINE.md.

Replicas are PERTURBED, not copied: a verbatim copy of every document /
embedding would make each row a true near-duplicate of its replicas, so
the pair-generation family's OUTPUT (and its work) would grow
quadratically by data construction and the probe would measure the data,
not the algorithm. Instead each replica k gets
 - documents: doc_id offset + a Caesar shift of the text (token structure
   preserved, every alphabetic token hash changes -> no cross-replica
   near-dups);
 - embeddings: vec_id offset + sign flips on a replica-specific half of
   the dimensions (cosine(original, replica) ~= 0 -> no manufactured
   similar pairs; intra-replica structure intact);
 - orders / lineitem: key offsets (as before).

SPROBE_SKEW=1 adds a SKEWED-replica mode: ~90% of document replicas
additionally collapse onto ONE hot (lang, source) key — the "English is
half the web corpus" shape. Text perturbation is unchanged, so content-
keyed families (minhash bands, simhash tables, fingerprints) see no
manufactured duplicate pairs; only the partition-key distribution skews.
A query whose plan ranks/aggregates per lang or per domain through a
single-task window degrades toward the FULL data factor times the hot
share under this probe; the decomposed (key, bucket) forms stay flat.
Results recorded in BASELINE.md next to the uniform probe.
"""
import json
import os
import shutil
import subprocess
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
ALPHA = "abcdefghijklmnopqrstuvwxyz"

SKEW = os.environ.get("SPROBE_SKEW", "") not in ("", "0")

# skew mode default: the per-key rank/agg family (where a hot language
# or domain would serialize a naive plan) plus the content-keyed dedup
# family (whose keys are hash-derived and must stay flat regardless)
SKEW_QUERIES = ("q_lang_rebalance,q_curation_pipeline,q_ppl_buckets,"
                "q_mix_materialize,q_domain_cap,q_value_counts,q_mode,"
                "q_lang_id,q_dedup_exact,q_dedup_minhash_lsh,"
                "q_simhash_pairs,q_token_topk,q_stratified_sample,"
                # the explicit skew-handling operators themselves
                "q_salted_join,q_skew_diag")

QUERIES = os.environ.get("SPROBE_QUERIES",
           SKEW_QUERIES if SKEW else
           "q_quality_score,q_lang_id,q_token_topk,q_dedup_exact,"
           "q_ks_test,q_spearman,q_agg_groupsum,"
           "q_tfidf,q_pmi_bigrams,q_doc_chunks,q_seq_packing,"
           # pair-generation family — the one place a quadratic would hide
           "q_simhash_pairs,q_dedup_embedding,q_ann_lsh,"
           "q_dedup_minhash_lsh,q_ngram_jaccard,q_cosine_topk,"
           "q_jaccard_topk_lsh,q_ppjoin,q_triangles,"
           # retrieval family (round 11: scaled-long sums + fused RRF)
           "q_bm25_topk,q_rrf_fusion,q_hard_negatives,"
           # k-means family (round 4: deterministic Lloyd + PQ/probe-stats)
           "q_ann_ivf,q_ann_pq,q_ivf_probe_stats,q_embed_dedup_canon,"
           "q_substring_dup,q_substring_winnow")


def replica_select(table, i, src):
    """SELECT for replica i (0 = original) of one table."""
    base = f"SELECT * FROM read_parquet('{src}')"
    if i == 0:
        if table == "events":
            # replica 0 must match the BIGINT-nanos ts of replicas 1+
            # (see the events branch below) or the UNION type-mismatches
            return (f"SELECT * REPLACE (CAST(epoch_ns(ts) AS BIGINT) AS ts) "
                    f"FROM read_parquet('{src}')")
        return base
    off = 100_000_000 * i
    if table == "documents":
        shifted = ALPHA[i:] + ALPHA[:i]  # Caesar shift by i
        hot = ""
        if SKEW and i % 10 != 0:
            # ~90% of replicas collapse onto one hot (lang, source) key;
            # text stays perturbed, so only the key distribution skews
            hot = ", 'en' AS lang, 'hotsite' AS source"
        return (f"SELECT * REPLACE (doc_id + {off} AS doc_id, "
                f"translate(text, '{ALPHA}', '{shifted}') AS text{hot}) "
                f"FROM read_parquet('{src}')")
    if table == "embeddings":
        # flip a replica-specific pseudo-random half of the dims (j is
        # 1-based). The mask must be period-free in i: the old
        # (j + i) % 4 form repeated every 4 replicas, so replicas
        # {1,5,9,13} carried IDENTICAL masks and their vectors were true
        # near-dups of each other — at 16x that manufactured ~200x
        # quadratic pair growth in the dedup family and the probe
        # measured the data, not the algorithm (round-7 finding). An LCG
        # mix of (replica, dim) gives each replica an independent
        # half-flip, so cross-replica cosines sit near 0 at any k.
        return (f"SELECT * REPLACE (vec_id + {off} AS vec_id, "
                f"list_transform(embedding, (x, j) -> "
                f"CAST(CASE WHEN (j * 2654435761 + {i} * 40503) % 1000003 % 2 = 0 "
                f"THEN -x ELSE x END AS FLOAT)) "
                f"AS embedding) FROM read_parquet('{src}')")
    if table == "events":
        # disjoint per-replica user/event id spaces: groups and join
        # keys grow linearly, no manufactured hot keys or cross-replica
        # matches; timestamps unchanged so window population scales
        # ts: written as the nanos BIGINT directly — the generator has
        # shipped both TIMESTAMP(NANOS) and TIMESTAMP_MICROS over rounds,
        # and Tables.normalizeEvents canonicalizes every physical form
        # (micros TIMESTAMP/NTZ or nanos BIGINT) to the same nanos LONG,
        # so the probe data matches whatever the source carried
        return (f"SELECT * REPLACE (event_id + {off} AS event_id, "
                f"user_id + {off} AS user_id, "
                f"CAST(epoch_ns(ts) AS BIGINT) AS ts) FROM read_parquet('{src}')")
    if table == "orders":
        return f"SELECT * REPLACE (o_orderkey + {off} AS o_orderkey) FROM read_parquet('{src}')"
    if table == "lineitem":
        return f"SELECT * REPLACE (l_orderkey + {off} AS l_orderkey) FROM read_parquet('{src}')"
    return None  # dimension tables: never replicated


def build(k, dest):
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{SRC}/{t}.parquet"
        out = f"{dest}/{t}.parquet"
        if k == 1 or replica_select(t, 1, src) is None:
            shutil.copyfile(src, out)
            continue
        selects = [replica_select(t, i, src) for i in range(k)]
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{out}' (FORMAT PARQUET)")


def bench(dest):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=dest, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_ONLY=QUERIES, SPARK_GRAFT_BENCH_OUT="off")
    out = subprocess.run(
        ["java", "-cp", "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*",
         "-Xmx48g", "graft.Bench"],
        env=env, capture_output=True, text=True)
    # Bench exits 2 on any DNF but still prints the JSON line; a DNF'd
    # query is simply absent from "queries" and shows as n/a below.
    # Bench prints TWO json lines (full record, then a <2000-char summary
    # for the driver's tail-capture) — take the last one carrying the
    # full per-query map.
    rec = next(json.loads(l) for l in reversed(out.stdout.strip().splitlines())
               if '"queries"' in l)
    for e in rec.get("errors", []):
        print(f"  DNF at {dest}: {e}", file=sys.stderr)
    return rec["queries"]


def main():
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    results = {}
    for k in ks:
        dest = f"/tmp/{'skew' if SKEW else 'scale'}{k}x"
        build(k, dest)
        results[k] = bench(dest)
        print(f"scale {k}x done", file=sys.stderr)
    qs = sorted(results[ks[0]])
    hdr = " ".join(f"{k}x".rjust(7) for k in ks)
    print(f"{'query':24s} {hdr} {'max/1x':>7s}")
    for q in qs:
        vals = " ".join(
            f"{results[k][q]:7.2f}" if q in results[k] else "    n/a"
            for k in ks)
        last, first = results[ks[-1]].get(q), results[ks[0]].get(q)
        ratio = f"{last / first:7.2f}" if last and first else "    n/a"
        print(f"{q:24s} {vals} {ratio}")


if __name__ == "__main__":
    main()
