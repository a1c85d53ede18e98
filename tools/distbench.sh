#!/usr/bin/env bash
# Multi-JVM bench (VERDICT r12 item 3): run graft.Bench under a
# local-cluster topology of EQUAL TOTAL CORES to the local[32] record,
# so the delta prices exactly what a real cluster pays that a single
# JVM hides — task/closure/broadcast serialization, per-executor codegen
# compilation, cross-process (Netty) shuffle fetch — with the data and
# per-query methodology (3-pass min) held fixed.
# Driver-side tooling only — NOT part of the Spark library.
#
# Usage: tools/distbench.sh [sfdir] [executors] [cores] [memMB] [outjson]
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.1}
N=${2:-4}
C=${3:-8}
M=${4:-12288}
OUTJSON=${5:-bench/results/distbench-$(date -u +%Y%m%d-%H%M%S).json}
TMPOUT=$(mktemp -d /tmp/distbench-out-XXXX)

SPARK_GRAFT_MASTER="local-cluster[$N,$C,$M]" \
SPARK_GRAFT_CPUS=$((N * C)) \
SPARK_GRAFT_SF_DIR="$SF" \
SPARK_GRAFT_BENCH_OUT="$TMPOUT" \
SPARK_GRAFT_CKPT_DIR=$(mktemp -d /tmp/distbench-ckpt-XXXX) \
SPARK_GRAFT_INDEX_DIR=$(mktemp -d /tmp/distbench-idx-XXXX) \
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
java -Xmx16g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Dspark.executor.extraClassPath=$PWD/target/scala-2.13/classes" \
  -cp "$PWD/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench
RC=$?
if [ -f "$TMPOUT/latest.json" ]; then
  cp "$TMPOUT/latest.json" "$OUTJSON"
  echo "distbench record: $OUTJSON"
fi
exit $RC
