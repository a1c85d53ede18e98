#!/usr/bin/env bash
# Distributed-execution parity gate: run the FULL Verify surface under
# local-cluster[N,C,M] — Spark's in-box multi-process master, where each
# executor is a SEPARATE JVM — then diff against the DuckDB oracle with
# tools/check.py. local[n] runs tasks in the driver JVM and therefore
# never exercises task/closure/broadcast serialization, per-executor
# codegen compilation, or cross-process shuffle fetch; a custom
# Expression holding non-serializable state, or a plan depending on
# shared-JVM object identity, is invisible to every other gate in this
# repo. This one sees it.
#
# Usage: tools/distparity.sh [sfdir] [outdir] [executors] [cores] [memMB]
# Driver-side tooling only — NOT part of the Spark library.
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft_distparity}
N=${3:-4}
C=${4:-4}
M=${5:-2048}

# NB: no failing glob here — under `set -euo pipefail` an unmatched ls
# pattern exits 2 and would kill the script at this assignment.
JAR=$(find target/scala-2.13 -maxdepth 1 -name '*_2.13-*.jar' -printf '%T@ %p\n' 2>/dev/null | sort -rn | head -1 | cut -d' ' -f2-)
if [ -z "${JAR:-}" ]; then
  echo "[distparity] no package jar — run 'sbt package' first" >&2
  exit 2
fi

rm -rf "$OUT"
# The app jar is shipped to executors via spark.jars automatically;
# SPARK_GRAFT_MASTER overrides Verify's single-JVM default.
# SPARK_GRAFT_CKPT_DIR: Materialize.cut fails fast on a non-local master
# without one (r13); local-cluster shares this machine's filesystem.
# Swept on exit: env-provided roots are never cleaned by Materialize.
CKPT=$(mktemp -d /tmp/distparity-ckpt-XXXX)
trap 'rm -rf "$CKPT"' EXIT
SPARK_GRAFT_MASTER="local-cluster[$N,$C,$M]" \
SPARK_GRAFT_CPUS=$((N * C)) \
SPARK_GRAFT_CKPT_DIR="$CKPT" \
/opt/spark/bin/spark-submit \
  --master "local-cluster[$N,$C,$M]" \
  --class graft.Verify \
  --conf spark.sql.shuffle.partitions=$((N * C)) \
  --conf spark.ui.enabled=false \
  "$JAR" "$SF" "$OUT"

python3 tools/check.py "$SF" "$OUT"
