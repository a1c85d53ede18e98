#!/usr/bin/env bash
# Executor-loss CHAOS harness: run a Verify subset under
# local-cluster[3,2,1024] while SIGKILLing one live executor every 6s
# until the run finishes. This is the harness that exposed the round-12
# localCheckpoint bug class (q_rrf_fusion: CHECKPOINT_RDD_BLOCK_ID_NOT_
# FOUND; q_mad_outlier: STAGE_MATERIALIZATION_MULTIPLE_FAILURES) and
# that proves Materialize.cut / exchange-reuse recovery: a healthy run
# reports verify_exit=0, kills>0, lost>0 and zero "failed:" lines.
#
# Usage: tools/ftchaos.sh <comma-separated-queries> <sfdir> [outdir]
# Driver-side tooling only — NOT part of the Spark library. The
# single-kill, row-diffed version of this check runs in every `sbt
# test` (FaultToleranceSpec); this script is the heavier manual probe.
set -uo pipefail
cd "$(dirname "$0")/.."

Q=${1:?queries}; SF=${2:?sfdir}; OUT=${3:-/tmp/graft_ftchaos}
rm -rf "$OUT"
LOG=$(mktemp /tmp/ftchaos-XXXX.log)
# unique per-run tag planted in executor command lines: the kill loop
# pgreps THIS tag, never a bare CoarseGrainedExecutorBackend — on a
# shared host that pattern could SIGKILL an unrelated Spark app's
# executor (ADVICE r12)
TAG=$(head -c6 /dev/urandom | od -An -tx1 | tr -d ' \n')

ADD_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
    java.net java.nio java.util java.util.concurrent \
    java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action \
    sun.util.calendar; do echo --add-opens java.base/$p=ALL-UNNAMED; done)

# SPARK_GRAFT_CKPT_DIR: Materialize.cut fails fast on a non-local master
# without one (r13); local-cluster executors share this machine, so a
# tmp path is cluster-visible here. Script-created scratch is swept on
# exit (ADVICE r13: chaos rotations accumulated 40+ /tmp ckpt trees) —
# Materialize itself never sweeps an env-provided dir, by contract.
CKPT=$(mktemp -d /tmp/ftchaos-ckpt-XXXX)
IDX=$(mktemp -d /tmp/ftchaos-idx-XXXX)
trap 'rm -rf "$CKPT" "$IDX"' EXIT
SPARK_GRAFT_MASTER='local-cluster[3,2,1024]' SPARK_GRAFT_CPUS=6 \
SPARK_GRAFT_ONLY="$Q" SPARK_GRAFT_INDEX_DIR="$IDX" \
SPARK_GRAFT_CKPT_DIR="$CKPT" \
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Dspark.executor.extraClassPath=$PWD/target/scala-2.13/classes" \
  "-Dspark.executor.extraJavaOptions=-Dgraft.chaos.tag=$TAG" \
  -cp "$PWD/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT" > "$LOG" 2>&1 &
VPID=$!
NK=0
sleep 18   # session spin-up; kills before executors exist are wasted
while kill -0 $VPID 2>/dev/null; do
  # tag AND executor-class intersection: the tag alone also matches the
  # DRIVER (it carries the tag inside -Dspark.executor.extraJavaOptions)
  EPID=$(comm -12 <(pgrep -f "graft.chaos.tag=$TAG" | sort) \
                  <(pgrep -f CoarseGrainedExecutorBackend | sort) | head -1)
  if [ -n "$EPID" ]; then kill -9 "$EPID" 2>/dev/null && NK=$((NK+1)); fi
  sleep 6
done
wait $VPID; RC=$?
echo "verify_exit=$RC kills=$NK lost=$(grep -ac 'Lost executor' "$LOG")"
grep -a "failed:" "$LOG" | head -5
echo "log: $LOG out: $OUT"
[ "$RC" -eq 0 ] && [ "$NK" -gt 0 ] && ! grep -aq "failed:" "$LOG"
