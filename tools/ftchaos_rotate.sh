#!/usr/bin/env bash
# Full-surface executor-kill chaos rotation (VERDICT r12 item 2):
# rotate EVERY query name through tools/ftchaos.sh in cohorts, so
# "survives executor loss" is a surface property rather than a family
# sample. Driver-side tooling only — NOT part of the Spark library.
#
# Usage: tools/ftchaos_rotate.sh <queries-file> <sfdir> [cohort-size] [report]
# queries-file: one query name per line (e.g. all 195 from the last
# CORRECTNESS json). Each cohort runs Verify under local-cluster with a
# SIGKILL every 6s (see ftchaos.sh); a cohort passes iff verify exits 0,
# >=1 kill landed, and no query failed. The report accumulates one line
# per cohort plus a final verdict; a failed cohort does NOT stop the
# rotation (we want the full failure surface in one pass).
set -uo pipefail
cd "$(dirname "$0")/.."

QF=${1:?queries-file}; SF=${2:?sfdir}; CO=${3:-16}
REPORT=${4:-/tmp/ftchaos_rotate_report.txt}
: > "$REPORT"

mapfile -t ALLQ < <(grep -v '^\s*$' "$QF")
TOTAL=${#ALLQ[@]}
FAILED=0
i=0
c=0
while [ $i -lt $TOTAL ]; do
  COHORT=("${ALLQ[@]:$i:$CO}")
  Q=$(IFS=,; echo "${COHORT[*]}")
  c=$((c+1))
  echo "=== cohort $c (${#COHORT[@]} queries, starting at index $i) ===" | tee -a "$REPORT"
  OUTLINE=$(tools/ftchaos.sh "$Q" "$SF" "/tmp/graft_ftchaos_c$c" 2>&1)
  RC=$?
  echo "$OUTLINE" | tee -a "$REPORT"
  if [ $RC -ne 0 ]; then
    FAILED=$((FAILED+1))
    echo "COHORT $c FAILED: $Q" | tee -a "$REPORT"
  fi
  i=$((i+CO))
done
echo "rotation done: $c cohorts over $TOTAL queries, $FAILED failed" | tee -a "$REPORT"
[ $FAILED -eq 0 ]
