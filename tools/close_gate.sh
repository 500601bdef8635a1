#!/usr/bin/env bash
# Round-close gate (VERDICT r10 #4, the recurrence of r9 #3): run this as
# the LAST step of a round, AFTER the query surface freezes. PlanAudit
# already hard-fails (exit 3) unless the number of audited plans equals
# SparkEntry.queries.size — but only if it is actually re-run against the
# final build. This script is that re-run, plus the full-surface verify
# check, so a stale or partial artifact can no longer ship silently.
#
# Usage: tools/close_gate.sh <round>        e.g. tools/close_gate.sh r11
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: tools/close_gate.sh <round, e.g. r11>}"

echo "[close-gate] plan audit over the frozen surface..."
# sf0.01 (not 0.001) since r12: the audit now EXECUTES every query and
# classifies each SinglePartition exchange by measured rows-in — the
# corpus-vs-domain distinction needs the bigger fixture to be visible.
SPARK_GRAFT_AUDIT_OUT="PLAN_AUDIT_${ROUND}.json" SPARK_GRAFT_CPUS=8 \
  sbt -batch "runMain graft.PlanAudit /root/testdata/sf0.01"
cp "PLAN_AUDIT_${ROUND}.json" plan_audit.json

N_AUDITED=$(python3 -c "import json;print(json.load(open('PLAN_AUDIT_${ROUND}.json'))['__summary']['n_queries'])")
echo "[close-gate] audited $N_AUDITED plans (PlanAudit exits non-zero on any mismatch/failure/cartesian)"
echo "[close-gate] OK — commit PLAN_AUDIT_${ROUND}.json + plan_audit.json"
