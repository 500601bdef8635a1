#!/usr/bin/env bash
# Round-close gate (VERDICT r10 #4, r12 #1/#5): run this as the LAST step
# of a round, AFTER the query surface freezes. Four machine checks:
#  1. GROWTH-mode plan audit (r13): every query EXECUTES at sf0.01 AND
#     sf0.1; each SinglePartition exchange's measured rows-in is paired
#     across the 10x corpus step and classed by GROWTH — flat/tiny/
#     below_limit pass, corpus-proportional fails (exit 4). PlanAudit
#     also hard-fails (exit 3) unless the audited plan count equals
#     SparkEntry.queries.size, so a stale/partial artifact can't ship.
#  2. Full-surface verify + DuckDB oracle at sf0.01 (the driver gate's
#     scale factor).
#  3. The SAME full oracle pass at sf0.1 (VERDICT r12 #5): scale-
#     dependent bugs — banding gates, density thresholds, quantization
#     ties — are exactly what sf0.01 can miss.
#  4. The ATTRIBUTION GATE (r16, VERDICT r15 #1): bench_diff --attrib
#     --strict against the previous round's bench_full must exit 0 —
#     r15 shipped with this gate at exit 5 behind a TBD checkbox, which
#     this step makes impossible: the round's bench_full_<round>.json
#     must exist, every >1.5x mover must carry a commit, a converged
#     remeasure, or environment evidence, and any non-zero exit fails
#     the close. bench_attrib.py is run first to collect what's missing
#     (it remeasures unexplained regressions in fresh JVMs).
#
# Usage: tools/close_gate.sh <round>        e.g. tools/close_gate.sh r13
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: tools/close_gate.sh <round, e.g. r13>}"

echo "[close-gate] growth-mode plan audit over the frozen surface..."
SPARK_GRAFT_AUDIT_OUT="PLAN_AUDIT_${ROUND}.json" SPARK_GRAFT_CPUS=8 \
  sbt -batch "runMain graft.PlanAudit /root/testdata/sf0.01 /root/testdata/sf0.1"
cp "PLAN_AUDIT_${ROUND}.json" plan_audit.json

N_AUDITED=$(python3 -c "import json;print(json.load(open('PLAN_AUDIT_${ROUND}.json'))['__summary']['n_queries'])")
echo "[close-gate] audited $N_AUDITED plans (growth-classified; PlanAudit exits non-zero on any mismatch/failure/cartesian/unreviewed)"

for SF in 0.01 0.1; do
  echo "[close-gate] full-surface verify + oracle at sf$SF..."
  OUT="/tmp/graft_close_verify_sf${SF/./}"
  rm -rf "$OUT"
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf$SF $OUT"
  python3 tools/compare_oracle.py "/root/testdata/sf$SF" "$OUT" \
    | tail -3 | tee "/tmp/close_oracle_sf${SF/./}.txt"
  tail -1 "/tmp/close_oracle_sf${SF/./}.txt" | grep -q " 0 fail" || {
    echo "[close-gate] ORACLE FAIL at sf$SF"; exit 6; }
done

echo "[close-gate] attribution gate (bench_diff --attrib --strict)..."
BENCH_NEW="bench_full_${ROUND}.json"
[ -f "$BENCH_NEW" ] || {
  echo "[close-gate] MISSING $BENCH_NEW — run graft.Bench (SPARK_GRAFT_BENCH_OUT=$BENCH_NEW) before closing"; exit 7; }
# previous round = highest-numbered bench_full_rNN.json below this one
BENCH_PREV=$(ls bench_full_r*.json 2>/dev/null | grep -v "_${ROUND}\.json" \
  | grep -E 'bench_full_r[0-9]+\.json' | sort -V \
  | awk -v cur="bench_full_${ROUND}.json" '$0 < cur' | tail -1)
[ -n "$BENCH_PREV" ] || { echo "[close-gate] no previous bench_full to diff against"; exit 7; }
ATTRIB="bench_attrib_${ROUND}.json"
python3 tools/bench_attrib.py "$BENCH_PREV" "$BENCH_NEW" "$ATTRIB"
python3 tools/bench_diff.py "$BENCH_PREV" "$BENCH_NEW" --attrib "$ATTRIB" --strict \
  | tee "/tmp/close_bench_diff_${ROUND}.txt" || {
    echo "[close-gate] ATTRIBUTION GATE FAILED (see above) — every mover needs a commit, remeasure, or environment evidence"; exit 5; }
echo "[close-gate] OK — commit PLAN_AUDIT_${ROUND}.json + plan_audit.json + $BENCH_NEW + $ATTRIB"
