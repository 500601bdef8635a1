#!/usr/bin/env bash
# Task-TIME vs task-WORK decomposition for the TPC-H tier (VERDICT r14 #1).
#
# TPCH_SF10_r14 left a super-linear TASK-time signal unexplained:
# tpch_q12_shaped Σ-task-sec grew 27.6x on the 10x sf1->sf10 step (q11
# 24.4x with 16% GC, q5 22.4x) while wall growth was attributed to
# saturation. Two mechanisms read identically in that artifact:
# contention-inflated task clocks (32 tasks sharing memory bandwidth /
# LLC on a saturated 32-vCPU box — executorRunTime is per-task
# wall-clock, so a memory-stalled task "runs" longer doing the same
# work) vs real per-row work growth (a genuine 100TB hazard).
#
# graft.TpchWorkProbe separates them with a concurrency sweep: each
# query runs solo at 32 threads and at 8 threads on every tier. Real
# work is concurrency-invariant; contention inflation shrinks with
# concurrency. The gate reads the 8-thread (least-contended) per-row
# task-us growth across each adjacent tier pair: <= ~1.5x/decade =
# per-row work is flat and the 32-thread task-time bend is contention,
# decomposed and recorded; > 1.5x = UNEXPLAINED (exit 5).
#
# r16 additions:
#  - TPCH_WORK_TIERS takes any label:dir list, so the FIRST decade
#    (sf0.1->sf1) can carry a decomposed verdict too (ADVICE r15 — the
#    scale10 gate previously hard-failed any first-decade bend because
#    only sf1/sf10 were ever probed); growth verdicts are emitted per
#    adjacent pair under "growth".
#  - FORCED-SHUFFLE leg (VERDICT r15 #3): for joins that graduate off
#    broadcast between tiers, the normal probe's per-row growth compares
#    two DIFFERENT plans. A second pass with auto-broadcast disabled
#    runs the shuffle plan on BOTH tiers (8 threads, the least-contended
#    clock), turning "post-graduation work is linear" from an assertion
#    into a measurement. Gate: same-plan per-row growth <= 1.3x/decade.
#
# Usage: tools/tpch_work.sh [outJson]
#   env TPCH_WORK_QUERIES   main-probe query list
#   env TPCH_WORK_TIERS     label:dir,label:dir,... (adjacent pairs gated)
#   env TPCH_WORK_FORCED    forced-shuffle query list (empty to skip)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-TPCH_WORK_r16.json}"
QS="${TPCH_WORK_QUERIES:-tpch_q5_region_revenue,tpch_q11_shaped,tpch_q12_shaped}"
TIERS="${TPCH_WORK_TIERS:-sf1:/root/repo/tmp-tpch-sf1,sf10:/root/repo/tmp-tpch-sf10}"
FORCED="${TPCH_WORK_FORCED:-probe_orders_x_customer,tpch_q5_region_revenue}"

[ -e /root/repo/tmp-tpch-sf1/lineitem.parquet ] || \
  sbt -batch "Test/runMain graft.GenTpchScale /root/repo/tmp-tpch-sf1 10"
[ -e /root/repo/tmp-tpch-sf10/lineitem.parquet ] || \
  SPARK_DRIVER_MEM=24g sbt -batch "Test/runMain graft.GenTpchScale /root/repo/tmp-tpch-sf10 100"

TIER_ARGS=""
TIER_LABELS=""
IFS=',' read -ra TS <<< "$TIERS"
for t in "${TS[@]}"; do
  LABEL="${t%%:*}"; DIR="${t#*:}"
  TIER_ARGS="$TIER_ARGS $DIR:$LABEL"
  TIER_LABELS="$TIER_LABELS,$LABEL"
done
TIER_LABELS="${TIER_LABELS#,}"

LINES=$(SPARK_GRAFT_WORK_CPUS=32,8 SPARK_DRIVER_MEM=48g sbt -batch \
  "Test/runMain graft.TpchWorkProbe $QS $TIER_ARGS" \
  | grep '"probe"' | sed 's/^\[info\] //' || true)
[ -n "$LINES" ] || { echo "[tpch-work] probe produced no lines" >&2; exit 1; }

FORCED_LINES=""
if [ -n "$FORCED" ]; then
  FORCED_LINES=$(SPARK_GRAFT_WORK_CPUS=8 SPARK_GRAFT_WORK_FORCE_SHUFFLE=1 \
    SPARK_DRIVER_MEM=48g sbt -batch \
    "Test/runMain graft.TpchWorkProbe $FORCED $TIER_ARGS" \
    | grep '"probe"' | sed 's/^\[info\] //' || true)
  [ -n "$FORCED_LINES" ] || { echo "[tpch-work] forced-shuffle probe produced no lines" >&2; exit 1; }
fi

LINES="$LINES" FORCED_LINES="$FORCED_LINES" TIER_LABELS="$TIER_LABELS" \
  python3 - "$OUT" <<'EOF'
import json, os, sys
rows = [json.loads(l) for l in os.environ["LINES"].strip().splitlines()]
forced = [json.loads(l)
          for l in os.environ.get("FORCED_LINES", "").strip().splitlines() if l]
labels = os.environ["TIER_LABELS"].split(",")
pairs = [(labels[i], labels[i + 1]) for i in range(len(labels) - 1)]
by = {}
for r in rows:
    by.setdefault(r["probe"], {})[(r["tier"], r["cpus"])] = r
fby = {}
for r in forced:
    fby.setdefault(r["probe"], {})[r["tier"]] = r
out = {"note": ("Concurrency-sweep decomposition of TPC-H task-time "
                "growth: task_us_per_row at 8 threads is the least-"
                "contended per-row work reading; contention_factor = "
                "task_sec(32 threads)/task_sec(8 threads) on the same "
                "tier/data (1.0 = honest clocks, >1 = inflation). "
                "forced_shuffle entries re-run the query with "
                "auto-broadcast disabled on every tier, so per-row "
                "growth there is a SAME-PLAN comparison (gate 1.3x)."),
       "tiers": labels, "queries": {}}
fails = []
for q, d in sorted(by.items()):
    def g(t, c, k):
        return d.get((t, c), {}).get(k)
    e = {"runs": {f"{t}@{c}": d[(t, c)] for (t, c) in sorted(d)}}
    for tier in labels:
        if g(tier, 32, "task_sec") and g(tier, 8, "task_sec"):
            e[f"contention_factor_{tier}"] = round(
                g(tier, 32, "task_sec") / g(tier, 8, "task_sec"), 2)
    for lo, hi in pairs:
        if not (g(lo, 8, "task_us_per_row") and g(hi, 8, "task_us_per_row")):
            continue
        gname = f"{lo}->{hi}"
        pr = round(g(hi, 8, "task_us_per_row") /
                   g(lo, 8, "task_us_per_row"), 2)
        ge = {"per_row_work_growth_at8": pr}
        if g(lo, 32, "task_sec") and g(hi, 32, "task_sec"):
            ge["task_growth_at32"] = round(
                g(hi, 32, "task_sec") / g(lo, 32, "task_sec"), 2)
        if g(hi, 32, "task_sec"):
            ge[f"gc_frac_{hi}_at32"] = round(
                g(hi, 32, "gc_sec") / g(hi, 32, "task_sec"), 3)
        # Plan-shape transition detector: shuffle rows per INPUT row. A
        # broadcast join graduating to a shuffle join between tiers (the
        # behavior the scale gate REWARDS — forcing the broadcast would
        # be the 100TB bug) adds a full exchange of the fact rows to the
        # big tier that the small tier never paid: per-row "work" then
        # grows because the plan does a different, correct thing, not
        # because an operator inflates.
        sprlo = (g(lo, 8, "shuffle_rows") or 0) / max(g(lo, 8, "rows_read") or 1, 1)
        sprhi = (g(hi, 8, "shuffle_rows") or 0) / max(g(hi, 8, "rows_read") or 1, 1)
        ge["shuffle_rows_per_input"] = {lo: round(sprlo, 4),
                                        hi: round(sprhi, 4)}
        if pr <= 1.5:
            ge["verdict"] = (
                f"per-row work flat across the decade ({pr}x at 8 "
                f"threads); any 32-thread task-time bend is contention-"
                f"inflated clocks (factor {e.get(f'contention_factor_{hi}')}"
                f" at {hi} vs {e.get(f'contention_factor_{lo}')} at {lo})")
        elif sprhi > 2 * max(sprlo, 0.01):
            fs = fby.get(q, {})
            note = ""
            if lo in fs and hi in fs and fs[lo].get("task_us_per_row", 0) > 0:
                fpr = round(fs[hi]["task_us_per_row"] /
                            fs[lo]["task_us_per_row"], 2)
                note = (f"; same-plan (forced-shuffle) per-row growth "
                        f"{fpr}x confirms post-graduation linearity"
                        if fpr <= 1.3 else
                        f"; WARNING same-plan forced-shuffle growth {fpr}x")
            ge["verdict"] = (
                f"plan-shape transition: per-row work grew {pr}x because "
                f"a broadcast join graduated to a shuffle join between "
                f"the tiers (shuffle rows per input row {round(sprlo, 4)} "
                f"-> {round(sprhi, 4)}) — the added exchange is the "
                f"optimizer scaling correctly{note}")
        else:
            ge["verdict"] = (f"UNEXPLAINED: per-row work grew {pr}x per "
                             f"decade even at 8 threads")
            fails.append(f"{q} {gname}: {pr}x")
        e.setdefault("growth", {})[gname] = ge
        # legacy top-level keys for the sf1->sf10 pair (r15 artifact
        # shape — tpch_scale10.sh and the round diffs read them)
        if (lo, hi) == ("sf1", "sf10"):
            e["per_row_work_growth_at8"] = pr
            e["task_growth_at32"] = ge.get("task_growth_at32")
            e["gc_frac_sf10_at32"] = ge.get("gc_frac_sf10_at32")
            e["shuffle_rows_per_input"] = ge["shuffle_rows_per_input"]
            e["verdict"] = ge["verdict"]
    out["queries"][q] = e
for q, fs in sorted(fby.items()):
    fe = {"runs": {t: fs[t] for t in sorted(fs)}}
    for lo, hi in pairs:
        if lo in fs and hi in fs and fs[lo].get("task_us_per_row", 0) > 0:
            fpr = round(fs[hi]["task_us_per_row"] /
                        fs[lo]["task_us_per_row"], 2)
            fe.setdefault("growth", {})[f"{lo}->{hi}"] = fpr
            if fpr > 1.3:
                fails.append(f"{q} forced-shuffle {lo}->{hi}: {fpr}x "
                             f"(same-plan gate 1.3x)")
    out.setdefault("forced_shuffle", {})[q] = fe
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(json.dumps({q: {k: v for k, v in e.items() if k != "runs"}
                  for q, e in out["queries"].items()}, indent=1,
                 sort_keys=True))
print(json.dumps({q: {k: v for k, v in e.items() if k != "runs"}
                  for q, e in out.get("forced_shuffle", {}).items()},
                 indent=1, sort_keys=True))
if fails:
    print("[tpch-work] UNEXPLAINED per-row work growth: " + "; ".join(fails))
    sys.exit(5)
EOF
