#!/usr/bin/env bash
# Environment-shift evidence collector (ADVICE r14 / VERDICT r14 #5).
#
# bench_diff.py only median-normalizes a round-over-round uniform shift
# when attrib.json carries measured evidence that the shift is the BOX,
# not the code. This script produces that evidence the r14 way, but
# automated: rebuild the PREVIOUS round's commit in a scratch git
# worktree, run the 5-query canary set (the same set graft.Bench's
# pre-flight uses) on TODAY's box, and compare those readings to the
# same queries' readings in the previous round's own bench_full. If
# byte-identical old code reads ~the new shift slower/faster today, the
# environment moved; the per-query numbers are written into attrib.json
# as "__environment__" (plus per-query "environment" entries for any
# canary member that is itself a mover).
#
# Usage: tools/env_canary.sh <prev_commit> <prev_bench_full.json> <attrib.json>
set -euo pipefail
cd "$(dirname "$0")/.."
PREV_COMMIT="${1:?usage: env_canary.sh <prev_commit> <prev_bench_full.json> <attrib.json>}"
PREV_BENCH="${2:?prev bench_full.json}"
ATTRIB="${3:?attrib.json}"
CANARY="dedup_exact_survivors,interarrival_stats,krippendorff_alpha_components,tpch_q17_small_qty,twap_daily"

WT=/tmp/graft_envcheck_wt
git worktree remove --force "$WT" 2>/dev/null || true
git worktree add --force "$WT" "$PREV_COMMIT" >&2

pushd "$WT" >/dev/null
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_ONLY="$CANARY" SPARK_GRAFT_BENCH_PASSES=2 \
SPARK_GRAFT_SOLO_THRESHOLD=9999 SPARK_GRAFT_PREFLIGHT=off \
SPARK_GRAFT_BENCH_OUT=/tmp/env_canary_bench.json \
  sbt -batch "runMain graft.Bench" >&2
popd >/dev/null
git worktree remove --force "$WT" >&2 || true

python3 - "$PREV_COMMIT" "$PREV_BENCH" "$ATTRIB" <<'EOF'
import json, sys
prev_commit, prev_bench_path, attrib_path = sys.argv[1:4]
today = json.load(open("/tmp/env_canary_bench.json"))["queries"]
prev = json.load(open(prev_bench_path))["queries"]
ratios = {}
for q, e in today.items():
    if q in prev and prev[q]["best"] > 0 and e["best"] > 0:
        ratios[q] = round(e["best"] / prev[q]["best"], 3)
if not ratios:
    sys.exit("no overlapping canary queries between runs")
med = sorted(ratios.values())[len(ratios) // 2]
import os
attrib = json.load(open(attrib_path)) if os.path.exists(attrib_path) else {}
attrib["__environment__"] = {
    "source": f"canary set on prev-round code ({prev_commit}) vs its own "
              f"recorded bench_full readings",
    "median_ratio": med,
    "per_query_ratio": ratios,
    "prev_code_on_today_box_sec": {q: today[q]["best"] for q in ratios},
}
# Per-query entries too (the header's promise, unimplemented until r16):
# a canary member that is ITSELF a mover would otherwise fail strict mode
# as unattributed despite this very evidence having been collected —
# bench_diff's strongest evidence class ("environment": prev-round code
# reproduces the new reading on today's box) reads exactly these.
for q in ratios:
    attrib.setdefault(q, {})["environment"] = {
        "prev_code_on_today_box_sec": today[q]["best"],
        "ratio_vs_prev_recorded": ratios[q],
    }
with open(attrib_path, "w") as f:
    json.dump(attrib, f, indent=1, sort_keys=True)
print(f"[env-canary] median ratio of prev code on today's box: {med} "
      f"({ratios}) -> wrote __environment__ to {attrib_path}")
EOF
