#!/usr/bin/env bash
# x100 scale tier for the graph/components/ANN families (VERDICT r11 #2):
# SCALE_r11 measured these only at 10x. Three parts:
#  - per-query growth for the kNN-graph consumers + incremental-components
#    maintenance at base/x10/x100 vector corpora (graft.Bench, min-of-2,
#    so the reported figure is the steady-state SERVING cost — staging is
#    absorbed by pass 1 exactly as a deployment amortizes it);
#  - the one-time kNN layout BUILD cost curve (GraphScaleBench: cold vs
#    warm knnEdges in a fresh session per decade) — the number that the
#    bench amortizes away and r11 flagged as 16->50 s at 10x;
#  - the IVF-layout + ANN serving path growth (ann_persisted_ivf_index,
#    embed_neardup_lsh_scaled rides in the main SCALE artifact already).
#
# Reuses the GenScaleData corpora from tools/scale_bench.sh (generates
# them if missing). Usage: tools/scale_graph.sh [outJson]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-SCALE_GRAPH_r12.json}"

GRAPH_QUERIES="graph_components_knn,ivm_components_delta,bfs_layers_knn,pagerank_knn,link_prediction_knn,ann_persisted_ivf_index,ivm_ivf_append,weighted_sssp_knn,recursive_cte_reachability"

[ -d /root/repo/tmp-sf01gen/embeddings.parquet ] || \
  sbt -batch "Test/runMain graft.GenScaleData /root/repo/tmp-sf01gen 5000 2000 10000 150"
[ -d /root/repo/tmp-sf1/embeddings.parquet ] || \
  sbt -batch "Test/runMain graft.GenScaleData /root/repo/tmp-sf1 50000 20000 100000 1500"
# x100 tier carries 1M events/15k users since r13 (VERDICT r12 #4): the
# recursive-CTE/SSSP additions need a genuinely growing events side at
# every decade. Delete tmp-sf10 to force regeneration after this change.
[ -d /root/repo/tmp-sf10/embeddings.parquet ] || \
  sbt -batch "Test/runMain graft.GenScaleData /root/repo/tmp-sf10 500000 200000 1000000 15000"

run_bench() {
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY="$GRAPH_QUERIES" SPARK_GRAFT_BENCH_PASSES=2 \
  SPARK_GRAFT_SOLO_THRESHOLD=9999 \
  SPARK_GRAFT_BENCH_OUT=/tmp/scale_graph_bench.json \
    sbt -batch "runMain graft.Bench" | grep '"metric":"total"' \
    | sed 's/^\[info\] //' > /tmp/scale_graph_lines.txt || true
  # first line taken outside the pipeline (ADVICE r13): head -1 inside
  # it SIGPIPEs grep on a second matching line and pipefail aborts the
  # harness after its most expensive tier already ran
  head -1 /tmp/scale_graph_lines.txt
}

echo "[scale-graph] layout build-cost curve (cold vs warm knnEdges)..."
BUILD_JSON=$(SPARK_GRAFT_CPUS=32 sbt -batch \
  "Test/runMain graft.GraphScaleBench /root/repo/tmp-sf01gen /root/repo/tmp-sf1 /root/repo/tmp-sf10" \
  | grep '"knn_build_sec"' | sed 's/^\[info\] //')

echo "[scale-graph] per-query growth, base tier..."
BASE_JSON=$(run_bench /root/repo/tmp-sf01gen)
echo "[scale-graph] x10 tier..."
BIG_JSON=$(run_bench /root/repo/tmp-sf1)
echo "[scale-graph] x100 tier..."
X100_JSON=$(run_bench /root/repo/tmp-sf10)

BASE="$BASE_JSON" BIG="$BIG_JSON" X100="$X100_JSON" BUILD="$BUILD_JSON" \
python3 - "$OUT" <<'EOF'
import json, os, sys
base = json.loads(os.environ["BASE"])
big = json.loads(os.environ["BIG"])
x100 = json.loads(os.environ["X100"])
build = [json.loads(l) for l in os.environ["BUILD"].strip().splitlines()]
out = {
    "baseline": {"dir": base["sf"], "vecs": 2000, "queries": base["queries"],
                 "spread": base.get("spread", {})},
    "x10": {"dir": big["sf"], "vecs": 20000, "queries": big["queries"],
            "spread": big.get("spread", {})},
    "x100": {"dir": x100["sf"], "vecs": 200000, "queries": x100["queries"],
             "spread": x100.get("spread", {})},
    "growth_x10": {q: (round(big["queries"][q] / base["queries"][q], 2)
                       if base["queries"][q] > 0 else None)
                   for q in sorted(base["queries"])},
    "growth_x100": {q: (round(x100["queries"][q] / base["queries"][q], 2)
                        if base["queries"].get(q, 0) > 0 else None)
                    for q in sorted(x100["queries"])},
    "knn_layout_build": build,
    "knn_build_growth_x10": (round(build[1]["knn_build_sec"] /
                                   build[0]["knn_build_sec"], 2)
                             if build[0]["knn_build_sec"] > 0 else None),
    "knn_build_growth_x100": (round(build[2]["knn_build_sec"] /
                                    build[0]["knn_build_sec"], 2)
                              if build[0]["knn_build_sec"] > 0 else None),
}
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(json.dumps({"x10": out["growth_x10"], "x100": out["growth_x100"],
                  "build_x10": out["knn_build_growth_x10"],
                  "build_x100": out["knn_build_growth_x100"]},
                 indent=1, sort_keys=True))
EOF
