#!/usr/bin/env bash
# Quadratic-tail scale evidence (VERDICT r7 #1): bench the pair-generating
# query families at a 10x document/vector corpus vs a same-shape baseline,
# and record per-query growth ratios. Corpora come from GenScaleData
# (deterministic, gitignored); the committed artifact is SCALE_r08.json.
#
# Usage: tools/scale_bench.sh [outJson]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-SCALE_r10.json}"
QUERIES="dedup_minhash_pairs,dedup_simhash_pairs,dedup_ngram_lang_block,dedup_editdist_pairs,embed_neardup_lsh,embed_neardup_exact,vocab_top_tokens,percentile_length_filter,asof_join_clicks,hopping_window_counts,sessionize_gap,dedup_debounce,continuous_5m_pipeline"

sbt -batch "Test/runMain graft.GenScaleData /root/repo/tmp-sf01gen 5000 2000 10000 150"
sbt -batch "Test/runMain graft.GenScaleData /root/repo/tmp-sf1 50000 20000 100000 1500"

run_bench() {
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" SPARK_GRAFT_BENCH_PASSES=2 \
  SPARK_GRAFT_BENCH_OUT=/tmp/scale_bench_full.json \
    sbt -batch "runMain graft.Bench" | grep '"metric":"total"' | sed 's/^\[info\] //' | head -1
}

BASE_JSON=$(run_bench /root/repo/tmp-sf01gen)
BIG_JSON=$(run_bench /root/repo/tmp-sf1)

BASE="$BASE_JSON" BIG="$BIG_JSON" python3 - "$OUT" <<'EOF'
import json, os, sys
base = json.loads(os.environ["BASE"])
big = json.loads(os.environ["BIG"])
out = {
    "baseline": {"dir": base["sf"], "docs": 5000, "vecs": 2000, "events": 10000,
                 "queries": base["queries"], "spread": base.get("spread", {})},
    "x10": {"dir": big["sf"], "docs": 50000, "vecs": 20000, "events": 100000,
            "queries": big["queries"], "spread": big.get("spread", {})},
    "growth": {q: (round(big["queries"][q] / base["queries"][q], 2)
                   if base["queries"][q] > 0 else None)
               for q in sorted(base["queries"])},
}
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(json.dumps(out["growth"], indent=1, sort_keys=True))
EOF
