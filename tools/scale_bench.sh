#!/usr/bin/env bash
# Quadratic-tail scale evidence, THREE tiers (VERDICT r10 #5): bench the
# pair-generating families at 10x and 100x document/vector corpora vs a
# same-shape baseline and record per-query growth at both decades. The
# x100 tier runs the dedup/fingerprint/LSH production paths only (the
# diagnostic O(n^2) referees are excluded by design). Corpora come from
# GenScaleData (deterministic, gitignored); committed artifact: SCALE_rN.
#
# Usage: tools/scale_bench.sh [outJson]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-SCALE_r11.json}"
QUERIES="dedup_minhash_pairs,dedup_simhash_pairs,dedup_ngram_lang_block,dedup_editdist_pairs,embed_neardup_lsh,embed_neardup_exact,embed_neardup_lsh_scaled,vocab_top_tokens,percentile_length_filter,asof_join_clicks,hopping_window_counts,sessionize_gap,dedup_debounce,continuous_5m_pipeline,dedup_sorted_neighborhood,fingerprint_modp_candidates,winnowing_fingerprints,dedup_star_clusters,corpus_integrity_checksum,dsir_importance_weights,source_overlap_kmv"
X100_QUERIES="dedup_minhash_pairs,dedup_ngram_lang_block,dedup_sorted_neighborhood,fingerprint_modp_candidates,winnowing_fingerprints,embed_neardup_lsh_scaled,dedup_star_clusters,corpus_integrity_checksum,dsir_importance_weights,source_overlap_kmv"

sbt -batch "Test/runMain graft.GenScaleData /root/repo/tmp-sf01gen 5000 2000 10000 150"
sbt -batch "Test/runMain graft.GenScaleData /root/repo/tmp-sf1 50000 20000 100000 1500"
sbt -batch "Test/runMain graft.GenScaleData /root/repo/tmp-sf10 500000 200000 1000000 15000"

run_bench() {
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY="$2" SPARK_GRAFT_BENCH_PASSES=2 \
  SPARK_GRAFT_SOLO_THRESHOLD=9999 \
  SPARK_GRAFT_BENCH_OUT=/tmp/scale_bench_full.json \
    sbt -batch "runMain graft.Bench" | grep '"metric":"total"' \
    | sed 's/^\[info\] //' > /tmp/scale_bench_lines.txt || true
  # first line taken outside the pipeline (ADVICE r13): head -1 inside
  # it SIGPIPEs grep on a second matching line and pipefail aborts the
  # harness after its most expensive tier already ran
  head -1 /tmp/scale_bench_lines.txt
}

BASE_JSON=$(run_bench /root/repo/tmp-sf01gen "$QUERIES")
BIG_JSON=$(run_bench /root/repo/tmp-sf1 "$QUERIES")
X100_JSON=$(run_bench /root/repo/tmp-sf10 "$X100_QUERIES")

BASE="$BASE_JSON" BIG="$BIG_JSON" X100="$X100_JSON" python3 - "$OUT" <<'EOF'
import json, os, sys
base = json.loads(os.environ["BASE"])
big = json.loads(os.environ["BIG"])
x100 = json.loads(os.environ["X100"])
out = {
    "baseline": {"dir": base["sf"], "docs": 5000, "vecs": 2000,
                 "queries": base["queries"], "spread": base.get("spread", {})},
    "x10": {"dir": big["sf"], "docs": 50000, "vecs": 20000,
            "queries": big["queries"], "spread": big.get("spread", {})},
    "x100": {"dir": x100["sf"], "docs": 500000, "vecs": 200000,
             "queries": x100["queries"], "spread": x100.get("spread", {})},
    "growth_x10": {q: (round(big["queries"][q] / base["queries"][q], 2)
                       if base["queries"][q] > 0 else None)
                   for q in sorted(base["queries"])},
    "growth_x100": {q: (round(x100["queries"][q] / base["queries"][q], 2)
                        if base["queries"].get(q, 0) > 0 else None)
                    for q in sorted(x100["queries"])},
}
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(json.dumps({"x10": out["growth_x10"], "x100": out["growth_x100"]},
                 indent=1, sort_keys=True))
EOF
