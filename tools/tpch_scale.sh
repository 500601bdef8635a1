#!/usr/bin/env bash
# TPC-H sf1 tier harness (ADVICE r10): the ~155MB fixture is REGENERATED on
# demand — tmp-tpch-sf1 is gitignored (GenTpchScale is deterministic), so
# the repo never carries recreatable parquet. Benches the 22 tpch_* queries
# at the sf1 replica fixture vs the driver sf0.1 tables and records
# per-query growth, mirroring TPCH_SF1_r10.json's shape.
#
# Usage: tools/tpch_scale.sh [outJson]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-TPCH_SF1_r11.json}"
DIR=/root/repo/tmp-tpch-sf1
if [ ! -d "$DIR/lineitem.parquet" ] && [ ! -f "$DIR/lineitem.parquet" ]; then
  sbt -batch "Test/runMain graft.GenTpchScale $DIR 10"
fi
# query names moved from the SparkEntry monolith into the Queries* family
# files in round 12 — grep the whole family
QUERIES=$(grep -oh '"tpch_[a-z0-9_]*"' src/main/scala/graft/Queries*.scala \
  | tr -d '"' | sort -u | paste -sd, -)

run_bench() {
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" SPARK_GRAFT_BENCH_PASSES=2 \
  SPARK_GRAFT_SOLO_THRESHOLD=9999 \
  SPARK_GRAFT_BENCH_OUT=/tmp/tpch_bench_full.json \
    sbt -batch "runMain graft.Bench" | grep '"metric":"total"' \
    | sed 's/^\[info\] //' > /tmp/tpch_scale_lines.txt || true
  # first line taken outside the pipeline (ADVICE r13): head -1 inside
  # it SIGPIPEs grep on a second matching line and pipefail aborts the
  # harness after its most expensive tier already ran
  head -1 /tmp/tpch_scale_lines.txt
}

BASE_JSON=$(run_bench /root/testdata/sf0.1)
BIG_JSON=$(run_bench "$DIR")

BASE="$BASE_JSON" BIG="$BIG_JSON" python3 - "$OUT" <<'EOF'
import json, os, sys
base = json.loads(os.environ["BASE"])
big = json.loads(os.environ["BIG"])
out = {
    "fixture": {"dir": "tmp-tpch-sf1", "generator": "GenTpchScale (Test scope)",
                "method": "10 replicas of the driver sf0.1 tables with "
                          "consistent key shifting (regenerated on demand; "
                          "fixture is gitignored)"},
    "sf01": {"total": base["value"], "queries": base["queries"]},
    "sf1": {"total": big["value"], "queries": big["queries"]},
    "growth": {q: (round(big["queries"][q] / base["queries"][q], 2)
                   if base["queries"].get(q, 0) > 0 else None)
               for q in sorted(base["queries"])},
    "total_growth": round(big["value"] / base["value"], 2),
}
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(json.dumps({"total_growth": out["total_growth"]}))
EOF
