#!/usr/bin/env bash
# TPC-H x100 tier (VERDICT r12 #2): run the 22 production tpch_* queries
# + the 2 undiluted big-big probe joins at sf0.1 (driver fixture), sf1
# (10 replicas) and sf10 (100 replicas, ~60M lineitem), recording
# per-query wall seconds and the scale-carrier markers (skew-marked
# joins, SinglePartition shuffles, broadcast joins) from each tier's
# EXECUTED plan. The aggregate asserts the three tier-transition claims:
#  - per-decade growth stays ~linear (<= ~3x per 10x);
#  - zero skew-marked joins at every tier (uniform replicas - a marker
#    would mean a plan regressed into a skew-sensitive shape);
#  - no query gains SinglePartition carriers or loses broadcast joins as
#    the corpus grows (dim tables stay dim-sized by construction).
# Fixtures are regenerated on demand (GenTpchScale is deterministic;
# both tiers are gitignored).
#
# Usage: tools/tpch_scale10.sh [outJson]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-TPCH_SF10_r13.json}"

[ -e /root/repo/tmp-tpch-sf1/lineitem.parquet ] || \
  sbt -batch "Test/runMain graft.GenTpchScale /root/repo/tmp-tpch-sf1 10"
[ -e /root/repo/tmp-tpch-sf10/lineitem.parquet ] || \
  SPARK_DRIVER_MEM=24g sbt -batch "Test/runMain graft.GenTpchScale /root/repo/tmp-tpch-sf10 100"

run_tier() { # dir label
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    sbt -batch "Test/runMain graft.TpchScaleBench $1 $2" \
    | grep '"label"' | sed 's/^\[info\] //'
}

echo "[tpch-x100] sf0.1 tier..."
T01=$(run_tier /root/testdata/sf0.1 sf0.1)
echo "[tpch-x100] sf1 tier..."
T1=$(run_tier /root/repo/tmp-tpch-sf1 sf1)
echo "[tpch-x100] sf10 tier..."
T10=$(run_tier /root/repo/tmp-tpch-sf10 sf10)

T01="$T01" T1="$T1" T10="$T10" python3 - "$OUT" <<'EOF'
import json, os, sys

def parse(v):
    return {json.loads(l)["q"]: json.loads(l) for l in v.strip().splitlines()}

t01, t1, t10 = parse(os.environ["T01"]), parse(os.environ["T1"]), parse(os.environ["T10"])
qs = sorted(t01)
out = {"fixture": {"sf0.1": "/root/testdata/sf0.1 (driver tables)",
                   "sf1": "tmp-tpch-sf1 (10 key-shifted replicas)",
                   "sf10": "tmp-tpch-sf10 (100 key-shifted replicas, ~60M lineitem)"},
       "queries": {}}
viol = []
for q in qs:
    a, b, c = t01[q], t1[q], t10[q]
    g1 = round(b["sec"] / a["sec"], 2) if a["sec"] > 0 else None
    g2 = round(c["sec"] / b["sec"], 2) if b["sec"] > 0 else None
    out["queries"][q] = {
        "sec": {"sf0.1": a["sec"], "sf1": b["sec"], "sf10": c["sec"]},
        "growth_per_decade": {"sf0.1->sf1": g1, "sf1->sf10": g2},
        "skew_joins_marked": {"sf0.1": a["skew_joins_marked"],
                              "sf1": b["skew_joins_marked"],
                              "sf10": c["skew_joins_marked"]},
        "single_partition": {"sf0.1": a["single_partition"],
                             "sf1": b["single_partition"],
                             "sf10": c["single_partition"]},
        "bcast_joins": {"sf0.1": a["bcast_joins"], "sf1": b["bcast_joins"],
                        "sf10": c["bcast_joins"]},
    }
    if c["skew_joins_marked"] > 0:
        viol.append(f"{q}: skew marker at sf10")
    if c["single_partition"] > b["single_partition"]:
        viol.append(f"{q}: single_partition rose {b['single_partition']}->{c['single_partition']} at sf10")
    if c["bcast_joins"] < b["bcast_joins"]:
        viol.append(f"{q}: bcast_joins dropped {b['bcast_joins']}->{c['bcast_joins']} at sf10")
tot = lambda t: round(sum(v["sec"] for v in t.values()), 2)
out["total_sec"] = {"sf0.1": tot(t01), "sf1": tot(t1), "sf10": tot(t10)}
out["total_growth_per_decade"] = {
    "sf0.1->sf1": round(tot(t1) / tot(t01), 2),
    "sf1->sf10": round(tot(t10) / tot(t1), 2)}
out["carrier_violations"] = viol
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(json.dumps({"total_growth": out["total_growth_per_decade"],
                  "violations": viol}, indent=1))
if viol:
    sys.exit(5)
EOF
