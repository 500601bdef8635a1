#!/usr/bin/env bash
# Third scale point for the r13 funnel rewrites (VERDICT r13 #5): the 14
# queries the growth-mode plan audit forced onto two-level RangeRank
# shapes are proven flat across sf0.01 -> sf0.1 (one decade). This runs
# the SAME growth classifier across the SECOND decade — driver sf0.1 ->
# a merged corpus where every table those queries read is ~10x its
# sf0.1 counterpart:
#   - TPC-H tables (orders/customer/part/lineitem/...):
#     tmp-tpch-sf1 (GenTpchScale, 10 key-shifted replicas);
#   - documents/embeddings: tmp-sf1 (GenScaleData 50k docs / 20k vecs);
#   - events: tmp-sf10 (GenScaleData 1M events / 15k users — the 10x
#     step from the driver's 100k-event sf0.1 fixture).
# A funnel that is domain-bounded stays flat at the third point; a
# funnel that merely passed two points while growing would exit 4 here
# (the exact loophole the r12 -> r13 classifier upgrade demonstrated).
#
# Output: PLAN_AUDIT_3PT_r14.json (PlanAudit growth-mode artifact over
# the 14-query subset, sf_small=sf0.1, sf_big=merged-10x).
# Usage: tools/third_point.sh [outJson]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-PLAN_AUDIT_3PT_r14.json}"

FUNNELS="abc_inventory_classes,pareto_customer_concentration,rfm_segmentation,pps_systematic_sample,budget_curation_knapsack,gini_concentration_components,regression_discontinuity_components,pass_at_k_estimator,median_two_pass_refine,sequence_gap_ranges,reciprocal_rank_fusion,ks_drift_cents,ks_test_components,matched_pairs_stratified"

[ -e tmp-tpch-sf1/lineitem.parquet ] || \
  sbt -batch "Test/runMain graft.GenTpchScale /root/repo/tmp-tpch-sf1 10"
[ -d tmp-sf1/documents.parquet ] || \
  sbt -batch "Test/runMain graft.GenScaleData /root/repo/tmp-sf1 50000 20000 100000 1500"
[ -d tmp-sf10/events.parquet ] || \
  sbt -batch "Test/runMain graft.GenScaleData /root/repo/tmp-sf10 500000 200000 1000000 15000"

MERGED=/root/repo/tmp-3pt
rm -rf "$MERGED" && mkdir -p "$MERGED"
for t in region nation customer supplier part orders lineitem; do
  ln -s "/root/repo/tmp-tpch-sf1/$t.parquet" "$MERGED/$t.parquet"
done
ln -s /root/repo/tmp-sf1/documents.parquet "$MERGED/documents.parquet"
ln -s /root/repo/tmp-sf1/embeddings.parquet "$MERGED/embeddings.parquet"
ln -s /root/repo/tmp-sf10/events.parquet "$MERGED/events.parquet"

SPARK_GRAFT_AUDIT_OUT="$OUT" SPARK_GRAFT_CPUS=16 \
SPARK_GRAFT_AUDIT_ONLY="$FUNNELS" \
  sbt -batch "runMain graft.PlanAudit /root/testdata/sf0.1 $MERGED"

python3 - "$OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
s = d.pop("__summary")
n = sum(len(v["single_partition_detail"]) for v in d.values())
cls = {}
for v in d.values():
    for o in v["single_partition_detail"]:
        cls[o["class"]] = cls.get(o["class"], 0) + 1
print(json.dumps({"queries": len(d), "occurrences": n, "classes": cls,
                  "unreviewed": s["single_partition_unreviewed"]}, indent=1))
EOF
echo "[third-point] OK -> $OUT"
