#!/usr/bin/env bash
# Streaming-family scale evidence (VERDICT r12 #3): drive the four
# stateful streaming shapes over the driver events fixture at sf0.01 and
# sf0.1 (a 10x input step: 10k -> 100k events, 150 -> 1500 user keys,
# event-type domain fixed at 5) and record per-op growth of wall time,
# throughput, per-batch cost and FINAL STATE SIZE. The claims the
# artifact demonstrates:
#  - sketch state is O(|event_type|): 10x-INVARIANT (5 rows at both SFs);
#  - high-water state tracks the KEY domain (users), never event count;
#  - dedup-within-watermark state tracks the in-horizon tail, evicted as
#    the watermark passes;
#  - marginal batch cost stays ~linear in batch size (throughput should
#    IMPROVE at 10x while fixed micro-batch overhead amortizes).
# The state bounds are additionally spec-pinned in StreamScaleSpec.
#
# Usage: tools/scale_stream.sh [outJson]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-SCALE_STREAM_r13.json}"

LINES=$(SPARK_GRAFT_CPUS=32 sbt -batch \
  "Test/runMain graft.StreamScaleBench /root/testdata/sf0.01 /root/testdata/sf0.1" \
  | grep '"op"' | sed 's/^\[info\] //')

LINES="$LINES" python3 - "$OUT" <<'EOF'
import json, os, sys
rows = [json.loads(l) for l in os.environ["LINES"].strip().splitlines()]
by = {}
for r in rows:
    sf = "sf0.01" if "sf0.01" in r["dir"] else "sf0.1"
    by.setdefault(r["op"], {})[sf] = r
out = {"input": {"sf0.01": {"events": 10000, "users": 150, "types": 5},
                 "sf0.1": {"events": 100000, "users": 1500, "types": 5}},
       "ops": {}}
for op, d in sorted(by.items()):
    a, b = d["sf0.01"], d["sf0.1"]
    out["ops"][op] = {
        "sf0.01": a, "sf0.1": b,
        "wall_growth_x10": round(b["wall_sec"] / a["wall_sec"], 2),
        "throughput_ratio_x10": round(b["rows_per_sec"] / a["rows_per_sec"], 2),
        "avg_batch_ms_growth_x10": round(b["avg_batch_ms"] / a["avg_batch_ms"], 2),
        "state_growth_x10": (round(b["state_rows_final"] / a["state_rows_final"], 2)
                             if a["state_rows_final"] > 0 else None),
        "state_vs_keys_sf0.1": (round(b["state_rows_final"] / b["distinct_keys"], 3)
                                if b["distinct_keys"] > 0 else None),
    }
with open(sys.argv[1], "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(json.dumps({op: {k: v for k, v in o.items() if not k.startswith("sf")}
                  for op, o in out["ops"].items()}, indent=1, sort_keys=True))
EOF
