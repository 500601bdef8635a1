#!/usr/bin/env python3
"""Round-over-round bench comparison: shared-surface totals + material
per-query movers, split by tier. The close gate runs this so the diff the
judge computes by hand ships as part of the round's own artifact trail.

Usage: bench_diff.py <prev_bench_full.json> <new_bench_full.json>
"""
import json
import sys

prev = json.load(open(sys.argv[1]))["queries"]
new = json.load(open(sys.argv[2]))["queries"]
shared = sorted(set(prev) & set(new))
added = sorted(set(new) - set(prev))
removed = sorted(set(prev) - set(new))

pt = sum(prev[q]["best"] for q in shared)
nt = sum(new[q]["best"] for q in shared)
print(f"shared surface: {len(shared)} queries, "
      f"{pt:.1f}s -> {nt:.1f}s (ratio {nt / pt:.3f})")
if added:
    print(f"added ({len(added)}): " +
          ", ".join(f"{q}={new[q]['best']:.2f}s" for q in added))
if removed:
    print(f"removed ({len(removed)}): {', '.join(removed)}")

movers = []
for q in shared:
    p, n = prev[q]["best"], new[q]["best"]
    if p <= 0 or n <= 0:
        continue
    r = n / p
    # ignore sub-0.5s flappers: spread at that scale is suite noise
    if (r >= 1.5 or r <= 1 / 1.5) and max(p, n) >= 0.5:
        movers.append((r, q, p, n, new[q].get("tier", "?")))
for r, q, p, n, tier in sorted(movers, reverse=True):
    tag = "REGRESSION" if r > 1 else "improved"
    print(f"  {tag:10s} {q} [{tier}]: {p:.2f}s -> {n:.2f}s ({r:.2f}x)")
if not movers:
    print("  no movers beyond 1.5x on entries >= 0.5s")
