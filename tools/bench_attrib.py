#!/usr/bin/env python3
"""Attribution collector for round-over-round bench movers (VERDICT r13 #1).

For every shared-surface query whose GRADED number (solo where measured,
in-suite best otherwise — bench_diff.py's metric) moved more than 1.5x
between two bench_full artifacts, collect ONE of:

  (a) the commit that changed its code path — auto-detected with
      `git log <range> -G '"<query>"'` (a query's literal name string
      appears at its definition and its oracle; -G matches any diff
      touching such a line, where -S would miss a body rewrite that
      keeps the occurrence count constant); helper-level changes that
      don't touch the query body are invisible to -G and fall through
      to (b) — or to a hand-seeded "commit" entry in attrib.json, which
      is never overwritten;
  (b) a fresh-session TRIPLE re-measure: three separate JVMs, each the
      r13 solo protocol (min-of-2 passes in a fresh session) — recorded
      verbatim so bench_diff.py can decide whether the old or the new
      number reproduces;
  (c) nothing — in which case bench_diff.py --strict exits non-zero:
      an unexplained >1.5x mover can no longer ship (that is how a real
      regression hides inside suite noise).

Manual entries survive: an existing attrib.json is loaded first and
queries already carrying a "commit" or "remeasure" entry are not
re-collected (so a hand-written attribution for a helper-level commit —
e.g. a shared-operator change -S can't see — is one JSON edit).

Usage:
  bench_attrib.py <prev_bench_full.json> <new_bench_full.json> \
      <attrib.json> [--git-range <range>] [--sf-dir <dir>] [--dry-run]
"""
import json
import os
import subprocess
import sys

args = sys.argv[1:]


def opt(name, default=None):
    if name in args:
        i = args.index(name)
        v = args[i + 1]
        del args[i:i + 2]
        return v
    return default


dry = "--dry-run" in args
if dry:
    args.remove("--dry-run")
git_range = opt("--git-range")
sf_dir = opt("--sf-dir", "/root/testdata/sf0.1")
prev_path, new_path, attrib_path = args

prev = json.load(open(prev_path))["queries"]
new = json.load(open(new_path))["queries"]


def graded(e):
    s = e.get("solo", -1.0)
    return s if s >= 0 else e["best"]


def kind(p, n):
    return ("solo" if "solo" in p else "suite") + "->" + \
           ("solo" if "solo" in n else "suite")


# Same uniform-shift normalization as bench_diff.py — and the same
# evidence requirement (ADVICE r14): the median is only a valid baseline
# when attrib.json already carries "__environment__" evidence (prev-round
# code or the code-stable canary set re-measured on the current box,
# tools/env_canary.sh). Without it a shared-operator regression could
# shift the median and silently exempt itself from collection here; so
# un-evidenced shifts collect movers on the RAW ratio (over-collecting is
# the safe direction for the collector — bench_diff owns the verdict).
shared = sorted(set(prev) & set(new))
all_ratios = sorted(graded(new[q]) / graded(prev[q]) for q in shared
                    if graded(prev[q]) > 0 and graded(new[q]) > 0)
med = all_ratios[len(all_ratios) // 2] if all_ratios else 1.0
attrib_pre = json.load(open(attrib_path)) if os.path.exists(attrib_path) else {}
norm = 1.0
if abs(med - 1.0) > 0.10:
    if "__environment__" in attrib_pre:
        # Normalize by the MEASURED environmental ratio, not the suite
        # median (fixed r17, same fix as bench_diff.py): the suite median
        # also contains code-caused movement, which must stay visible.
        norm = float(attrib_pre["__environment__"].get("median_ratio", med))
        print(f"[attrib] uniform shift: median ratio {med:.3f} -> "
              f"normalizing by measured environmental ratio {norm:.3f}")
    else:
        print(f"[attrib] uniform shift: median ratio {med:.3f} but NO "
              f"__environment__ evidence -> collecting on RAW ratios "
              f"(run tools/env_canary.sh first to avoid over-collection)")

movers = []
for q in shared:
    p, n = graded(prev[q]), graded(new[q])
    if p <= 0 or n <= 0 or max(p, n) < 0.5:
        continue
    r = n / p / norm
    if (r >= 1.5 or r <= 1 / 1.5) and kind(prev[q], new[q]) != "solo->suite":
        movers.append((q, p, n, r))

attrib = {}
if os.path.exists(attrib_path):
    attrib = json.load(open(attrib_path))

if git_range is None:
    # default: commits since the last round-close marker commit
    log = subprocess.run(
        ["git", "log", "--oneline", "-20", "--grep", "round .*: end-of-round"],
        capture_output=True, text=True).stdout.strip().splitlines()
    git_range = (log[0].split()[0] + "..HEAD") if log else "HEAD~50..HEAD"
print(f"[attrib] {len(movers)} movers; git range {git_range}")

need_remeasure = []
for q, p, n, r in movers:
    if q in attrib and ("commit" in attrib[q] or "remeasure" in attrib[q]
                        or "environment" in attrib[q]):
        print(f"[attrib] {q}: already attributed ({list(attrib[q])[0]})")
        continue
    # Restrict to the query-defining sources: -G over the whole tree
    # also matches artifact JSON / session logs / the scratch profiler,
    # which all quote query names without being their code path.
    hits = subprocess.run(
        ["git", "log", "--oneline", git_range, "-G", f'"{q}"', "--",
         "src/main/scala/graft", ":(exclude)src/main/scala/graft/Profile.scala"],
        capture_output=True, text=True).stdout.strip().splitlines()
    if hits:
        attrib[q] = {"commit": hits[0]}
        print(f"[attrib] {q}: commit {hits[0]}")
    else:
        need_remeasure.append((q, p, n, r))

if need_remeasure:
    print(f"[attrib] remeasuring {len(need_remeasure)} queries "
          f"(3 fresh JVMs each, min-of-2 per JVM) on {sf_dir}...")
# Only regression-direction movers gate the close (bench_diff fails on
# an unattributed REGRESSION; an unattributed improvement is labeled but
# not fatal — correctness has its own gate), so only they are worth
# three JVMs each.
need_remeasure = [(q, p, n, r) for q, p, n, r in need_remeasure if r > 1]
for q, p, n, r in need_remeasure:
    if dry:
        print(f"[attrib] {q}: would remeasure ({p:.2f}->{n:.2f}, {r:.2f}x)")
        continue
    triple = []
    for i in range(3):
        env = dict(os.environ,
                   SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32",
                   SPARK_GRAFT_BENCH_ONLY=q, SPARK_GRAFT_BENCH_PASSES="2",
                   SPARK_GRAFT_SOLO_THRESHOLD="9999",
                   SPARK_GRAFT_BENCH_OUT="/tmp/bench_attrib_one.json")
        out = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                             capture_output=True, text=True, env=env).stdout
        val = None
        for line in out.splitlines():
            line = line.removeprefix("[info] ")
            if line.startswith("{") and '"metric":"total"' in line:
                val = json.loads(line)["queries"].get(q)
                break
        triple.append(val if val is not None else -1.0)
        print(f"[attrib] {q}: run {i + 1}/3 -> {triple[-1]}")
    attrib[q] = {"remeasure": triple}

if not dry:
    with open(attrib_path, "w") as f:
        json.dump(attrib, f, indent=1, sort_keys=True)
    print(f"[attrib] wrote {attrib_path} ({len(attrib)} entries)")
