#!/usr/bin/env python3
"""Round-over-round bench comparison: shared-surface totals + material
per-query movers, split by tier. The close gate runs this so the diff the
judge computes by hand ships as part of the round's own artifact trail.

Since round 12 the comparison prefers each entry's `solo` measurement
(fresh-session re-measure of every >1.5s query) over the in-suite `best`:
suite context moved heavy-tail entries by up to ~4x between rounds on
byte-identical code (VERDICT r11 #1), so in-suite numbers only grade the
sub-threshold majority. A mover is only LABELED (REGRESSION/improved)
when both rounds' numbers come from the same kind of measurement or the
solo side is the newer one (solo vs old in-suite best still beats the
alternative — the old rounds have nothing better to offer). The one
mixed case this leaves — prev-solo vs new-SUITE (an entry that dropped
below the solo threshold this round) — is printed as `mixed-kind` and
excluded from the REGRESSION/improved labels, because the documented
~4x suite-context skew makes that comparison meaningless (ADVICE r12).

Round 14 (VERDICT r13 #1) adds the ATTRIBUTION GATE: with
`--attrib attrib.json` every labeled mover must carry either a causing
commit or a fresh-session triple re-measure (tools/bench_attrib.py
collects both). A re-measure is judged against the two candidate
numbers: if its min lands within 1.5x of the PREV graded number the
mover is relabeled noise (the old number reproduces in a clean session);
if it confirms the NEW number instead, a regression additionally needs a
commit to point at — otherwise it prints REGRESSION-unattributed and,
under `--strict`, the script exits 5. An unexplained >1.5x mover can no
longer pass the close gate on the strength of suite noise alone.

Usage: bench_diff.py <prev_bench_full.json> <new_bench_full.json> \\
           [--attrib attrib.json] [--strict]
"""
import json
import sys

argv = sys.argv[1:]
strict = "--strict" in argv
if strict:
    argv.remove("--strict")
attrib = {}
if "--attrib" in argv:
    i = argv.index("--attrib")
    attrib = json.load(open(argv[i + 1]))
    del argv[i:i + 2]

prev = json.load(open(argv[0]))["queries"]
new = json.load(open(argv[1]))["queries"]
shared = sorted(set(prev) & set(new))
added = sorted(set(new) - set(prev))
removed = sorted(set(prev) - set(new))


def graded(e):
    """solo where measured (and successful), in-suite best otherwise."""
    s = e.get("solo", -1.0)
    return s if s >= 0 else e["best"]


pt = sum(prev[q]["best"] for q in shared)
nt = sum(new[q]["best"] for q in shared)
pg = sum(graded(prev[q]) for q in shared)
ng = sum(graded(new[q]) for q in shared)
print(f"shared surface: {len(shared)} queries, in-suite "
      f"{pt:.1f}s -> {nt:.1f}s (ratio {nt / pt:.3f}); "
      f"solo-adjusted {pg:.1f}s -> {ng:.1f}s (ratio {ng / pg:.3f})")

# Uniform environment shift (r14): when the MEDIAN per-query ratio over
# the whole shared surface moves away from 1.0 (a box running slower or
# faster between rounds shifts every entry together — r14 measured
# median 1.32 with IQR 1.17–1.50 on a round whose canary re-measures
# matched r13), per-query labels must be read against that baseline or
# the diff drowns in environment noise. Movers are therefore labeled on
# the MEDIAN-NORMALIZED ratio once the median departs >10% from 1.0 —
# but ONLY with measured evidence that the shift IS environmental
# (ADVICE r14): a shared-operator change slowing most of the suite ~1.3x
# would shift the median identically, and unconditional normalization
# would erase exactly the regression this gate exists to catch. The
# evidence is attrib.json's "__environment__" entry: prev-round code (or
# the code-stable canary set) re-measured on the CURRENT box, reproducing
# the shift (tools/env_canary.sh collects it). Without it, movers are
# labeled on the RAW ratio and --strict refuses (exit 6) until the
# evidence is produced.
all_ratios = sorted(
    graded(new[q]) / graded(prev[q]) for q in shared
    if graded(prev[q]) > 0 and graded(new[q]) > 0)
med = all_ratios[len(all_ratios) // 2] if all_ratios else 1.0
norm = 1.0
shift_unevidenced = False
if abs(med - 1.0) > 0.10:
    q1 = all_ratios[len(all_ratios) // 4]
    q3 = all_ratios[3 * len(all_ratios) // 4]
    env_ev = attrib.get("__environment__")
    if env_ev:
        # Normalize by the MEASURED environmental ratio, not the suite
        # median (fixed r17): the evidence quantifies how much of the
        # shift is the box (prev-round code re-run today), and only that
        # component may be normalized away. Dividing by the full suite
        # median would also erase any CODE-caused uniform movement —
        # exactly the failure the comment above warns about, hit for
        # real in r17 when a global codegen-cache fix moved the suite
        # median to 0.55 while byte-identical old code measured 0.80 on
        # the same box: suite-median normalization would have relabeled
        # every flat query a phantom 1.8x regression.
        norm = float(env_ev.get("median_ratio", med))
        print(f"UNIFORM SHIFT: median per-query ratio {med:.3f} "
              f"(IQR {q1:.3f}-{q3:.3f}) -> movers labeled against the "
              f"measured environmental ratio {norm:.3f} [evidence: "
              f"{env_ev.get('source', '?')}]; residual {med / norm:.3f} "
              f"is code-caused movement the labels keep visible")
    else:
        shift_unevidenced = True
        print(f"UNIFORM SHIFT DETECTED: median per-query ratio {med:.3f} "
              f"(IQR {q1:.3f}-{q3:.3f}) but attrib has NO __environment__ "
              f"evidence -> NOT normalized; movers labeled on raw ratios. "
              f"Run tools/env_canary.sh to collect the evidence.")
if added:
    print(f"added ({len(added)}): " +
          ", ".join(f"{q}={graded(new[q]):.2f}s" for q in added))
if removed:
    print(f"removed ({len(removed)}): {', '.join(removed)}")

movers = []
for q in shared:
    p, n = graded(prev[q]), graded(new[q])
    if p <= 0 or n <= 0:
        continue
    r = n / p / norm
    # ignore sub-0.5s flappers: spread at that scale is suite noise
    if (r >= 1.5 or r <= 1 / 1.5) and max(p, n) >= 0.5:
        kind = f"{'solo' if 'solo' in prev[q] else 'suite'}->" \
               f"{'solo' if 'solo' in new[q] else 'suite'}"
        movers.append((r, q, p, n, new[q].get("tier", "?"), kind))
unattributed = []
for r, q, p, n, tier, kind in sorted(movers, reverse=True):
    # solo->suite is the one mixed comparison with nothing to recommend
    # it: the prev number is context-free, the new one carries suite
    # cache pressure (documented ~4x on single entries) — don't label it.
    if kind == "solo->suite":
        tag, note = "mixed-kind", ""
    else:
        tag = "REGRESSION" if r > 1 else "improved"
        note = ""
        a = attrib.get(q)
        if a and "environment" in a:
            # strongest evidence class: the PREVIOUS round's code was
            # rebuilt and re-measured on the current box and reproduces
            # the new reading — the mover is the environment, full stop
            tag = "env-shift"
            e = a["environment"]
            note = f" [prev-round code on today's box: " \
                   f"{e.get('prev_code_on_today_box_sec', e.get('r13_code_on_today_box_sec'))}s]"
        elif a and "commit" in a:
            note = f" [commit: {a['commit']}]"
        elif a and "remeasure" in a:
            ok = [v for v in a["remeasure"] if v and v > 0]
            m = min(ok) if ok else -1.0
            # a remeasure runs in the CURRENT environment, so "reproduces
            # prev" means matching prev TIMES the uniform shift
            if m > 0 and m <= p * norm * 1.5 and m >= p * norm / 1.5:
                # a clean session reproduces the PREV number: the round's
                # graded reading was measurement noise, not the code
                tag = "noise"
                note = f" [remeasure reproduces prev: min {m:.2f}s of {a['remeasure']}]"
            elif m > 0 and m <= n * 1.5 and m >= n / 1.5:
                note = f" [remeasure CONFIRMS new: min {m:.2f}s of {a['remeasure']}]"
                if r > 1:
                    # confirmed slower AND no causing commit -> a real
                    # unexplained regression; the gate must not pass it
                    tag = "REGRESSION-unattributed"
                    unattributed.append(q)
                else:
                    tag = "improved-confirmed"
            else:
                note = f" [remeasure inconclusive: {a['remeasure']}]"
                tag += "-unattributed"
                if r > 1:
                    unattributed.append(q)
        elif attrib or strict:
            tag += "-unattributed"
            # only unexplained REGRESSIONS are fatal: an unattributed
            # improvement is suspicious but the correctness gate owns
            # broken-query detection
            if r > 1:
                unattributed.append(q)
    print(f"  {tag:10s} {q} [{tier}] ({kind}): {p:.2f}s -> {n:.2f}s ({r:.2f}x){note}")
if not movers:
    print("  no movers beyond 1.5x on entries >= 0.5s")
if unattributed:
    print(f"ATTRIBUTION GATE: {len(unattributed)} mover(s) lack a causing "
          f"commit or a bracketing re-measure: {', '.join(unattributed)}")
    if strict:
        sys.exit(5)
if shift_unevidenced and strict:
    print("ATTRIBUTION GATE: uniform shift without __environment__ "
          "evidence — collect it (tools/env_canary.sh) before closing")
    sys.exit(6)
