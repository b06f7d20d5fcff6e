#!/usr/bin/env python3
"""Per-round sf1 scale-regression guard.

Reads a fresh full-harness sf1 run (BENCH_FULL.json written with
SPARK_GRAFT_SF_DIR=target/sf1) plus the matching sf0.1 run, computes the
per-query 10x-data slope (sf1_s / sf0.1_s), diffs it against the recorded
baseline slopes (the previous round's BENCH_sf1_rN.json, falling back to
BENCH_sf1.json), prints a markdown table of the worst slopes, and exits
non-zero when any query's slope DOUBLED vs its recorded baseline while
costing >= 1s at sf1 (sub-second queries flap with host weather, not with
plan shape).

Usage: slope_guard.py <sf1_bench.json> <sf01_bench.json>
                      [<baseline_sf1.json> <baseline_sf01.json>]
(the baseline pair must come from the SAME round as each other)
"""
import json, sys

def load(path):
    with open(path) as f:
        return json.load(f)

def queries(doc):
    """Accept both a full bench doc ({"queries": {...}}) and a flat
    {"query": secs} map (BENCH_HISTORY.json); drop error sentinels."""
    m = doc.get("queries", doc) if isinstance(doc, dict) else {}
    return {k: v for k, v in m.items()
            if isinstance(v, (int, float)) and 0 < v < 9000}

if len(sys.argv) == 4:
    # With only 3 inputs the baseline "slope" would divide the OLD sf1
    # times by THIS round's sf0.1 times — reducing the gate to a raw
    # wall-time comparison that host weather flips both ways, exactly
    # what slope normalization exists to avoid.
    sys.exit("usage: slope_guard.py <sf1.json> <sf0.1.json> "
             "[<baseline_sf1.json> <baseline_sf0.1.json>] — a baseline "
             "needs ITS OWN sf0.1 run (4th arg) to form comparable slopes")
sf1 = queries(load(sys.argv[1]))
sf01 = queries(load(sys.argv[2]))
base = queries(load(sys.argv[3])) if len(sys.argv) > 3 else {}
base_sf01 = queries(load(sys.argv[4])) if len(sys.argv) > 4 else {}

slopes = {q: sf1[q] / sf01[q] for q in sf1 if q in sf01 and sf01[q] > 0.01}
base_slopes = {q: base[q] / base_sf01[q]
               for q in base if q in base_sf01 and base_sf01[q] > 0.01}

# Additive-vs-multiplicative adjudication. A busy host adds a BOUNDED
# absolute per-query overhead (scheduler stalls, JIT contention): r15's 8
# flags were all +0.8-1.2s shifts on queries whose baseline sf1 time was
# 0.3-1.4s — each hand-adjudicated as noise by warm re-measure. A genuine
# plan regression is MULTIPLICATIVE: the work itself grows, so the sf1
# time delta vs baseline is large both absolutely AND relative to the
# baseline. A slope-doubling therefore only counts as REGRESSED when the
# sf1 delta clears the host-stall band (SLOPE_GUARD_ALLOWANCE_S, default
# 1.5s) and at least doubles the baseline sf1 time; anything below that
# is printed as noise(+Xs) so the adjudication is recorded, not hidden.
# The residual risk (a real +1.4s regression on a 0.5s query) is the
# regime SCALE.md already excludes: sub-second queries flap with host
# weather, and scale-killers show deltas 10-100x this band.
import os
ALLOWANCE = float(os.environ.get("SLOPE_GUARD_ALLOWANCE_S", "1.5"))

rows, regressions, noise = [], [], []
for q, s in sorted(slopes.items(), key=lambda kv: -kv[1]):
    b = base_slopes.get(q)
    flag = ""
    if b is not None and s >= 2.0 * b and sf1[q] >= 1.0:
        delta = sf1[q] - base[q]
        if delta >= max(ALLOWANCE, base[q]):
            flag = "REGRESSED"
            regressions.append(q)
        else:
            flag = f"noise(+{delta:.1f}s)"
            noise.append(q)
    rows.append((q, sf01[q], sf1[q], s, b, flag))

print("| Query | sf0.1 (s) | sf1 (s) | slope | baseline slope | flag |")
print("|---|---|---|---|---|---|")
for q, t01, t1, s, b, flag in rows[:25]:
    bs = f"{b:.1f}x" if b is not None else "new"
    print(f"| {q} | {t01:.2f} | {t1:.2f} | {s:.1f}x | {bs} | {flag} |")

n = len(slopes)
med = sorted(slopes.values())[n // 2] if n else 0
tot1, tot01 = sum(sf1[q] for q in slopes), sum(sf01[q] for q in slopes)
print(f"\n{n} queries with both measurements; total {tot01:.1f}s -> "
      f"{tot1:.1f}s ({tot1 / tot01 if tot01 else 0:.2f}x on 10x data); "
      f"median slope {med:.2f}x")
missing = sorted(set(sf01) - set(sf1))
if missing:
    print(f"not measured at sf1 ({len(missing)}): {', '.join(missing[:10])}"
          + (" ..." if len(missing) > 10 else ""))
if noise:
    print(f"\nslope flags within the host-stall band "
          f"(delta < max({ALLOWANCE}s, baseline)) adjudicated as noise: "
          f"{', '.join(noise)}")
if regressions:
    print(f"\nSLOPE REGRESSIONS (>=2x baseline slope, >=1s at sf1, delta "
          f"beyond the stall band): {', '.join(regressions)}")
    print("re-measure warm before acting: SPARK_GRAFT_SF_DIR=<sf1 dir> "
          f"sbt 'runMain graft.Debug --repeat=3 {' '.join(regressions)}'")
    sys.exit(1)
print("\nno slope regressions")
