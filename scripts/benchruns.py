#!/usr/bin/env python3
"""Adjudicate a bench artifact's measurement window from the per-run
arrays graft.Bench writes (the "runs" field of BENCH_FULL.json).

For each query, compare the minimum run against the median run:
  - min ≈ median           → stable (every run agrees; a slow value here
                             is a REAL cost, not noise)
  - min ≪ median           → noisy window (at least one run was inflated
                             by host load; trust the min)
Optionally compare against a second artifact (e.g. last round's) and
flag only queries whose MIN regressed — min-vs-min is the noise-robust
comparison.

Usage: python3 scripts/benchruns.py [BENCH_FULL.json] [BASELINE.json]
       (first arg defaults to BENCH_FULL.json in the cwd)
"""
import json
import sys

NOISE_RATIO = 1.5   # median/min above this = at least one inflated run
REGRESS_RATIO = 1.3 # min-vs-min above this (and >0.3s abs) = regression

if len(sys.argv) < 2:
    sys.argv.append("BENCH_FULL.json")
cur = json.load(open(sys.argv[1]))
runs = cur.get("runs")
if runs is None:
    print(f"{sys.argv[1]} has no per-run arrays (pre-round-8 format); "
          "only min times are available — window noise is undecidable.")
    sys.exit(2)


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


noisy, stable_slow = [], []
for q, times in sorted(runs.items()):
    ok = [t for t in times if t >= 0]
    if not ok:
        print(f"FAILED   {q}: all runs errored")
        continue
    mn, md = min(ok), median(ok)
    if md > mn * NOISE_RATIO and md - mn > 0.2:
        noisy.append((q, mn, md))
    elif mn > 1.0:
        stable_slow.append((q, mn, md))

print(f"queries: {len(runs)}  noisy-window: {len(noisy)}  "
      f"stable-and->1s: {len(stable_slow)}")
for q, mn, md in sorted(noisy, key=lambda x: x[2] - x[1], reverse=True):
    print(f"NOISY    {q}: min {mn:.2f}s vs median {md:.2f}s "
          "(one bad window — trust the min)")
for q, mn, md in sorted(stable_slow, key=lambda x: x[1], reverse=True):
    print(f"STABLE   {q}: min {mn:.2f}s (every run agrees — real cost)")

if len(sys.argv) > 2:
    base = json.load(open(sys.argv[2]))
    bq = base.get("queries", {})
    cq = cur.get("queries", {})
    regressed = [
        (q, bq[q], cq[q]) for q in sorted(set(bq) & set(cq))
        if bq[q] > 0 and cq[q] > bq[q] * REGRESS_RATIO and cq[q] - bq[q] > 0.3
    ]
    print(f"\nvs {sys.argv[2]}: {len(regressed)} min-vs-min regressions")
    for q, b, c in sorted(regressed, key=lambda x: x[2] - x[1], reverse=True):
        print(f"REGRESS  {q}: {b:.2f}s -> {c:.2f}s")

# PINS.json (scripts/mkpins.py output, committed at the repo root):
# the machine-readable adjudication the prose bands in BASELINE.md
# used to require archaeology for. Every query's min is checked
# against its [lo, hi] band; out-of-band queries print with their
# attribution tag (if any) and the script exits nonzero so a driver
# or CI can gate on it.
import os
pins_path = os.path.join(os.path.dirname(sys.argv[1]) or ".", "PINS.json")
if not os.path.exists(pins_path):
    pins_path = "PINS.json"
if os.path.exists(pins_path):
    pins = json.load(open(pins_path))
    cq = cur.get("queries", {})
    out_of_band, unpinned, in_band = [], [], 0
    for q, t in sorted(cq.items()):
        if t < 0:
            continue
        p = pins.get(q)
        if p is None:
            unpinned.append(q)
            continue
        lo, hi = p["band"]
        if lo <= t <= hi:
            in_band += 1
        else:
            out_of_band.append((q, t, lo, hi, p.get("tag", "")))
    print(f"\nvs {pins_path}: {in_band} in-band, "
          f"{len(out_of_band)} out-of-band, {len(unpinned)} unpinned")
    for q, t, lo, hi, tag in out_of_band:
        extra = f"  [{tag}]" if tag else ""
        print(f"OUTOFBAND {q}: {t:.2f}s vs [{lo}, {hi}]{extra}")
    for q in unpinned:
        print(f"UNPINNED  {q}: no band (new query? run scripts/mkpins.py)")
    if out_of_band:
        sys.exit(1)
