#!/usr/bin/env python3
"""Generate PINS.json — the machine-readable per-query bench bands —
from a BENCH_FULL.json artifact (per-run arrays required).

Band rule: [0, hi] with hi = min_time * RATIO + SLACK, rounded up to
2 decimals. The min over interleaved sweeps is the steady-state
number (see Bench.scala's sweep design), so the band is "steady state
plus headroom": RATIO covers plan-compile variance, SLACK covers the
fixed per-query job overhead that dominates sub-second queries.
Adjudicated queries (known wide plan-compile or shared-artifact
variance, recorded in BASELINE.md) carry explicit overrides + tags.

Usage: python3 scripts/mkpins.py BENCH_FULL.json > PINS.json
"""
import json
import sys

RATIO = 1.6
SLACK = 0.30

# BASELINE.md-adjudicated bands that are wider than the formula --
# each tag says where the adjudication lives.
OVERRIDES = {
    "v41_pq_distortion": (4.4, "plan-compile dominated; BASELINE.md round-9 adjudication pins 2.3-4.4s"),
    "s10_stream_dedup_index": (4.5, "two real LSM index updates in the timed query; pinned 3-4.5s band"),
    "t58_quality_ensemble": (3.8, "full ensemble re-scored per run; r11/r12 steady 3.0-3.1s"),
    "s18_stream_dsir": (4.2, "full-corpus scoring through the streaming path; long-standing ~3.5s pin"),
}

cur = json.load(open(sys.argv[1]))
runs = cur.get("runs")
if runs is None:
    print("need per-run arrays (post-round-8 BENCH_FULL)", file=sys.stderr)
    sys.exit(1)

pins = {"_meta": {
    "source": sys.argv[1],
    "rule": f"hi = min*{RATIO} + {SLACK}; overrides tagged",
    "config": "local[32], 32 shuffle partitions, sf0.1, interleaved min-of-N sweeps",
}}
for q, ts in sorted(runs.items()):
    ok = [t for t in ts if t >= 0]
    if not ok:
        continue
    mn = min(ok)
    if q in OVERRIDES:
        hi, tag = OVERRIDES[q]
        pins[q] = {"band": [0.0, hi], "tag": tag}
    else:
        pins[q] = {"band": [0.0, round(mn * RATIO + SLACK + 0.005, 2)]}
print(json.dumps(pins, indent=1))
