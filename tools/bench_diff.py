#!/usr/bin/env python3
"""Compare two graft Bench JSON artifacts per query.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [ratio_threshold]

Prints totals, the overlap-only totals (fair when the catalog grew),
entries exceeding the ratio threshold in either direction, and queries
present in only one artifact. A uniform inflation across ALL entries is
flagged as ambient-host drift rather than per-query regression — this
box's hour-to-hour throughput band is documented in SURVEY.md.
"""
import json
import sys

old_f, new_f = sys.argv[1], sys.argv[2]
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25

old = json.load(open(old_f))
new = json.load(open(new_f))
oq, nq = old["queries"], new["queries"]

overlap = sorted(set(oq) & set(nq))
o_sum = sum(oq[k] for k in overlap)
n_sum = sum(nq[k] for k in overlap)
print(f"total: {old['value']:.1f} -> {new['value']:.1f} "
      f"({len(oq)} -> {len(nq)} queries, errors {old['errors']} -> {new['errors']})")
print(f"overlap ({len(overlap)} queries): {o_sum:.1f} -> {n_sum:.1f} "
      f"({n_sum / o_sum:.2f}x)")

ratios = {k: nq[k] / oq[k] for k in overlap if oq[k] > 0.05}
drift = sorted(ratios.values())[len(ratios) // 2] if ratios else 1.0
print(f"median per-query ratio {drift:.2f}x "
      f"({'ambient drift — compare entries against the median, not 1.0' if abs(drift - 1) > 0.1 else 'no drift'})")

movers = [(k, oq[k], nq[k], ratios[k]) for k in ratios
          if ratios[k] > thr * drift or ratios[k] < drift / thr]
for k, a, b, r in sorted(movers, key=lambda t: -t[3]):
    print(f"  {k:30s} {a:7.2f} -> {b:7.2f}  ({r:.2f}x, {r / drift:.2f}x vs drift)")
if not movers:
    print(f"  no entry beyond {thr}x of the median drift")

for k in sorted(set(nq) - set(oq)):
    print(f"  new:     {k:30s} {nq[k]:7.2f}")
for k in sorted(set(oq) - set(nq)):
    print(f"  removed: {k:30s} {oq[k]:7.2f}")
