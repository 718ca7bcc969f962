#!/usr/bin/env python3
"""Convert a tools/timeone_batch.sh transcript (TIMEONE <name> runN <sec> s
lines) into the TIMEONE_*.json artifact shape: per entry runs_sec (in run
order) and warm_sec = min of the post-first runs (first run carries
codegen/JIT; see TIMEONE_r10.json).

Usage: timeone_to_json.py <inTxt> <outJson> <comment...>
"""
import json
import re
import sys

src, dst = sys.argv[1], sys.argv[2]
comment = " ".join(sys.argv[3:])
runs = {}
for line in open(src):
    m = re.match(r"TIMEONE (\S+) run(\d+) ([0-9.]+) s", line.strip())
    if m:
        runs.setdefault(m.group(1), []).append(float(m.group(3)))
    elif line.startswith("TIMEONE") and "FAILED" in line:
        runs.setdefault(line.split()[1], [])
out = {"comment": comment}
for name, rs in runs.items():
    if not rs:
        out[name] = {"error": "run failed"}
        continue
    warm = min(rs[1:]) if len(rs) > 1 else rs[0]
    out[name] = {"runs_sec": [round(r, 2) for r in rs], "warm_sec": round(warm, 2)}
json.dump(out, open(dst, "w"), indent=1)
print(f"{dst}: {len(runs)} entries")
