#!/bin/sh
# Per-entry warm/cold attribution batch: graft.tools.TimeOne (fresh forked
# JVM + fresh session per entry, 3 reps) over a list of catalog entries —
# the TIMEONE_r10/r11 discipline, scripted so a round can refresh the
# record for its new entries in one invocation.
#
# Usage: tools/timeone_batch.sh <sfDir> <outTxt> <name1> [name2 ...]
set -e
SF="$1"; OUT="$2"; shift 2
cd "$(dirname "$0")/.."
: > "$OUT"
for n in "$@"; do
  # sbt prefixes forked stdout with "[info] " — match the marker anywhere
  sbt -batch "Test/runMain graft.tools.TimeOne $SF $n 3" 2>/dev/null \
    | grep -o "TIMEONE .*" >> "$OUT" || echo "TIMEONE $n FAILED" >> "$OUT"
done
cat "$OUT"
