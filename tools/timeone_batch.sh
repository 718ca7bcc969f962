#!/bin/sh
# Per-entry warm/cold attribution batch: graft.tools.TimeOne (fresh forked
# JVM + fresh session per entry, 3 reps) over a list of catalog entries —
# the TIMEONE_r10/r11 discipline, scripted so a round can refresh the
# record for its new entries in one invocation.
#
# Usage: tools/timeone_batch.sh <sfDir> <outTxt> <name1> [name2 ...]
set -e
SF="$1"; OUT="$2"; shift 2
REPS=3
cd "$(dirname "$0")/.."
: > "$OUT"
for n in "$@"; do
  # sbt prefixes forked stdout with "[info] " — match the marker anywhere.
  # An sbt crash AFTER emitting some runN lines would make a bare grep
  # "succeed" on the partial transcript and silently record an incomplete
  # measurement as valid — so demand exactly $REPS runN lines for the
  # entry, else write the FAILED marker (timeone_to_json reports it).
  lines=$(sbt -batch "Test/runMain graft.tools.TimeOne $SF $n $REPS" 2>/dev/null \
    | grep -o "TIMEONE $n run[0-9]* .*" || true)
  if [ "$(printf '%s\n' "$lines" | grep -c "run")" -eq "$REPS" ]; then
    printf '%s\n' "$lines" >> "$OUT"
  else
    echo "TIMEONE $n FAILED" >> "$OUT"
  fi
done
cat "$OUT"
