#!/usr/bin/env bash
# Quiet-window retime harness (r16 — the r15 verdict's task 6): the
# round artifacts must carry only windows that were quiet END-TO-END,
# so per-query steady rows are diffable round-over-round (r15's
# contended b/c windows produced a false ann_index regression alarm).
#
# Runs graft.Bench until WANT windows pass tools/retime_check.py's
# quiet gate (contended=false, per-pass steal < 0.1%, zero errors) or
# MAXTRIES runs elapse; rejected windows are kept beside the clean
# ones for provenance. Finishes with the per-query CoV report — the
# done bar is CoV < 10% on every store row across the kept windows.
#
# Usage: tools/retime.sh <outDir> [want=3] [maxtries=6]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:?usage: tools/retime.sh <outDir> [want] [maxtries]}
WANT=${2:-3}
MAXTRIES=${3:-6}
mkdir -p "$OUT"
kept=0
try=0
while [ "$kept" -lt "$WANT" ] && [ "$try" -lt "$MAXTRIES" ]; do
  try=$((try + 1))
  f="$OUT/window_$try.json"
  # the tight steal threshold ALSO arms the bench's own steady-pass
  # retry at 0.1%, extending the self-defense to the per-query rows
  SPARK_GRAFT_BENCH_OUT="$f" \
    SPARK_GRAFT_BENCH_MAX_STEAL_PCT=0.1 \
    sbt -batch "runMain graft.Bench" > "$OUT/window_$try.log" 2>&1 || true
  if [ -f "$f" ] && python3 tools/retime_check.py "$f"; then
    kept=$((kept + 1))
    mv "$f" "$OUT/clean_$kept.json"
  fi
done
if [ "$kept" -lt "$WANT" ]; then
  echo "retime: only $kept/$WANT quiet windows after $try runs" >&2
  exit 1
fi
python3 tools/retime_check.py --cov "$OUT"/clean_*.json
