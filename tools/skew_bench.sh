#!/usr/bin/env bash
# Publish the AQE skew-join engagement record (VERDICT r14 #7): see
# graft.SkewBench for the harness and its documented knobs.
# Usage: tools/skew_bench.sh [eventsSrcDir] [outJson]
set -uo pipefail
cd "$(dirname "$0")/.."
SRC=${1:-}
OUT=${2:-SKEWBENCH.json}
sbt -batch "Test/runMain graft.SkewBench $SRC" > /tmp/skewbench.log 2>&1
RC=$?
LINE=$(grep -h '"metric":"graft_skew_join"' /tmp/skewbench.log | tail -1)
[ -n "$LINE" ] || { tail -30 /tmp/skewbench.log; echo "[skew] FAILED"; exit 1; }
echo "${LINE#*\{\"metric\"}" >/dev/null  # sanity
echo "$LINE" | sed 's/^[^{]*//' > "$OUT"
echo "[skew] published $OUT (rc=$RC)"
cat "$OUT"
exit $RC
