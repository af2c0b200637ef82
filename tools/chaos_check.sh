#!/usr/bin/env bash
# Retry-determinism record (round 14): run graft.ChaosCheck — the operator
# battery under injected first-attempt task failures (local[8,3], half of
# every job's scan tasks die once and are recomputed) — and publish the
# JSON verdict as CHAOS.json (the bench_out convention: atomic, only on
# success). A MISMATCH means a retried task fed different rows than its
# first attempt would have — the silent-corruption class that single-run
# oracles cannot see and 1000-executor clusters hit daily.
#
# Usage:  tools/chaos_check.sh [sfDir] [outJson]
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.01}
OUT=${2:-CHAOS.json}
WORK=$(mktemp -d /tmp/graft-chaos-XXXX)
trap 'rm -rf "$WORK"' EXIT

echo "[chaos] running graft.ChaosCheck at $SF"
sbt -batch "Test/runMain graft.ChaosCheck $SF" > "$WORK/run.log" 2>&1 \
  || { tail -30 "$WORK/run.log"; echo "[chaos] FAILED"; exit 1; }
LINE=$(grep -E '^\{"metric":"graft_chaos"' "$WORK/run.log" | tail -1)
[ -n "$LINE" ] || { tail -30 "$WORK/run.log"; echo "[chaos] NO JSON LINE"; exit 1; }
printf '%s\n' "$LINE" > "$WORK/out.json"
python3 -c "
import json, sys
d = json.load(open('$WORK/out.json'))
assert d['mismatches'] == 0, d
assert d['injected_failures'] > 0, d
" || { echo "[chaos] VERDICT NOT CLEAN"; exit 1; }
mv "$WORK/out.json" "$OUT"
echo "[chaos] published $OUT"
