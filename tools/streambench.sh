#!/usr/bin/env bash
# Streaming throughput record (VERDICT r11 #5): run graft.StreamBench —
# the 13-query transit job + three keyed LLM faces (dedup probe, growth,
# churn) driven through MemoryStream at sf-scale volume, keyed state
# measured under BOTH state-store providers — and publish the JSON line
# as STREAMBENCH.json (the bench_out.json convention: atomic, only on
# success).
#
# Usage:  tools/streambench.sh [sfDir] [outJson]
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.1}
OUT=${2:-STREAMBENCH.json}
CPUS=${STREAM_CPUS:-32}
WORK=$(mktemp -d /tmp/graft-streambench-XXXX)
trap 'rm -rf "$WORK"' EXIT

echo "[streambench] running graft.StreamBench at $SF"
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=$CPUS sbt -batch \
  "runMain graft.StreamBench" > "$WORK/run.log" 2>&1 \
  || { tail -30 "$WORK/run.log"; echo "[streambench] FAILED"; exit 1; }
LINE=$(grep -E '^\{"metric":"graft_stream_suite"' "$WORK/run.log" | tail -1)
[ -n "$LINE" ] || { tail -30 "$WORK/run.log"; echo "[streambench] NO JSON LINE"; exit 1; }
printf '%s\n' "$LINE" > "$WORK/out.json"
python3 -c "import json,sys; json.load(open('$WORK/out.json'))" \
  || { echo "[streambench] INVALID JSON"; exit 1; }
mv "$WORK/out.json" "$OUT"
echo "[streambench] published $OUT"
