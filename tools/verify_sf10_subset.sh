#!/usr/bin/env bash
# Fourth-decade oracle parity run (VERDICT r16 #2): Spark Verify dump of
# the tractable subset at the sf10 fixture, then the per-query isolated
# DuckDB sweep with documented infeasibility. One dated run at HEAD.
#
# Usage: tools/verify_sf10_subset.sh [sfDir] [outDir] [outJson]
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/tmp/graft_sf10}
OUT=${2:-/tmp/verify_sf10_subset}
JSON=${3:-VERIFYALL_SF10.json}

# subset = the SINGLES + CHUNKED lists in sf10_oracle_subset.py
NAMES=$(python3 - <<'EOF'
import importlib.util, os
spec = importlib.util.spec_from_file_location(
    "s", os.path.join("tools", "sf10_oracle_subset.py"))
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
print(",".join(m.SINGLES + m.CHUNKED))
EOF
)

echo "[sf10-subset] Verify dump of $(echo "$NAMES" | tr ',' '\n' | wc -l) queries at $SF"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Verify $SF $OUT $NAMES"

echo "[sf10-subset] isolated DuckDB sweep"
python3 tools/sf10_oracle_subset.py "$SF" "$OUT" "$JSON"
