#!/usr/bin/env bash
# Oracle parity BEYOND the driver's sf0.01 gate (VERDICT r10 #2): run the
# full Verify dump + DuckDB hash-compare at a larger scale factor and
# publish the record. The bench already proves error-free EXECUTION at
# sf0.1/sf1; this proves HASH parity — the cheapest way to catch
# scale-dependent tie/ulp semantics a small oracle cannot see (near-tied
# top-k at 10x the candidates, float sums an order of magnitude longer,
# caps/thresholds that only saturate at volume).
#
# Usage:  tools/verify_sf.sh [sfDir] [outJson]
# Default: /root/testdata/sf0.1 -> VERIFYALL_SF01.json
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.1}
OUT=${2:-VERIFYALL_SF01.json}
CPUS=${VERIFY_CPUS:-16}
WORK=$(mktemp -d /tmp/graft-verifysf-XXXX)
trap 'rm -rf "$WORK"' EXIT

echo "[verify_sf] 1/2 engine dump at $SF"
SPARK_GRAFT_CPUS=$CPUS sbt -batch \
  "runMain graft.Verify $SF $WORK/out" > "$WORK/verify.log" 2>&1 \
  || { tail -20 "$WORK/verify.log"; echo "[verify_sf] DUMP FAILED"; exit 1; }

echo "[verify_sf] 2/2 DuckDB oracle compare at $SF"
python3 tools/oracle_check.py "$SF" "$WORK/out" > "$WORK/oracle.log" 2>&1
tail -3 "$WORK/oracle.log"
CORRECTNESS=$(grep -Eo '[0-9]+/[0-9]+ queries pass' "$WORK/oracle.log" | tail -1 || true)
[ -n "$CORRECTNESS" ] || { tail -30 "$WORK/oracle.log"; echo "[verify_sf] NO TALLY"; exit 1; }

python3 - "$OUT" "$SF" "$CORRECTNESS" "$WORK/oracle.log" <<'EOF'
import datetime, json, re, sys
out, sf, tally, log = sys.argv[1:5]
fails = [l.strip() for l in open(log) if re.match(r'^(FAIL|ERR)', l)]
rec = {
    "when": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
    "sf": sf,
    "correctness": tally,
    "failures": fails,
}
with open(out, "w") as f:
    json.dump(rec, f, indent=1)
    f.write("\n")
print(f"[verify_sf] published {out}: {tally}, {len(fails)} failure lines")
EOF
