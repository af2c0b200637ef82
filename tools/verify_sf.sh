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

# Memory-bound oracles (OOM / spill-disk-full / memory-bound tag) retry
# through the chunked evaluator: the SAME SQL, CTE-by-CTE materialized
# with bounded memory (tools/oracle_chunked.py) — a single DuckDB
# statement giving up is an oracle resource limit, not a verdict.
OOM=$(grep -E '^FAIL .*([Oo]ut of [Mm]emory|No space left|memory-bound)' \
  "$WORK/oracle.log" | sed -E 's/^FAIL  ([a-z0-9_]+):.*/\1/' | paste -sd, -)
touch "$WORK/chunked.log"
if [ -n "$OOM" ]; then
  echo "[verify_sf] retrying memory-bound oracles chunked: $OOM"
  python3 tools/oracle_chunked.py "$SF" "$WORK/out" "$OOM" \
    > "$WORK/chunked.log" 2>/dev/null || true
  tail -2 "$WORK/chunked.log"
fi

python3 - "$OUT" "$SF" "$CORRECTNESS" "$WORK/oracle.log" "$WORK/chunked.log" <<'EOF'
import datetime, json, re, sys
out, sf, tally, log, chunked_log = sys.argv[1:6]
fails = [l.strip() for l in open(log) if re.match(r'^(FAIL|ERR)', l)]
chunked = [l.strip() for l in open(chunked_log)
           if re.match(r'^(PASS|FAIL)', l)]
# fold chunked PASSes into the tally: a chunked PASS clears the
# single-statement resource failure for that query
cleared = {re.match(r'^PASS\s+(\S+):', l).group(1)
           for l in chunked if l.startswith("PASS")}
# extract with the SAME ^FAIL\s+(\S+): shape used above — an ERR line or
# an unshaped FAIL must stay in fails_left verbatim, not crash the report
def _fail_name(l):
    m = re.match(r'^FAIL\s+(\S+):', l)
    return m.group(1) if m else None
fails_left = [f for f in fails if _fail_name(f) not in cleared]
m = re.match(r'(\d+)/(\d+)', tally)
combined = f"{int(m.group(1)) + len(cleared)}/{m.group(2)} queries pass" \
    if m else tally
rec = {
    "when": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
    "sf": sf,
    "correctness": combined,
    "single_statement_tally": tally,
    "chunked_retries": chunked,
    "failures": fails_left,
}
with open(out, "w") as f:
    json.dump(rec, f, indent=1)
    f.write("\n")
print(f"[verify_sf] published {out}: {combined}, "
      f"{len(fails_left)} failure lines, {len(cleared)} cleared chunked")
EOF
