#!/usr/bin/env bash
# One-command CI gate (VERDICT r9 #6): correctness dump + DuckDB oracle
# compare + full unit-test suite + bench, publishing ONE consistent
# artifact set only after every stage is green. This removes the drift
# class round 8 hit — a failing (rc=1) bench record committed next to a
# green correctness file — because nothing is published unless all three
# gates pass, and everything published comes from the SAME run.
#
# Usage:  tools/verify_all.sh
# Env:    SF_VERIFY  (default /root/testdata/sf0.01)  — oracle scale
#         SF_BENCH   (default /root/testdata/sf0.1)   — bench scale
#         VERIFY_CPUS (default 8), BENCH_CPUS (default 32)
#         FUZZ_SEEDS (default 0 = skip) — optional stage 5: the
#           cross-engine fuzz gate (tools/fuzz_gate.sh, FUZZ.json)
#
# Publishes on success (atomically, via rename):
#   VERIFYALL.json   — {when, correctness, tests, bench} from this run
#   bench_out.json   — the bench JSON line (same bytes Bench printed)
set -euo pipefail
cd "$(dirname "$0")/.."

SF_VERIFY=${SF_VERIFY:-/root/testdata/sf0.01}
SF_BENCH=${SF_BENCH:-/root/testdata/sf0.1}
VERIFY_CPUS=${VERIFY_CPUS:-8}
BENCH_CPUS=${BENCH_CPUS:-32}
WORK=$(mktemp -d /tmp/graft-verifyall-XXXX)
trap 'rm -rf "$WORK"' EXIT

echo "[verify_all] 1/4 compile"
sbt -batch compile > "$WORK/compile.log" 2>&1 \
  || { tail -20 "$WORK/compile.log"; echo "[verify_all] COMPILE FAILED"; exit 1; }

echo "[verify_all] 2/4 oracle suite at $SF_VERIFY"
SPARK_GRAFT_CPUS=$VERIFY_CPUS sbt -batch \
  "runMain graft.Verify $SF_VERIFY $WORK/verify_out" > "$WORK/verify.log" 2>&1 \
  || { tail -20 "$WORK/verify.log"; echo "[verify_all] VERIFY DUMP FAILED"; exit 1; }
python3 tools/oracle_check.py "$SF_VERIFY" "$WORK/verify_out" \
  > "$WORK/oracle.log" 2>&1 || true
# `|| true` on every extraction: under set -e/pipefail an empty grep
# would abort the script before the diagnostic branch below can run
CORRECTNESS=$(grep -Eo '[0-9]+/[0-9]+ queries pass' "$WORK/oracle.log" | tail -1 || true)
PASS=${CORRECTNESS%%/*}; TOTAL_Q=$(echo "$CORRECTNESS" | grep -Eo '/[0-9]+' | tr -d / || true)
if [ -z "$CORRECTNESS" ] || [ "$PASS" != "$TOTAL_Q" ]; then
  grep -E '^(FAIL|ERR)' "$WORK/oracle.log" | head -20 || true
  echo "[verify_all] ORACLE GATE FAILED: ${CORRECTNESS:-no tally}"; exit 1
fi
echo "[verify_all]    $CORRECTNESS"

echo "[verify_all] 3/4 sbt test"
sbt -batch test > "$WORK/test.log" 2>&1 \
  || { grep -E 'TESTS FAILED|\*\*\* FAILED' "$WORK/test.log" | head -20; \
       echo "[verify_all] TEST GATE FAILED"; exit 1; }
TESTS=$(grep -Eo 'Tests: succeeded [0-9]+, failed [0-9]+' "$WORK/test.log" | tail -1 || true)
echo "[verify_all]    $TESTS"

echo "[verify_all] 4/4 bench at $SF_BENCH"
# Bench writes bench_out.json into the project cwd; snapshot the committed
# record first and restore it on ANY failure, so a red bench can never
# leave its record behind (the round-8 drift class).
cp bench_out.json "$WORK/bench_out.prev" 2>/dev/null || true
restore_bench() {
  if [ -f "$WORK/bench_out.prev" ]; then mv "$WORK/bench_out.prev" bench_out.json; fi
}
if ! SPARK_GRAFT_SF_DIR=$SF_BENCH SPARK_GRAFT_CPUS=$BENCH_CPUS \
    sbt -batch "runMain graft.Bench" > "$WORK/bench.log" 2>&1; then
  restore_bench; tail -20 "$WORK/bench.log"
  echo "[verify_all] BENCH GATE FAILED (non-zero exit)"; exit 1
fi
BENCH_JSON=bench_out.json
if [ ! -s "$BENCH_JSON" ] || ! grep -q '"errors":\[\]' "$BENCH_JSON"; then
  restore_bench; tail -20 "$WORK/bench.log"
  echo "[verify_all] BENCH GATE FAILED (errors in record)"; exit 1
fi
TOTAL_S=$(grep -Eo '"value":[0-9.]+' "$BENCH_JSON" | head -1 | cut -d: -f2 || true)
echo "[verify_all]    total ${TOTAL_S}s"

# ---- all gates green: publish atomically from the single run ----
STAMP=$(date -u +%Y-%m-%dT%H:%M:%SZ)
python3 - "$STAMP" "$CORRECTNESS" "$TESTS" "$BENCH_JSON" <<'EOF' > "$WORK/VERIFYALL.json"
import json, sys
stamp, correctness, tests, bench_path = sys.argv[1:5]
print(json.dumps({
    "when": stamp,
    "correctness": correctness,
    "tests": tests,
    "bench": json.load(open(bench_path)),
}, indent=1))
EOF
mv "$WORK/VERIFYALL.json" VERIFYALL.json
echo "[verify_all] ALL GREEN — published VERIFYALL.json + bench_out.json ($STAMP)"

# ---- optional stage 5: cross-engine fuzz gate (VERDICT r14 #2) ----
FUZZ_SEEDS=${FUZZ_SEEDS:-0}
if [ "$FUZZ_SEEDS" -gt 0 ]; then
  echo "[verify_all] 5/5 fuzz gate ($FUZZ_SEEDS seeds)"
  tools/fuzz_gate.sh "$FUZZ_SEEDS" FUZZ.json \
    || { echo "[verify_all] FUZZ GATE FAILED"; exit 1; }
fi
