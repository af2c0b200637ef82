#!/usr/bin/env bash
# Cross-engine fuzz gate (VERDICT r14 #2): N random-seed corpora with
# adversarial content knobs (FuzzGen's emptyDocs / unicodeHeavy /
# allDuplicate / zeroNormVecs / singleUser / tsTies / hotRoute), a
# rotating ~30-query subset per seed spanning every family, engine vs
# DuckDB hash-compare per seed. Publishes FUZZ.json.
#
# Usage:  tools/fuzz_gate.sh [nSeeds] [outJson]
# Default: 20 seeds -> FUZZ.json. Wired into tools/verify_all.sh as an
# optional stage (FUZZ_SEEDS=0 skips).
set -uo pipefail
cd "$(dirname "$0")/.."

SEEDS=${1:-20}
OUT=${2:-FUZZ.json}
BASE=${FUZZ_BASE:-/tmp/graft_fuzz}
rm -rf "$BASE"

echo "[fuzz] 1/2 generating $SEEDS corpora + engine dumps (one JVM)"
sbt -batch "Test/runMain graft.FuzzGen $SEEDS $BASE" > /tmp/fuzz_gen.log 2>&1
GENRC=$?
GENLINE=$(grep -h '"metric":"graft_fuzz_gen"' /tmp/fuzz_gen.log | tail -1)
if [ -z "$GENLINE" ]; then
  tail -30 /tmp/fuzz_gen.log; echo "[fuzz] GENERATION FAILED"; exit 1
fi
[ $GENRC -ne 0 ] && echo "[fuzz] WARNING: engine errors during dump (rc=$GENRC)"

echo "[fuzz] 2/2 DuckDB oracle compare per seed"
python3 - "$SEEDS" "$BASE" "$OUT" <<'EOF'
import datetime, json, re, subprocess, sys

n_seeds, base, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
gen_line = [l for l in open("/tmp/fuzz_gen.log")
            if '"metric":"graft_fuzz_gen"' in l][-1]
gen = json.loads(gen_line[gen_line.index('{'):])

seeds = {}
total_pass = total_q = 0
mismatches = []
for s in range(1, n_seeds + 1):
    sf = f"{base}/seed{s}"
    r = subprocess.run(
        [sys.executable, "tools/oracle_check.py", sf, f"{sf}/out"],
        capture_output=True, text=True)
    tally = re.search(r"(\d+)/(\d+) queries pass", r.stdout)
    fails = [l.strip() for l in r.stdout.splitlines()
             if re.match(r"^(FAIL|ERR)", l)]
    ok, tot = (int(tally.group(1)), int(tally.group(2))) if tally else (0, 0)
    total_pass += ok
    total_q += tot
    det = gen["seeds_detail"].get(f"seed{s}", {})
    seeds[f"seed{s}"] = {
        "tally": f"{ok}/{tot}",
        "knobs": det.get("knobs", {}),
        "engine_errors": det.get("engine_errors", []),
        "failures": fails[:10],
    }
    if fails or det.get("engine_errors"):
        mismatches.append(f"seed{s}")
    print(f"[fuzz] seed{s}: {ok}/{tot} pass"
          + (f", {len(fails)} FAIL" if fails else ""))

knob_cov = {}
for rec in seeds.values():
    for k, v in rec["knobs"].items():
        knob_cov[k] = knob_cov.get(k, 0) + (1 if v else 0)

rec = {
    "when": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
    "seeds": n_seeds,
    "total": f"{total_pass}/{total_q} queries pass across all seeds",
    "mismatched_seeds": mismatches,
    "knob_coverage_seeds_on": knob_cov,
    "per_seed": seeds,
}
with open(out, "w") as f:
    json.dump(rec, f, indent=1)
    f.write("\n")
print(f"[fuzz] published {out}: {rec['total']}, "
      f"{len(mismatches)} seeds with findings")
sys.exit(1 if mismatches else 0)
EOF
