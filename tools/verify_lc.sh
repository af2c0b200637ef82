#!/usr/bin/env bash
# Oracle parity under a MULTI-EXECUTOR topology (VERDICT r12 #2):
# local[32] is one JVM and one filesystem, which hides exactly the
# failure class the round-12 artifact-path finding belongs to —
# single-JVM assumptions, closure-serialization surprises, broadcast
# sizing. local-cluster[2,4,6144] launches TWO SEPARATE EXECUTOR JVMs
# (4 cores / 6 GiB each) under a real standalone-style scheduler: every
# closure crosses a process boundary, every shuffle goes over netty,
# every broadcast is actually transferred, and executor-side code runs
# from the packaged jar, not sbt's classpath.
#
# Usage:  tools/verify_lc.sh [sfDir] [outJson]
# Default: /root/testdata/sf0.01 -> VERIFYALL_LC.json
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.01}
OUT=${2:-VERIFYALL_LC.json}
WORK=$(mktemp -d /tmp/graft-verifylc-XXXX)
trap 'rm -rf "$WORK"' EXIT

echo "[verify_lc] 1/3 package jar (executors load classes from it)"
sbt -batch package > "$WORK/package.log" 2>&1 \
  || { tail -20 "$WORK/package.log"; echo "[verify_lc] PACKAGE FAILED"; exit 1; }
JAR=$(ls -t target/scala-2.13/*.jar | head -1)
[ -n "$JAR" ] || { echo "[verify_lc] NO JAR"; exit 1; }

# Executor JVMs need the same JDK-17 --add-opens the driver gets from
# build.sbt (SparkSession created outside spark-submit).
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

echo "[verify_lc] 2/3 engine dump under local-cluster[2,4,6144] at $SF"
export SPARK_HOME=/opt/spark
# the launcher's getScalaVersion probes source-tree build dirs when this
# is unset and dies with "Cannot find any build directories"
export SPARK_SCALA_VERSION=2.13
# non-default artifact root: executor-side artifact writes and memoized
# read-backs must round-trip through the CONFIGURED shared dir, not the
# tmpdir fallback — the multi-executor proof of the r12 portability fix
ARTDIR=$(mktemp -d /tmp/graft-lc-artifacts-XXXX)
SPARK_GRAFT_MASTER="local-cluster[2,4,6144]" \
SPARK_GRAFT_CONF="spark.jars=file://$PWD/$JAR;spark.executor.memory=4g;spark.graft.artifacts.dir=$ARTDIR;spark.executor.extraJavaOptions=$OPENS" \
SPARK_GRAFT_CPUS=8 sbt -batch \
  "runMain graft.Verify $SF $WORK/out" > "$WORK/verify.log" 2>&1 \
  || { tail -30 "$WORK/verify.log"; echo "[verify_lc] DUMP FAILED"; exit 1; }
ENGINE_ERRS=$(grep -c '^\[verify\].*failed' "$WORK/verify.log" || true)
N_ART=$(ls "$ARTDIR" 2>/dev/null | wc -l)
echo "[verify_lc]    $N_ART artifact trees under the configured root"
rm -rf "$ARTDIR"

echo "[verify_lc] 3/3 DuckDB oracle compare"
python3 tools/oracle_check.py "$SF" "$WORK/out" > "$WORK/oracle.log" 2>&1
tail -3 "$WORK/oracle.log"
CORRECTNESS=$(grep -Eo '[0-9]+/[0-9]+ queries pass' "$WORK/oracle.log" | tail -1 || true)
[ -n "$CORRECTNESS" ] || { tail -30 "$WORK/oracle.log"; echo "[verify_lc] NO TALLY"; exit 1; }

python3 - "$OUT" "$SF" "$CORRECTNESS" "$WORK/oracle.log" "$ENGINE_ERRS" "$N_ART" <<'EOF'
import datetime, json, re, sys
out, sf, tally, log, engine_errs, n_art = sys.argv[1:7]
fails = [l.strip() for l in open(log) if re.match(r'^(FAIL|ERR)', l)]
rec = {
    "when": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
    "sf": sf,
    "topology": "local-cluster[2,4,6144] — 2 executor JVMs x 4 cores, "
                "classes shipped via spark.jars, real netty shuffle / "
                "broadcast / closure serialization",
    "artifacts_dir": f"non-default spark.graft.artifacts.dir honored: "
                     f"{n_art} artifact trees written under the configured "
                     f"root during the sweep",
    "engine_query_errors": int(engine_errs),
    "correctness": tally,
    "failures": fails,
}
with open(out, "w") as f:
    json.dump(rec, f, indent=1)
    f.write("\n")
print(f"[verify_lc] published {out}: {tally}, engine errors {engine_errs}")
EOF
