#!/usr/bin/env bash
# Executor-loss fault demonstration (round 14): run graft.FaultTolerance —
# the MinHash-LSH pipeline under local-cluster with a kill -9 of one
# executor JVM mid-query, once under reliable-checkpoint staging (must
# complete, rows identical to the no-fault baseline) and once under the
# local-checkpoint default (must fail with the lost-block error class the
# Staging scaladoc documents) — and publish the verdict as
# STAGING_FAULT.json (the bench_out convention: atomic, only on success).
#
# Usage:  tools/staging_fault.sh [sfDir] [outJson]
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.1}
OUT=${2:-STAGING_FAULT.json}
WORK=$(mktemp -d /tmp/graft-fault-XXXX)
trap 'rm -rf "$WORK"' EXIT

echo "[fault] 1/2 package jar (executors load classes from it)"
sbt -batch "Test/package" > "$WORK/package.log" 2>&1 \
  || { tail -20 "$WORK/package.log"; echo "[fault] PACKAGE FAILED"; exit 1; }
sbt -batch package >> "$WORK/package.log" 2>&1 \
  || { tail -20 "$WORK/package.log"; echo "[fault] PACKAGE FAILED"; exit 1; }
MAINJAR=$(ls -t target/scala-2.13/*.jar | grep -v test | head -1)
TESTJAR=$(ls -t target/scala-2.13/*-test.jar 2>/dev/null | head -1)
[ -n "$MAINJAR" ] || { echo "[fault] NO JAR"; exit 1; }
JARS="file://$PWD/$MAINJAR"
[ -n "$TESTJAR" ] && JARS="$JARS,file://$PWD/$TESTJAR"

OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

echo "[fault] 2/2 kill-an-executor run under local-cluster[2,2,3072] at $SF"
export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13
SPARK_GRAFT_MASTER="local-cluster[2,2,3072]" \
SPARK_GRAFT_CONF="spark.jars=$JARS;spark.executor.memory=2g;spark.executor.extraJavaOptions=$OPENS" \
sbt -batch "Test/runMain graft.FaultTolerance $SF" > "$WORK/run.log" 2>&1 \
  || { tail -40 "$WORK/run.log"; echo "[fault] RUN FAILED"; exit 1; }
LINE=$(grep -E '^\{"metric":"graft_staging_fault"' "$WORK/run.log" | tail -1)
[ -n "$LINE" ] || { tail -30 "$WORK/run.log"; echo "[fault] NO JSON LINE"; exit 1; }
printf '%s\n' "$LINE" > "$WORK/out.json"
python3 -c "
import json
d = json.load(open('$WORK/out.json'))
assert d['reliable_checkpoint']['verdict'] == 'completed-identical', d
assert d['persist']['verdict'] == 'completed-identical', d
assert d['local_checkpoint']['verdict'] in ('failed-as-documented', 'inconclusive'), d
" || { echo "[fault] VERDICT NOT CLEAN"; exit 1; }
mv "$WORK/out.json" "$OUT"
echo "[fault] published $OUT"
grep -E '^\[fault\]' "$WORK/run.log" | tail -8
