#!/usr/bin/env bash
# Per-query bench under a MULTI-EXECUTOR topology (VERDICT r14 #4):
# local-cluster has a correctness sweep (VERIFYALL_LC.json) but no cost
# record — a plan can be cheap in local[32] purely because shuffle is
# in-process. This benches the top shuffle-heavy queries under
# local-cluster[2,4,6144] (2 executor JVMs, real netty shuffle/broadcast)
# vs local[8] (equal cores, one JVM) on the same box, and publishes the
# per-query ratio as BENCH_LC.json. Queries paying >2x under real netty
# shuffle get named for an exchange audit.
#
# Usage:  tools/bench_lc.sh [sfDir] [outJson]
set -uo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.1}
OUT=${2:-BENCH_LC.json}
QUERIES=${BENCH_LC_ONLY:-dedup_simhash,sim_lsh_bands_curve,text_bigram_surprisal,sim_mmr_topk,dedup_embedding,dedup_minhash_lsh,dedup_ngram_jaccard,dedup_containment,corpus_near_decontaminate,dedup_minhash_incremental,sim_ann_recall,sim_ann_lsh_topk,mm_block_dedup,text_novelty,dedup_threshold_histogram,text_tfidf_keywords,dedup_span_exact,events_sessionize,events_funnel,corpus_kl_divergence}
WORK=$(mktemp -d /tmp/graft-benchlc-XXXX)
trap 'rm -rf "$WORK"' EXIT

echo "[bench_lc] 1/3 package jar"
sbt -batch package > "$WORK/package.log" 2>&1 \
  || { tail -20 "$WORK/package.log"; echo "[bench_lc] PACKAGE FAILED"; exit 1; }
JAR=$(ls -t target/scala-2.13/*.jar | head -1)

OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13

echo "[bench_lc] 2/3 bench under local-cluster[2,4,6144] at $SF"
( SPARK_GRAFT_MASTER="local-cluster[2,4,6144]" \
  SPARK_GRAFT_CONF="spark.jars=file://$PWD/$JAR;spark.executor.memory=4g;spark.executor.extraJavaOptions=$OPENS" \
  SPARK_GRAFT_CPUS=8 SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=$QUERIES \
  sbt -batch "runMain graft.Bench" > "$WORK/lc.log" 2>&1 ) \
  || { tail -20 "$WORK/lc.log"; echo "[bench_lc] LC BENCH FAILED"; exit 1; }
cp bench_out.json "$WORK/lc.json"

echo "[bench_lc] 3/3 bench under local[8] (equal cores, one JVM)"
( SPARK_GRAFT_CPUS=8 SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=$QUERIES \
  sbt -batch "runMain graft.Bench" > "$WORK/l8.log" 2>&1 ) \
  || { tail -20 "$WORK/l8.log"; echo "[bench_lc] L8 BENCH FAILED"; exit 1; }
cp bench_out.json "$WORK/l8.json"

python3 - "$OUT" "$SF" "$WORK/lc.json" "$WORK/l8.json" <<'EOF'
import datetime, json, sys
out, sf, lcf, l8f = sys.argv[1:5]
lc = json.load(open(lcf))["queries"]
l8 = json.load(open(l8f))["queries"]
loadavg = open("/proc/loadavg").read().split()[0]
rows = []
for q in sorted(lc):
    a, b = lc[q], l8.get(q, -1)
    ratio = round(a / b, 2) if a > 0 and b > 0 else None
    rows.append({"query": q, "local_cluster_s": round(a, 2),
                 "local8_s": round(b, 2), "ratio": ratio})
over2x = [r["query"] for r in rows if r["ratio"] and r["ratio"] > 2.0]
rec = {
    "when": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
    "sf": sf,
    "loadavg_at_publish": loadavg,
    "topology_a": "local-cluster[2,4,6144] — 2 executor JVMs x 4 cores, "
                  "netty shuffle/broadcast, classes via spark.jars",
    "topology_b": "local[8] — one JVM, in-process shuffle, equal cores",
    "queries": rows,
    "total_ratio": round(sum(r["local_cluster_s"] for r in rows)
                         / max(1e-9, sum(r["local8_s"] for r in rows)), 2),
    "over_2x": over2x,
}
with open(out, "w") as f:
    json.dump(rec, f, indent=1)
    f.write("\n")
print(f"[bench_lc] published {out}: total ratio {rec['total_ratio']}, "
      f"{len(over2x)} queries over 2x: {over2x}")
EOF
