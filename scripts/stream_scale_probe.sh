#!/bin/bash
# r15 streaming scale probe (VERDICT r14 Next-round #4): drive the
# streaming duals (near-dup transformWithState with/without TTL, CDC
# sinkUpsert replay, retractAggStream) at sf0.1 and the 10x GenScale
# set on RocksDB, one fresh JVM per scale (same isolation rationale as
# bench_scale_probe.sh), recording rows/s + state size per decade.
#
# Usage: scripts/stream_scale_probe.sh [outDir] [sfDir ...]
#   sfDir args (default sf0.1 + the GenScale sf1 set) let a later run
#   add the 100x decade: scripts/stream_scale_probe.sh /tmp/out /tmp/graft_sf10
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/stream_probe}
shift || true
SFS=${*:-"/root/testdata/sf0.1 /tmp/graft_sf1"}
mkdir -p "$OUT"
. scripts/jdk17_opens.sh   # defines $OPENS (build.sbt jdk17AddOpens twin)
CP="target/scala-2.13/classes:/opt/spark/jars/*"
for SF in $SFS; do
  TAG=$(basename "$SF")
  [ -s "$OUT/$TAG.json" ] && { echo "skip $TAG (done)"; continue; }
  echo "== $TAG $(date +%H:%M:%S)"
  rm -rf "$OUT/work_$TAG"
  SPARK_GRAFT_CPUS=32 \
    java $OPENS -cp "$CP" -Xmx48g graft.tools.StreamScaleProbe \
    "$SF" "$OUT/work_$TAG" > "$OUT/$TAG.log" 2>&1
  grep '"probe":"stream_scale"' "$OUT/$TAG.log" > "$OUT/$TAG.json"
  cat "$OUT/$TAG.json"
done
echo "ALL DONE $(date +%H:%M:%S)"
