#!/bin/bash
# r17 CDC state-shard sweep (VERDICT r16 Next-round #4): the g100
# streaming probe showed per-row cost rising vs sf10 (cdc_upsert
# 12.1->18 us/row, retract_agg 6.4->15.4), attributed-but-not-proven
# to single-JVM RocksDB working-set growth at 1.5M keys. State stores
# shard per shuffle partition; on a cluster those shards spread across
# executors. This sweep re-runs ONLY the two CDC stages at g100 with
# shuffle partitions 32/64/128 (one fresh JVM each, stages selected
# via GRAFT_PROBE_STAGES): per-row cost falling back toward the sf10
# figure as shards grow means the rise is box-local working-set
# pressure (cluster-safe); flat means per-key cost grows with total
# state (needs RocksDB tuning). The 32-point is re-measured rather
# than reused: the r16 record's 1800.07 s wall sat exactly at the old
# 30-min awaitTermination cap, so completion vs censoring was not
# distinguishable; the probe now records "terminated" explicitly.
#
# Usage: scripts/stream_shard_sweep.sh [outDir] [sfDir]
#   GRAFT_SWEEP_SHUFFLES overrides the partition list.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/stream_shard_sweep}
SF=${2:-/tmp/graft_g100}
mkdir -p "$OUT"
. scripts/jdk17_opens.sh
CP="target/scala-2.13/classes:/opt/spark/jars/*"
for P in ${GRAFT_SWEEP_SHUFFLES:-32 64 128}; do
  TAG="$(basename "$SF")_p$P"
  [ -s "$OUT/$TAG.json" ] && { echo "skip $TAG (done)"; continue; }
  echo "== $TAG $(date +%H:%M:%S)"
  rm -rf "$OUT/work_$TAG"
  GRAFT_PROBE_STAGES=cdc_upsert,retract_agg GRAFT_PROBE_SHUFFLE=$P \
    SPARK_GRAFT_CPUS=32 \
    java $OPENS -cp "$CP" -Xmx48g graft.tools.StreamScaleProbe \
    "$SF" "$OUT/work_$TAG" > "$OUT/$TAG.log" 2>&1
  grep '"probe":"stream_scale"' "$OUT/$TAG.log" > "$OUT/$TAG.json"
  cat "$OUT/$TAG.json"
  rm -rf "$OUT/work_$TAG"   # state dirs are GBs at g100
done
echo "ALL DONE $(date +%H:%M:%S)"
