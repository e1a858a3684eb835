#!/bin/bash
# r18 IVF/IVF-PQ third-decade probe sweep (VERDICT r17 Next-round #1):
# drives tools/IvfProbe over the clustered 200k and 2M corpora for
# both families at both the legacy FIXED kCells=16 and the n-scaled
# auto (~sqrt n) cell count, recording build cost, batch latency
# (50/200/800, min-of-3) and planted recall@5 vs brute force — the
# same protocol (AnnRecallKit) as the graph-ANN probes, so the three
# ANN families are comparable in BASELINE.md.
#
# Resumable: each config's JSONL is skipped when already present, and
# each config reuses its own persisted index across retries
# (GRAFT_IVF_REUSE=1 only helps within a config dir; distinct configs
# get distinct index dirs because kCells is baked into the build).
#
# Usage: scripts/ivf_probe_sweep.sh [outDir] [dataDirsList]
#   GRAFT_IVF_CONFIGS overrides the "family:kcells:nprobe" list.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/ivf_sweep_r18}
DATADIRS=${2:-"/tmp/gc200k /tmp/gc2m"}
mkdir -p "$OUT"
. scripts/jdk17_opens.sh
CP="target/scala-2.13/classes:/opt/spark/jars/*"
# family:kCells(0=auto):nProbe — fixed-16 at the shipped nProbe=4 (the
# claim under test) and auto-cells at nProbe 4 and 16 (coverage trade)
CONFIGS=${GRAFT_IVF_CONFIGS:-"ivf:16:4 ivf:0:4 ivf:0:16 ivfpq:16:4 ivfpq:0:4 ivfpq:0:16"}
for DATA in $DATADIRS; do
  TAG=$(basename "$DATA")
  for CFG in $CONFIGS; do
    FAM=${CFG%%:*}; REST=${CFG#*:}; KC=${REST%%:*}; NP=${REST##*:}
    NAME="${TAG}_${FAM}_k${KC}_p${NP}"
    [ -s "$OUT/$NAME.jsonl" ] && { echo "skip $NAME (done)"; continue; }
    echo "== $NAME $(date +%H:%M:%S)"
    LOG="$OUT/$NAME.log"
    GRAFT_IVF_REUSE=1 SPARK_GRAFT_CPUS=32 \
      java $OPENS -cp "$CP" -Xmx64g graft.tools.IvfProbe \
      "$DATA" "$OUT/idx_${TAG}_${FAM}_k${KC}" "$FAM" "$KC" "$NP" \
      50,200,800 50 > "$LOG" 2>&1
    RC=$?
    if [ $RC -ne 0 ] || ! grep -q "\"probe\":\"${FAM}_recall\"" "$LOG"; then
      echo "ERROR: $NAME exited rc=$RC without a recall line; log kept at $LOG" >&2
      exit 1
    fi
    grep "\"probe\":\"${FAM}_" "$LOG" > "$OUT/$NAME.jsonl"
    tail -2 "$OUT/$NAME.jsonl"
  done
done
echo "IVF SWEEP DONE $(date +%H:%M:%S)"
