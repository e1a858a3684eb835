#!/bin/bash
# r18 RP-LSH third-decade probe sweep: drives tools/RpLshProbe over the
# clustered 200k and 2M corpora (the same GenClustered shapes as the
# IVF/graph-ANN probes) at the SHIPPED fixture params (bucketLength
# 0.5, 6 tables, threshold 1.2 — queries/LlmPipeline.scala #55) plus a
# finer-bucket alternative, recording build cost, bucket occupancy,
# collision-candidate volume per query, batch latency (min-of-3) and
# planted recall@5 vs brute force (AnnRecallKit protocol — comparable
# with the graph/IVF tables in BASELINE.md).
#
# Resumable: a config's JSONL is skipped when already present.
#
# Usage: scripts/rplsh_probe_sweep.sh [outDir] [dataDirsList]
#   GRAFT_RPLSH_CONFIGS overrides the "bucketLen:tables:threshold" list;
#   GRAFT_RPLSH_BATCHES the query-batch list (trim at 2M: a batch-800
#   leg at the shipped params joins ~half the corpus per query —
#   ~100 GB of shuffle, more than this box's free disk).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/rplsh_sweep_r18}
DATADIRS=${2:-"/tmp/gc200k /tmp/gc2m"}
mkdir -p "$OUT"
. scripts/jdk17_opens.sh
CP="target/scala-2.13/classes:/opt/spark/jars/*"
# bucketLen:tables:threshold:mode — mode `api` is the shipped
# approxSimilarityJoin (ENOSPC at 2M: it shuttles ~1.2 KB of vector
# structs per candidate pair; measured fatal at 50 queries x 2M);
# `narrow` is the ids-only-join rewrite that makes the asymptote
# measurable at 2M.
CONFIGS=${GRAFT_RPLSH_CONFIGS:-"0.5:6:1.2:api 0.1:6:1.2:api"}
BATCHES=${GRAFT_RPLSH_BATCHES:-"50,200,800"}
for DATA in $DATADIRS; do
  TAG=$(basename "$DATA")
  for CFG in $CONFIGS; do
    BL=${CFG%%:*}; REST=${CFG#*:}; NT=${REST%%:*}
    REST2=${REST#*:}; TH=${REST2%%:*}; MODE=${REST2##*:}
    [ "$MODE" = "$TH" ] && MODE=api
    NAME="${TAG}_bl${BL}_t${NT}_${MODE}"
    [ -s "$OUT/$NAME.jsonl" ] && { echo "skip $NAME (done)"; continue; }
    echo "== $NAME $(date +%H:%M:%S)"
    LOG="$OUT/$NAME.log"
    SPARK_GRAFT_CPUS=32 java $OPENS -cp "$CP" -Xmx64g \
      graft.tools.RpLshProbe "$DATA" "$BL" "$NT" "$TH" "$BATCHES" 50 "$MODE" \
      > "$LOG" 2>&1
    RC=$?
    if [ $RC -ne 0 ] || ! grep -q '"probe":"rplsh_recall"' "$LOG"; then
      echo "ERROR: $NAME exited rc=$RC without a recall line; log kept at $LOG" >&2
      exit 1
    fi
    grep '"probe":"rplsh_' "$LOG" > "$OUT/$NAME.jsonl"
    cat "$OUT/$NAME.jsonl"
  done
done
echo "RPLSH SWEEP DONE $(date +%H:%M:%S)"
