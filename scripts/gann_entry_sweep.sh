#!/bin/bash
# r17 graph-ANN entry-probe trade sweep (VERDICT r16 Next-round #5):
# defaultEntries = n/32 was justified by a two-point comparison (16 vs
# n/32 at 200k); this sweeps recall + batch latency over
# entries x hops against ONE persisted index per corpus so the shipped
# default is the knee of a measured curve, not a guess. Each config is
# a fresh JVM (GraphAnnProbe with GRAFT_GANN_REUSE=1: the index is
# built/stamped once by the first run, probe-only afterwards).
#
# Usage: scripts/gann_entry_sweep.sh <dataDir> <indexDir> <outJsonl>
#                                    <entriesList> <hopsList> [batch]
#   e.g. scripts/gann_entry_sweep.sh /tmp/graft_clustered \
#          /tmp/graft_gann_200k /tmp/gann_sweep_200k.jsonl \
#          "1000 8000 6250" "5 7 9" 800
set -u
cd "$(dirname "$0")/.."
DATA=$1; IDX=$2; OUT=$3
ENTRIES_LIST=$4; HOPS_LIST=$5
BATCH=${6:-800}
. scripts/jdk17_opens.sh
CP="target/scala-2.13/classes:/opt/spark/jars/*"
: > "$OUT.tmp"
for H in $HOPS_LIST; do
  for E in $ENTRIES_LIST; do
    echo "== entries=$E hops=$H $(date +%H:%M:%S)"
    LOG=$(mktemp /tmp/gann_sweep.XXXX.log)
    GRAFT_GANN_REUSE=1 GRAFT_GANN_ENTRIES=$E GRAFT_GANN_HOPS=$H \
      SPARK_GRAFT_CPUS=32 \
      java $OPENS -cp "$CP" -Xmx64g graft.tools.GraphAnnProbe \
      "$DATA" "$IDX" "$BATCH" 50 plant > "$LOG" 2>&1
    RC=$?
    # a crashed or JSON-less config must fail LOUDLY, not leave a
    # silent hole in the sweep that reads as "measured" (ADVICE r17)
    if [ $RC -ne 0 ] || ! grep -q '"probe":"graph_ann' "$LOG"; then
      echo "ERROR: entries=$E hops=$H exited rc=$RC with $(grep -c '"probe":"graph_ann' "$LOG") probe lines; log kept at $LOG" >&2
      exit 1
    fi
    grep '"probe":"graph_ann' "$LOG" | \
      sed "s/^{/{\"entries\":$E,\"hops\":$H,/" >> "$OUT.tmp"
    tail -3 "$OUT.tmp"
    rm -f "$LOG"
  done
done
mv "$OUT.tmp" "$OUT"
echo "wrote $OUT"
