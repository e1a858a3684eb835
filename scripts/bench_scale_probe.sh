#!/bin/bash
# r14 scale probe (VERDICT r13 Next-round #1): min-of-3 per-query bench
# of the scale-path rows at the 10x (/tmp/graft_sf1) and 100x
# (/tmp/graft_sf10) GenScale datasets, ONE FRESH JVM PER (query, sf).
#
# Why one JVM per query: a single long-lived 100 GB heap accumulates
# localCheckpoint blocks (clearCache does not drop them) and GCs
# rarely, so later queries in a shared run inherit memory pressure —
# the first chained sf10 run showed monotonically drifting reps and
# noise p90 = 18.7 on unchanged code. Isolated JVMs give each query
# the same cold-start conditions; with per-query runtimes of 10-250 s
# at sf10 the ~4 s JVM+session warmup is noise.
#
# Usage: scripts/bench_scale_probe.sh [outDir]
#   Env overrides (r15, for the 1000x leg): GRAFT_PROBE_SFS (space-
#   separated scale dirs), GRAFT_PROBE_QS (space-separated query
#   keys), GRAFT_PROBE_REPS (min-of-N; 1 is reasonable at sf100 where
#   per-query runtimes of minutes amortize shared-box noise and 3 reps
#   would triple an hour-long sweep), GRAFT_PROBE_XMX (heap).
set -u
OUT=${1:-/tmp/iso}
mkdir -p "$OUT"
. "$(dirname "$0")/jdk17_opens.sh"  # defines $OPENS (build.sbt jdk17AddOpens twin)

CP="target/scala-2.13/classes:/opt/spark/jars/*"
QUERIES=(q_star_join_flagship q_tpch_q21_flagship q_text_ngram_lm \
  q_dedup_substring q_dedup_embed_bucketed q_dedup_contain_minhash \
  q_dedup_minhash_df q_dedup_clusters q_curate_flagship)
[ -n "${GRAFT_PROBE_QS:-}" ] && read -ra QUERIES <<< "$GRAFT_PROBE_QS"
REPS=${GRAFT_PROBE_REPS:-3}
XMX=${GRAFT_PROBE_XMX:-64g}
for SF in ${GRAFT_PROBE_SFS:-"/tmp/graft_sf1 /tmp/graft_sf10"}; do
  TAG=$(basename "$SF")
  for Q in "${QUERIES[@]}"; do
    [ -s "$OUT/${TAG}_${Q}.json" ] && { echo "skip $TAG $Q (done)"; continue; }
    echo "== $TAG $Q $(date +%H:%M:%S)"
    SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_REPS=$REPS \
      SPARK_GRAFT_QUERIES="$Q" \
      SPARK_GRAFT_SPREAD_OUT="$OUT/${TAG}_${Q}.spread.json" \
      java $OPENS -cp "$CP" -Xmx$XMX graft.Bench \
      > "$OUT/${TAG}_${Q}.log" 2>&1
    grep '"metric":"total"' "$OUT/${TAG}_${Q}.log" | head -1 \
      > "$OUT/${TAG}_${Q}.json"
    tail -c 300 "$OUT/${TAG}_${Q}.json"; echo
  done
done
echo "ALL DONE $(date +%H:%M:%S)"
