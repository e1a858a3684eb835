#!/bin/bash
# r16 (VERDICT r15 Next-round #6): per-round PlanAudit of the most
# expensive bench rows — PlanSuite pins plan SHAPES, this pins shuffle
# VOLUMES (the thing that actually killed the first sf100 runs).
# Output: one per-exchange metrics tree per query; the per-round
# summary table goes into BASELINE.md.
#
# Usage: scripts/plan_audit_top5.sh [sfDir] [outDir]
#   GRAFT_AUDIT_QS overrides the query list (default: the five most
#   expensive rows of the last recorded sf0.1 bench).
set -u
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/plan_audit}
mkdir -p "$OUT"
. "$(dirname "$0")/jdk17_opens.sh"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
QUERIES=(q_dedup_containment q_dedup_ngram_jaccard q_dedup_canonical \
  q_dedup_clusters q_dedup_embed_bucketed)
[ -n "${GRAFT_AUDIT_QS:-}" ] && read -ra QUERIES <<< "$GRAFT_AUDIT_QS"
for Q in "${QUERIES[@]}"; do
  echo "== $Q $(date +%H:%M:%S)"
  java $OPENS -cp "$CP" -Xmx${GRAFT_AUDIT_XMX:-32g} graft.tools.PlanAudit \
    "$SF" "$Q" 2> "$OUT/${Q}.log" | tee "$OUT/${Q}.audit"
done
echo "audits in $OUT/*.audit"
