#!/bin/bash
# r14 heavy-row sf1 oracle sweep (VERDICT r13 Next-round #2): the 31
# oracled rows the r13 sweep skipped (heavy dedup family + corpus-sized
# outputs). Corpus-sized rows go through oracle_check.py --setcompare
# (order-invariant DuckDB EXCEPT ALL multiset diff); the rest use the
# positional driver-compare path. Per-query DuckDB budget via timeout.
#
# Usage: scripts/sweep_sf1_heavy.sh [sfDir] [outDir]
set -u
SF=${1:-/tmp/graft_sf1}
OUT=${2:-/tmp/verify_sf1_heavy}
ROWS=(q_agg_grouping_sets q_curate_flagship q_decontaminate q_dedup_canonical \
  q_dedup_clusters q_dedup_containment q_dedup_embed_bucketed q_dedup_embed_cosine \
  q_dedup_minhash_df q_dedup_ngram_jaccard q_dedup_substring q_funnel \
  q_graph_pagerank q_join_asof_binned q_join_broadcast q_join_editdist \
  q_join_lateral q_profile_stats q_profile_stats_fast q_profile_table \
  q_project_expr q_scan_project q_seq_transitions q_sim_cosine_topk \
  q_star_join_flagship q_stream_neardup q_text_langid q_text_repetition \
  q_udtf_daterange q_unpivot q_win_pct_rank)
# corpus-sized outputs (≥ ~6M rows at sf1): multiset compare in DuckDB
SETQ="q_unpivot,q_join_broadcast,q_project_expr,q_scan_project,q_udtf_daterange,q_win_pct_rank"

OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
# ^ Spark 4.x on JDK 17 module opens (build.sbt jdk17AddOpens twin):
#   bare `java -cp` lacks what spark-submit/sbt inject; without them
#   the MLlib rows (Kryo reflecting ByteBuffer/SerializedLambda) fail.

QLIST=$(IFS=,; echo "${ROWS[*]}")
if [ ! -d "$OUT" ]; then
  echo "== Verify (Spark) at $SF -> $OUT"
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_QUERIES="$QLIST" \
    java $OPENS -cp "target/scala-2.13/classes:/opt/spark/jars/*" -Xmx100g \
    graft.Verify "$SF" "$OUT" 2>&1 | tail -3
fi

mkdir -p /tmp/sweep_sf1_json
for q in "${ROWS[@]}"; do
  echo "== oracle $q"
  timeout 900 python3 scripts/oracle_check.py --setcompare "$SETQ" \
    --json "/tmp/sweep_sf1_json/$q.json" "$SF" "$OUT" "$q"
  rc=$?
  if [ $rc -eq 124 ]; then echo "TIMEOUT $q"; echo "{\"queries\": {\"$q\": \"skipped_oracle_timeout\"}}" > "/tmp/sweep_sf1_json/$q.json"; fi
done
python3 - <<'EOF'
import json, glob
merged = {}
for f in sorted(glob.glob('/tmp/sweep_sf1_json/*.json')):
    merged.update(json.load(open(f)).get('queries', {}))
fails = {k: v for k, v in merged.items() if v.startswith('fail')}
print(json.dumps({"n": len(merged), "n_fail": len(fails), "fails": fails,
                  "queries": merged}, indent=1, sort_keys=True))
EOF
