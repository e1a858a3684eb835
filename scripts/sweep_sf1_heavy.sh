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
  q_join_interval_overlap \
  q_join_lateral q_profile_stats q_profile_stats_fast q_profile_table \
  q_project_expr q_scan_project q_seq_transitions q_sim_cosine_topk \
  q_star_join_flagship q_stream_neardup q_text_langid q_text_repetition \
  q_udtf_daterange q_unpivot q_win_pct_rank)
# corpus-sized outputs (≥ ~6M rows at sf1): multiset compare in DuckDB.
# q_join_interval_overlap joined the list in r15: its oracle now
# states the overlap join through the bin decomposition, which DuckDB
# hash-joins (7 s at sf1) instead of timing out on the no-equi-key
# naive shape — the old skipped_oracle_timeout is retired (41.5M-row
# multiset compare, green).
SETQ="q_unpivot,q_join_broadcast,q_join_interval_overlap,q_project_expr,q_scan_project,q_udtf_daterange,q_win_pct_rank"

. "$(dirname "$0")/jdk17_opens.sh"  # defines $OPENS (build.sbt jdk17AddOpens twin)

QLIST=$(IFS=,; echo "${ROWS[*]}")
# Gate on a completion SENTINEL, not the dir (ADVICE r14): a crashed
# or partial Verify run must rerun, not silently feed the oracles.
if [ ! -f "$OUT/.verify_done" ]; then
  echo "== Verify (Spark) at $SF -> $OUT"
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_QUERIES="$QLIST" \
    java $OPENS -cp "target/scala-2.13/classes:/opt/spark/jars/*" -Xmx100g \
    graft.Verify "$SF" "$OUT" 2>&1 | tail -3
  rc=${PIPESTATUS[0]}
  if [ $rc -ne 0 ] || [ ! -s "$OUT/oracle_sql.json" ]; then
    echo "Verify FAILED (rc=$rc) — not touching sentinel; rerun to retry"
    exit 1
  fi
  touch "$OUT/.verify_done"
fi

mkdir -p /tmp/sweep_sf1_json
for q in "${ROWS[@]}"; do
  if [ ! -d "$OUT/$q" ]; then
    echo "MISSING engine output for $q"
    echo "{\"queries\": {\"$q\": \"missing_engine_output\"}}" > "/tmp/sweep_sf1_json/$q.json"
    continue
  fi
  echo "== oracle $q"
  timeout 900 python3 scripts/oracle_check.py --setcompare "$SETQ" \
    --json "/tmp/sweep_sf1_json/$q.json" "$SF" "$OUT" "$q"
  rc=$?
  if [ $rc -eq 124 ]; then echo "TIMEOUT $q"; echo "{\"queries\": {\"$q\": \"skipped_oracle_timeout\"}}" > "/tmp/sweep_sf1_json/$q.json"; fi
done
# Merge reports n_skipped / n_missing alongside n_fail (ADVICE r14): a
# timeout or absent row must not inflate an "N/N green" headline.
ROWLIST=$(IFS=,; echo "${ROWS[*]}") python3 - <<'EOF'
import json, glob, os
merged = {}
for f in sorted(glob.glob('/tmp/sweep_sf1_json/*.json')):
    merged.update(json.load(open(f)).get('queries', {}))
rows = os.environ['ROWLIST'].split(',')
fails = {k: v for k, v in merged.items() if v.startswith('fail')}
skipped = {k: v for k, v in merged.items()
           if v.startswith('skipped') or v == 'missing_engine_output'}
missing = [k for k in rows if k not in merged]
print(json.dumps({"n": len(merged), "n_fail": len(fails),
                  "n_skipped": len(skipped), "n_missing": len(missing),
                  "fails": fails, "skipped": skipped, "missing": missing,
                  "queries": merged}, indent=1, sort_keys=True))
EOF
