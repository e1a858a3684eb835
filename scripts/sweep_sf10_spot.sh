#!/bin/bash
# r14 sf10 (100x) spot oracle sweep: the correctness complement of the
# 100x timing probe — 24 representative rows re-verified against
# DuckDB at /tmp/graft_sf10 (60M lineitem / 5M docs / 10M embeddings).
# Selection: the scale-path dedup family, the flagship composites, the
# rows that caught real drift at sf1 (q_agg_group_sum), and a spread
# of join/agg/window shapes. The two declared-quadratic exact-shingle
# rows are excluded (their sf10 cost is root-caused, not unknown), as
# are corpus-dump projections already multiset-verified at sf1.
# Outputs >= ~2M rows go through --setcompare (DuckDB EXCEPT ALL).
#
# Usage: scripts/sweep_sf10_spot.sh [sfDir] [outDir]
set -u
SF=${1:-/tmp/graft_sf10}
OUT=${2:-/tmp/verify_sf10_spot}
ROWS=(q_agg_group_sum q_agg_having q_agg_stats q_join_inner_hash \
  q_join_asof q_join_asof_binned q_win_topk_per_group q_sessionize_gap \
  q_dedup_exact_docs q_dedup_simhash q_dedup_minhash_df \
  q_dedup_contain_minhash q_dedup_embed_bucketed q_dedup_clusters \
  q_dedup_substring q_dedup_canonical q_text_ngram_lm q_text_langid \
  q_star_join_flagship q_tpch_q21_flagship q_curate_flagship \
  q_graph_pagerank q_decontaminate q_stream_neardup)
SETQ="q_join_inner_hash,q_join_asof,q_join_asof_binned,q_win_topk_per_group,q_sessionize_gap,q_dedup_simhash,q_dedup_canonical,q_text_ngram_lm,q_text_langid"

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

mkdir -p /tmp/sweep_sf10_json
for q in "${ROWS[@]}"; do
  [ -s "/tmp/sweep_sf10_json/$q.json" ] && { echo "skip $q (done)"; continue; }
  if [ ! -d "$OUT/$q" ]; then
    echo "MISSING engine output for $q"
    echo "{\"queries\": {\"$q\": \"missing_engine_output\"}}" > "/tmp/sweep_sf10_json/$q.json"
    continue
  fi
  echo "== oracle $q $(date +%H:%M:%S)"
  timeout 2700 python3 scripts/oracle_check.py --setcompare "$SETQ" \
    --json "/tmp/sweep_sf10_json/$q.json" "$SF" "$OUT" "$q"
  rc=$?
  if [ $rc -eq 124 ]; then echo "TIMEOUT $q"; echo "{\"queries\": {\"$q\": \"skipped_oracle_timeout\"}}" > "/tmp/sweep_sf10_json/$q.json"; fi
done
# Merge reports n_skipped / n_missing alongside n_fail (ADVICE r14): a
# timeout or absent row must not inflate an "N/N green" headline.
ROWLIST=$(IFS=,; echo "${ROWS[*]}") python3 - <<'EOF'
import json, glob, os
merged = {}
for f in sorted(glob.glob('/tmp/sweep_sf10_json/*.json')):
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
