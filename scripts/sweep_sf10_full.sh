#!/bin/bash
# r15 sf10 (100x) FULL oracle sweep (VERDICT r14 Next-round #1): the
# 107 oracled rows not covered by the r14 spot sweep — together they
# bring sf10 coverage to 131/133 oracled rows. Excluded BY DESIGN: the
# two declared-quadratic exact-shingle rows (q_dedup_containment,
# q_dedup_ngram_jaccard) whose sf10 cost is root-caused (Ω(Σ df²),
# r13) and runtime-guarded, not unknown. Rows are ordered cheap-first
# (ascending sf0.1 output rows) so most coverage lands early; the six
# corpus-dump projections (≥6M rows at sf10) run last via
# oracle_check.py --setcompare (DuckDB EXCEPT ALL multiset diff).
#
# Resume protocol (ADVICE r14): the Spark Verify step is gated on a
# completion SENTINEL ($OUT/.verify_done, touched only after Verify
# exits 0), not on the output dir existing — a crashed Verify reruns
# instead of silently feeding partial output to the oracles. Rows
# whose engine parquet is absent are recorded explicitly as
# missing_engine_output, and the merge reports n_skipped / n_missing
# alongside n_fail so a timeout or crash can never inflate the
# headline.
#
# Usage: scripts/sweep_sf10_full.sh [sfDir] [outDir]
set -u
cd "$(dirname "$0")/.."
SF=${1:-/tmp/graft_sf10}
OUT=${2:-/tmp/verify_sf10_full}
JSONDIR=/tmp/sweep_sf10_full_json
ROWS=(q_set_except q_agg_theta_sketch q_funnel q_agg_corr \
  q_agg_mode q_agg_percentiles q_udaf_geomean q_agg_quantile_sketch \
  q_agg_distinct q_cdc_agg_maintain q_dedup_embed_cosine q_join_skew_salted \
  q_profile_stats q_profile_stats_fast q_text_lang_stats q_agg_grouping_sets \
  q_profile_table q_agg_rollup q_histogram q_text_bm25 \
  q_topk_global q_cohort_matrix q_cohort_retention q_explode_words \
  q_agg_cube q_seq_transitions q_set_intersect q_set_union \
  q_set_union_all q_text_topk_words q_subquery_in q_sample_stratified \
  q_text_tfidf q_seq_packing q_join_anti q_join_cross \
  q_cdc_latest_by_key q_pivot q_stream_stateful_count q_sim_cosine_topk \
  q_sample_mix q_array_funcs q_array_hof q_multimodal_decode \
  q_multimodal_join q_text_dedup_clean q_text_fingerprint q_text_pii_scrub \
  q_text_quality q_text_repetition q_text_tokens q_train_split \
  q_anomaly_zscore q_join_lateral q_stream_dedup q_stream_stream_join \
  q_join_range_binned q_text_chunk q_join_editdist q_join_semi \
  q_stream_sliding q_join_full q_join_left q_posexplode \
  q_string_agg q_win_ntile q_multimodal_framesample q_join_asof_forward \
  q_join_asof_nearest q_join_asof_tolerance q_join_theta_range q_sort_multi \
  q_str_funcs q_str_funcs2 q_udf_scalar q_stream_stream_join_left \
  q_win_sliding_rows q_scan_filter_pushdown q_twap q_stream_tumbling \
  q_stream_watermark_late q_join_interval_overlap q_gapfill q_json_funcs \
  q_subquery_scalar q_filter_complex q_stream_session q_cdc_scd2 \
  q_map_funcs q_win_distinct_count q_win_lag_lead q_bitwise \
  q_cond_funcs q_date_funcs q_math_funcs q_regex_funcs \
  q_win_range_frame q_win_rank q_win_rank_stats q_win_running \
  q_win_value_funcs q_join_broadcast q_project_expr q_scan_project \
  q_udtf_daterange q_win_pct_rank q_unpivot)
# corpus-sized outputs (≥ ~2M rows at sf10): multiset compare in DuckDB
SETQ="q_join_broadcast,q_project_expr,q_scan_project,q_udtf_daterange,q_unpivot,q_win_pct_rank"

. scripts/jdk17_opens.sh   # defines $OPENS (build.sbt jdk17AddOpens twin)

QLIST=$(IFS=,; echo "${ROWS[*]}")
if [ ! -f "$OUT/.verify_done" ]; then
  echo "== Verify (Spark) at $SF -> $OUT"
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_QUERIES="$QLIST" \
    java $OPENS -cp "target/scala-2.13/classes:/opt/spark/jars/*" -Xmx100g \
    graft.Verify "$SF" "$OUT" 2>&1 | tail -5
  rc=${PIPESTATUS[0]}
  if [ $rc -ne 0 ] || [ ! -s "$OUT/oracle_sql.json" ]; then
    echo "Verify FAILED (rc=$rc) — not touching sentinel; rerun to retry"
    exit 1
  fi
  touch "$OUT/.verify_done"
fi

mkdir -p "$JSONDIR"
for q in "${ROWS[@]}"; do
  [ -s "$JSONDIR/$q.json" ] && { echo "skip $q (done)"; continue; }
  if [ ! -d "$OUT/$q" ]; then
    echo "MISSING engine output for $q"
    echo "{\"queries\": {\"$q\": \"missing_engine_output\"}}" > "$JSONDIR/$q.json"
    continue
  fi
  echo "== oracle $q $(date +%H:%M:%S)"
  timeout 2700 python3 scripts/oracle_check.py --setcompare "$SETQ" \
    --json "$JSONDIR/$q.json" "$SF" "$OUT" "$q"
  rc=$?
  if [ $rc -eq 124 ]; then echo "TIMEOUT $q"; echo "{\"queries\": {\"$q\": \"skipped_oracle_timeout\"}}" > "$JSONDIR/$q.json"; fi
done
ROWLIST=$(IFS=,; echo "${ROWS[*]}") python3 - <<'EOF'
import json, glob, os
merged = {}
for f in sorted(glob.glob('/tmp/sweep_sf10_full_json/*.json')):
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
