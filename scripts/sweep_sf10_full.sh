#!/bin/bash
# r15 sf10 (100x) FULL oracle sweep (VERDICT r14 Next-round #1): the
# oracled rows not covered by the r14 spot sweep. Together with the
# spot 24 this brings sf10 coverage to 130/133 oracled rows.
#
# Excluded BY DESIGN (documented, pre-seeded as skips, not silent):
#  - q_dedup_containment, q_dedup_ngram_jaccard: declared-quadratic
#    exact-shingle rows; sf10 cost is root-caused (Ω(Σ df²), r13) and
#    runtime-guarded, not unknown.
# q_join_interval_overlap (a skip until r15) is now checked two ways:
# the shipped oracle SQL states the overlap join through the bin
# decomposition (DuckDB hash-joins it instead of timing out on the
# no-equi-key shape), and because the sf10 OUTPUT is 4.15B rows —
# past any materialized compare — the row goes through the
# cross-engine digest (QueryDigest + digest_check.py) after the loop.
#
# Protocol (r15): the Spark Verify runs in the BACKGROUND and the
# DuckDB loop polls each row's _SUCCESS marker, checking rows as
# their engine output lands — the two phases overlap instead of
# serializing. The six corpus-dump projections (>= ~2M rows at sf10)
# are compared order-invariantly (--setcompare, DuckDB EXCEPT ALL)
# and written UNCOALESCED (SPARK_GRAFT_UNCOALESCED) so their terminal
# sort+write parallelizes instead of funneling through coalesce(1)'s
# single task (observed 40+ min for one 42M-row output).
# Rows whose engine output never appears are recorded explicitly as
# missing_engine_output; the merge reports n_skipped / n_missing
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
  q_stream_watermark_late q_gapfill q_json_funcs \
  q_subquery_scalar q_filter_complex q_stream_session q_cdc_scd2 \
  q_map_funcs q_win_distinct_count q_win_lag_lead q_bitwise \
  q_cond_funcs q_date_funcs q_math_funcs q_regex_funcs \
  q_win_range_frame q_win_rank q_win_rank_stats q_win_running \
  q_win_value_funcs q_join_broadcast q_project_expr q_scan_project \
  q_udtf_daterange q_win_pct_rank q_unpivot)
# corpus-sized outputs (>= ~2M rows at sf10, i.e. >= 2000 at the
# driver's sf0.01 correctness record — sf10 is 1000x that): multiset
# compare in DuckDB (EXCEPT ALL both ways, bounded memory/spill) and
# written uncoalesced by Verify. Below the cut, the positional Python
# compare's two row-list copies stay ~<5 GB peak next to the 100g
# Spark JVM; above it they would not.
SETQ="q_bitwise,q_cdc_scd2,q_cond_funcs,q_date_funcs,q_filter_complex,q_gapfill,q_join_broadcast,q_json_funcs,q_map_funcs,q_math_funcs,q_project_expr,q_regex_funcs,q_scan_filter_pushdown,q_scan_project,q_sort_multi,q_str_funcs,q_str_funcs2,q_stream_session,q_stream_stream_join_left,q_stream_tumbling,q_stream_watermark_late,q_subquery_scalar,q_twap,q_udf_scalar,q_udtf_daterange,q_unpivot,q_win_distinct_count,q_win_lag_lead,q_win_pct_rank,q_win_range_frame,q_win_rank,q_win_rank_stats,q_win_running,q_win_sliding_rows,q_win_value_funcs"

. scripts/jdk17_opens.sh   # defines $OPENS (build.sbt jdk17AddOpens twin)

mkdir -p "$JSONDIR"

QLIST=$(IFS=,; echo "${ROWS[*]}")
VPID=""
# Gate on a completion SENTINEL, not the dir (ADVICE r14): a crashed
# or partial Verify run must rerun, not silently feed the oracles.
if [ ! -f "$OUT/.verify_done" ]; then
  echo "== Verify (Spark, background) at $SF -> $OUT"
  ( SPARK_GRAFT_CPUS=32 SPARK_GRAFT_QUERIES="$QLIST" \
      SPARK_GRAFT_UNCOALESCED="$SETQ" \
      java $OPENS -cp "target/scala-2.13/classes:/opt/spark/jars/*" -Xmx100g \
      graft.Verify "$SF" "$OUT" > /tmp/sweep_sf10_verify.log 2>&1 \
    && [ -s "$OUT/oracle_sql.json" ] && touch "$OUT/.verify_done" ) &
  VPID=$!
fi

# Oracle loop: check whichever rows have landed (_SUCCESS present),
# repeat until every row has a JSON record or Verify is gone and no
# output can still appear.
while :; do
  progress=0
  pending=0
  for q in "${ROWS[@]}"; do
    [ -s "$JSONDIR/$q.json" ] && continue
    if [ -f "$OUT/$q/_SUCCESS" ] && [ -s "$OUT/oracle_sql.json" ]; then
      echo "== oracle $q $(date +%H:%M:%S)"
      timeout 2700 python3 scripts/oracle_check.py --setcompare "$SETQ" \
        --json "$JSONDIR/$q.json" "$SF" "$OUT" "$q"
      rc=$?
      if [ $rc -eq 124 ]; then echo "TIMEOUT $q"; echo "{\"queries\": {\"$q\": \"skipped_oracle_timeout\"}}" > "$JSONDIR/$q.json"; fi
      progress=1
    else
      pending=$((pending+1))
    fi
  done
  [ "$pending" -eq 0 ] && break
  if [ -z "$VPID" ] || ! kill -0 "$VPID" 2>/dev/null; then
    # Verify finished (or was never started because the sentinel
    # exists): one final pass happened above; anything still pending
    # has no output coming -> record it explicitly.
    if [ "$progress" -eq 0 ]; then
      for q in "${ROWS[@]}"; do
        [ -s "$JSONDIR/$q.json" ] && continue
        if [ ! -f "$OUT/$q/_SUCCESS" ]; then
          echo "MISSING engine output for $q"
          echo "{\"queries\": {\"$q\": \"missing_engine_output\"}}" > "$JSONDIR/$q.json"
        fi
      done
    fi
  else
    [ "$progress" -eq 0 ] && sleep 30
  fi
done
[ -n "$VPID" ] && wait "$VPID" 2>/dev/null

# q_join_interval_overlap (r15): no longer a skip. Its sf10 output is
# 4.15 BILLION rows — far past the EXCEPT-ALL compare — so it goes
# through the order-invariant cross-engine DIGEST instead
# (graft.tools.QueryDigest + scripts/digest_check.py: count + sum of
# 60-bit md5 row prefixes, computed live in both engines, nothing
# materialized). Runs after Verify so $OUT/oracle_sql.json exists.
if [ ! -s "$JSONDIR/q_join_interval_overlap.json" ]; then
  echo "== digest q_join_interval_overlap $(date +%H:%M:%S)"
  SPARK_GRAFT_CPUS=32 java $OPENS -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    -Xmx80g graft.tools.QueryDigest "$SF" q_join_interval_overlap 2>/dev/null \
    | grep '"query"' > /tmp/iv_digest_sf10.json
  if [ -s /tmp/iv_digest_sf10.json ] && timeout 2700 python3 scripts/digest_check.py \
       "$SF" q_join_interval_overlap /tmp/iv_digest_sf10.json "$OUT/oracle_sql.json"; then
    n=$(python3 -c "import json;print(json.load(open('/tmp/iv_digest_sf10.json'))['rows'])")
    echo "{\"queries\": {\"q_join_interval_overlap\": \"ok_digest:$n\"}}" \
      > "$JSONDIR/q_join_interval_overlap.json"
  else
    echo '{"queries": {"q_join_interval_overlap": "fail_digest"}}' \
      > "$JSONDIR/q_join_interval_overlap.json"
  fi
fi

# Merge reports n_skipped / n_missing alongside n_fail (ADVICE r14): a
# timeout or absent row must not inflate an "N/N green" headline.
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
