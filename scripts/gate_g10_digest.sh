#!/bin/bash
# r17 per-round g10 digest regression gate (VERDICT r16 Next-round
# #6): every full-decade sweep so far caught a real cross-engine drift
# class (sf1: decimal overflow; sf10: ROUND at the double edge), and
# at g10 (factor-100 grow corpus) the digest machinery is cheap — no
# multi-hundred-second DuckDB rows — so this runs EVERY round at
# round-close, not only in decade-probe rounds. One row per operator
# family, the same core list the sf100 sweep uses.
#
# Usage: scripts/gate_g10_digest.sh [outJson] [sfDir] [oracleSqlJson]
#   Regenerate inputs when /tmp was cleaned:
#     corpus: graft.tools.GenScale /root/testdata/sf0.1 /tmp/graft_g10 \
#               100 grow   (all tables; ~2 GB, a few minutes)
#     sql:    graft.Verify /root/testdata/sf0.001 /tmp/verify_sf001
set -u
cd "$(dirname "$0")/.."
OUT=${1:-g10_oracle.json}
SF=${2:-/tmp/graft_g10}
SQLJSON=${3:-/tmp/verify_r17_sf001/oracle_sql.json}
QS=${GRAFT_DIGEST_QS:-"q_agg_group_sum q_win_topk_per_group \
q_join_inner_hash q_join_asof_binned q_dedup_exact_docs \
q_dedup_minhash_df q_dedup_contain_minhash q_dedup_clusters \
q_text_langid q_text_tfidf q_funnel q_cdc_latest_by_key q_cdc_scd2 \
q_sessionize_gap q_string_agg q_topk_global q_graph_pagerank"}
# q_graph_pagerank added r18: its g100 digest is cost-excluded (the
# ~1.5-2B-edge graph out-shuffles this box's free disk, and the DuckDB
# oracle needed 78 GB temp at a TENTH of that) — so the 100x gate is
# the row's standing multi-decade evidence.
GRAFT_DIGEST_QS="$QS" GRAFT_DIGEST_XMX=${GRAFT_DIGEST_XMX:-48g} \
  exec scripts/sweep_sf100_digest.sh "$SF" "$OUT" "$SQLJSON"
