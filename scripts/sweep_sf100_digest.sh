#!/bin/bash
# r16 third-decade correctness spot-sweep (VERDICT r15 Next-round #2):
# digest-compare ~10 representative rows — one per operator family —
# at the 1000x dataset. Nothing is materialized on either side: the
# engine (graft.tools.QueryDigest, fresh JVM per query) and DuckDB
# (scripts/digest_check.py) each stream the live result into
# (count, sum of 60-bit md5 row prefixes); equal multisets give equal
# digests (collision ~n^2/2^60).
#
# The sf1 and sf10 sweeps each caught a REAL scale-triggered drift
# class (decimal overflow; ROUND at the double-precision edge) — the
# third decade deserves the same exposure.
#
# Usage: scripts/sweep_sf100_digest.sh [sfDir] [outJson] [oracleSqlJson]
#   GRAFT_DIGEST_QS overrides the query list; GRAFT_DIGEST_XMX the
#   engine heap; GRAFT_ORACLE_TIMEOUT the per-query DuckDB time box
#   (seconds — the minhash CTE may exceed what this box's disk can
#   spill; a timeout is recorded as "skip", not a fail).
set -u
SF=${1:-/tmp/graft_g100}
OUT=${2:-sf100_oracle.json}
SQLJSON=${3:-/tmp/verify_r16b_sf001/oracle_sql.json}
. "$(dirname "$0")/jdk17_opens.sh"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
XMX=${GRAFT_DIGEST_XMX:-64g}
TB=${GRAFT_ORACLE_TIMEOUT:-3600}
# one row per family: agg, window, equi-join, as-of, dedup-exact,
# dedup-banded, text, event analytics, CDC, top-k (ORDER BY+LIMIT —
# exercises the digest tool's LIMIT-preserving path at scale)
QUERIES=(q_agg_group_sum q_win_topk_per_group q_join_inner_hash \
  q_join_asof_binned q_dedup_exact_docs q_dedup_minhash_df \
  q_text_langid q_funnel q_cdc_latest_by_key q_topk_global)
[ -n "${GRAFT_DIGEST_QS:-}" ] && read -ra QUERIES <<< "$GRAFT_DIGEST_QS"
WORK=$(mktemp -d /tmp/sf100_digest.XXXX)
echo "{" > "$OUT.tmp"
first=1
for Q in "${QUERIES[@]}"; do
  echo "== $Q $(date +%H:%M:%S)"
  ENG="$WORK/${Q}.engine.json"
  java $OPENS -cp "$CP" -Xmx$XMX graft.tools.QueryDigest "$SF" "$Q" \
    2> "$WORK/${Q}.engine.log" | tail -1 > "$ENG"
  if [ ! -s "$ENG" ]; then
    REC="{\"status\": \"engine_error\"}"
  else
    LINE=$(timeout "$TB" python3 scripts/digest_check.py "$SF" "$Q" "$ENG" "$SQLJSON" 2> "$WORK/${Q}.oracle.log")
    RC=$?
    if [ $RC -eq 124 ]; then
      REC="{\"status\": \"skip_oracle_timeout\", \"engine\": $(cat "$ENG")}"
    elif [ -z "$LINE" ]; then
      REC="{\"status\": \"oracle_error\", \"engine\": $(cat "$ENG")}"
    else
      REC="$LINE"
    fi
  fi
  [ $first -eq 0 ] && echo "," >> "$OUT.tmp"
  first=0
  printf '"%s": %s' "$Q" "$REC" >> "$OUT.tmp"
  echo "   -> $REC"
done
echo "" >> "$OUT.tmp"; echo "}" >> "$OUT.tmp"
python3 -m json.tool "$OUT.tmp" > /dev/null && mv "$OUT.tmp" "$OUT"
echo "wrote $OUT"
