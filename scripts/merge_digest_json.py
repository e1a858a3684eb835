#!/usr/bin/env python3
"""Merge a digest-sweep output (flat {query: record} JSON from
sweep_sf100_digest.sh) into the cumulative sf100_oracle.json wrapper
({..., n_checked, n_ok, n_fail, queries: {...}}) — the sweep writes
only the queries it ran, so widening coverage must MERGE, not
overwrite (r18). New rows win on key collision; counts recomputed.

Usage: merge_digest_json.py <cumulative.json> <new_flat.json> [note]
"""
import json
import sys

cum_path, new_path = sys.argv[1], sys.argv[2]
note = sys.argv[3] if len(sys.argv) > 3 else None
with open(cum_path) as f:
    cum = json.load(f)
with open(new_path) as f:
    new = json.load(f)
qs = cum.setdefault("queries", {})
qs.update(new)
ok = sum(1 for v in qs.values() if isinstance(v, dict) and v.get("match") is True)
skipped = sum(1 for v in qs.values() if isinstance(v, dict)
              and str(v.get("status", "")).startswith("skip"))
fail = len(qs) - ok - skipped
cum["n_checked"] = len(qs)
cum["n_ok"] = ok
cum["n_fail"] = fail
cum["n_skipped"] = skipped
if note:
    cum["r18_note"] = note
with open(cum_path, "w") as f:
    json.dump(cum, f, indent=1)
print(f"merged {len(new)} rows -> {cum_path}: checked={len(qs)} ok={ok} fail={fail} skipped={skipped}")
if fail:
    for k, v in qs.items():
        if isinstance(v, dict) and v.get("match") is not True \
                and not str(v.get("status", "")).startswith("skip"):
            print("FAIL", k, json.dumps(v)[:200])
