#!/usr/bin/env bash
# Golden-20 quiet-window bench (round-10 verdict #3).
#
# The host shows multi-minute external stall windows, and the full
# interleaved sweep's medians carry a cold-mix floor — both can mask
# real ±0.5 s regressions on the hot queries. This runs ONLY the 20
# most expensive queries (pinned at their round-10 sf1 ranking — the
# list must stay stable across rounds or the deltas stop meaning
# anything) in an otherwise-idle window, then verifies the window was
# actually quiet via rep dispersion before blessing the artifact.
#
# Usage: tools/golden_bench.sh <round>   # e.g. tools/golden_bench.sh 11
#   -> BENCH_golden_r<round>.json  (bless only if the quiet check passes)
# Compare rounds: python3 tools/scale_ratios.py --golden \
#   BENCH_golden_r11.json BENCH_golden_r12.json
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: tools/golden_bench.sh <round>}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/tmp/sf1}"

GOLDEN='^(q_m2_smote|q_fuzzy_join|q_corpus_curation|q_join_idx_rejoin|q_stream_sessionize|q_edit_distance|q_dedup_embedding|q_bfs_reach|q_cv_folds|q_minhash_estimator|q_session_stats|q_pii_scrub|q_bigram_logprob|q_unigram_logprob|q_hll_overlap|q_q16_supplier_count|q_q2_min_cost_supplier|q_tfidf_topterms|q_market_basket|q_pmi_collocations)$'

# Clear any stale artifact first: a crashed run must never silently
# re-bless the previous bench_full.json.
rm -f bench_full.json

# Log to a file instead of piping: `pipe | grep || true` would both
# swallow an sbt failure and clobber PIPESTATUS.
# REPS=6: Bench folds the warmup/profile run into pass 1 (median-
# excluded), so 6 passes yield the same 5 CLEAN reps per query that the
# r11 artifact committed — per-query rep comparisons stay rep-count
# stable across the fold change.
SBT_RC=0
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_ONLY="$GOLDEN" \
  SPARK_GRAFT_REPS="${SPARK_GRAFT_REPS:-6}" \
  sbt -batch "runMain graft.Bench" > golden_bench.log 2>&1 || SBT_RC=$?
grep -E '"metric"|FAILED' golden_bench.log || true
if [ "$SBT_RC" -ne 0 ]; then
  echo "sbt/bench failed (rc=$SBT_RC) — no artifact written" >&2
  exit "$SBT_RC"
fi

# Bless only after the quiet-window + completeness checks pass.
python3 - "$ROUND" <<'EOF'
import json, shutil, sys
round_n = sys.argv[1]
d = json.load(open("bench_full.json"))
n = len(d.get("queries", {}))
if d.get("partial"):
    print(f"PARTIAL run ({n} queries) — no artifact written")
    sys.exit(1)
if n != 20:
    print(f"expected 20 golden queries, got {n} — no artifact written")
    sys.exit(1)
# quiet-window check: a stall window shows as reps spread >3x of the
# best rep on several queries at once; one noisy query can be engine
# variance, three or more is the host
noisy = [k for k, xs in d.get("rep_samples", {}).items()
         if xs and max(xs) > 3.0 * min(xs)]
if len(noisy) >= 3:
    print(f"WINDOW NOT QUIET (noisy: {noisy}) — rerun; no artifact written")
    sys.exit(1)
dst = f"BENCH_golden_r{round_n}.json"
shutil.copy("bench_full.json", dst)
print(f"wrote {dst}: {n} queries, total {d.get('value')}s, "
      f"noisy(>3x spread): {noisy}")
EOF
