#!/usr/bin/env bash
# Scale-ladder bench (sf1 / sf10) with the same rep discipline as
# golden_bench.sh: default REPS=6 -> 5 CLEAN reps after the warmup fold.
# Round-12 advice: the r12 ladders committed 3-clean-rep medians while
# golden committed 5 — cross-round per-query medians were computed from
# different sample sizes. Every ladder blessed through this script is
# 5-clean-rep (override with SPARK_GRAFT_REPS for a deliberate quick
# pass, which then says so in the artifact's "clean_reps" field).
#
# Usage: tools/ladder_bench.sh <round> <sf1|sf10>
#   -> BENCH_<sf>_r<round>.json  (blessed only on a complete sweep)
# Env: SPARK_GRAFT_SKIP / SPARK_GRAFT_ONLY pass through to Bench.
#
# Unlike golden_bench.sh this does NOT hard-fail on a noisy window: a
# full ladder is a multi-hour run and the committed numbers are
# stall-aware medians; noisy queries are listed so the round's analysis
# can re-measure them isolated.
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: tools/ladder_bench.sh <round> <sf1|sf10>}"
SF="${2:?usage: tools/ladder_bench.sh <round> <sf1|sf10>}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/tmp/$SF}"

# stale-artifact guard (same as golden_bench.sh)
rm -f bench_full.json

RC=0
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_REPS="${SPARK_GRAFT_REPS:-6}" \
  tools/run_main.sh graft.Bench > "ladder_${SF}_r${ROUND}.log" 2>&1 || RC=$?
tail -2 "ladder_${SF}_r${ROUND}.log" || true
if [ "$RC" -ne 0 ]; then
  echo "bench failed (rc=$RC) — no artifact written" >&2
  exit "$RC"
fi

python3 - "$ROUND" "$SF" <<'EOF'
import json, shutil, sys
round_n, sf = sys.argv[1], sys.argv[2]
d = json.load(open("bench_full.json"))
n = len(d.get("queries", {}))
if d.get("partial"):
    print(f"PARTIAL run ({n} queries) — no artifact written")
    sys.exit(1)
failed = [k for k, v in d.get("queries", {}).items() if v < 0]
if failed:
    print(f"FAILED queries {failed} — no artifact written")
    sys.exit(1)
noisy = [k for k, xs in d.get("rep_samples", {}).items()
         if xs and max(xs) > 3.0 * min(xs)]
dst = f"BENCH_{sf}_r{round_n}.json"
shutil.copy("bench_full.json", dst)
print(f"wrote {dst}: {n} queries, total {d.get('value')}s, "
      f"clean_reps={d.get('clean_reps')}, noisy(>3x spread): {noisy}")
EOF
