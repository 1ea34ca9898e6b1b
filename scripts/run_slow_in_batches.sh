#!/usr/bin/env bash
# Run the slow test tier in per-file batches, each bounded to < 10 min
# (VERDICT r2 next-item #9: the driver window is 10 minutes; the full
# slow tier is ~30-40 min of CPU compiles). Exit code is non-zero if any
# batch fails; a summary table prints at the end.
#
# Usage:  bash scripts/run_slow_in_batches.sh [extra pytest args]

set -u
cd "$(dirname "$0")/.."

# Collection must be CHECKED, not just parsed: a broken slow-test file
# errors during collection while the others still list, so grepping the
# output alone would silently drop the broken file and the tier would
# read green. pytest exit codes: 0 = collected, 5 = nothing collected,
# anything else (2 = collection/usage error) is a failure.
COLLECT_OUT=$(python -m pytest tests/ -m slow --collect-only -q 2>&1)
rc=$?
if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then
  echo "ERROR: slow-test collection failed (rc=$rc) — output:" >&2
  printf '%s\n' "$COLLECT_OUT" >&2
  exit 2
fi
FILES=$(printf '%s\n' "$COLLECT_OUT" | grep -o '^tests/[a-z_0-9]*\.py' | sort -u)
if [ -z "$FILES" ]; then
  echo "ERROR: slow-test collection produced no files — collection output:" >&2
  printf '%s\n' "$COLLECT_OUT" >&2
  exit 2
fi

fail=0
summary=""
for f in $FILES; do
  echo "=== slow batch: $f ==="
  start=$(date +%s)
  timeout 600 python -m pytest "$f" -m slow -q "$@"
  rc=$?
  secs=$(( $(date +%s) - start ))
  [ $rc -ne 0 ] && fail=1
  summary+=$(printf '%-38s rc=%d %4ds\n' "$f" "$rc" "$secs")$'\n'
done

echo
echo "=== slow-tier summary ==="
printf '%s' "$summary"

# Perf-regression gate (VERDICT r4 next-item 3): compare the newest
# committed per-round ledger against its predecessor. Regressions beyond
# 3% fail the tier; intentional changes document a --waive in the round
# record and re-run the gate by hand.
LATEST_PERF=$(ls PERF_r*.json 2>/dev/null | sort -V | tail -1)
if [ -n "$LATEST_PERF" ]; then
  echo
  echo "=== perf gate: $LATEST_PERF ==="
  python scripts/perf_gate.py "$LATEST_PERF" || fail=1
fi
exit $fail
