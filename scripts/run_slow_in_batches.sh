#!/usr/bin/env bash
# Run the slow test tier in per-file batches, each bounded to < 10 min
# (VERDICT r2 next-item #9: the driver window is 10 minutes; the full
# slow tier is ~30-40 min of CPU compiles). Exit code is non-zero if any
# batch fails; a summary table prints at the end.
#
# Usage:  bash scripts/run_slow_in_batches.sh [extra pytest args]

set -u
cd "$(dirname "$0")/.."

FILES=$(python -m pytest tests/ -m slow --collect-only -q 2>/dev/null \
        | grep -o '^tests/[a-z_0-9]*\.py' | sort -u)
if [ -z "$FILES" ]; then
  # Collection failure (import/syntax error) must not read as a green tier.
  echo "ERROR: slow-test collection produced no files — collection output:" >&2
  python -m pytest tests/ -m slow --collect-only -q >&2
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
exit $fail
