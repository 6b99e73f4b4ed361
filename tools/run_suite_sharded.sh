#!/usr/bin/env bash
# Run the test suite one module per pytest process.
#
# Fallback for hosts where a single long pytest process dies inside XLA:CPU
# compilation (observed on a live-migrated VM: LLVM segfaults after many
# hundreds of compiles in one process, while every module passes in a fresh
# process — see CLAUDE.md). Process isolation trades startup overhead for
# immunity to that corruption.
#
# Usage: tools/run_suite_sharded.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
fail=0
failed_modules=()
for f in tests/test_*.py; do
  echo "=== $f ==="
  if ! timeout 1800 python -m pytest "$f" -q "$@"; then
    fail=1
    failed_modules+=("$f")
  fi
done
echo
if [ "$fail" -eq 0 ]; then
  echo "ALL MODULES PASSED"
else
  echo "FAILED MODULES: ${failed_modules[*]}"
fi
exit "$fail"
