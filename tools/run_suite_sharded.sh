#!/usr/bin/env bash
# Run the test suite one module per pytest process.
#
# Fallback for hosts where a single long pytest process dies inside XLA:CPU
# compilation (observed on a live-migrated VM: LLVM segfaults after many
# hundreds of compiles in one process, while every module passes in a fresh
# process — see CLAUDE.md). Process isolation trades startup overhead for
# immunity to that corruption.
#
# Usage: tools/run_suite_sharded.sh [--quick|--core] [extra pytest args...]
#   --quick  run only the quick smoke tier (tests/conftest.py QUICK_MODULES)
#   --core   run only the core verification tier (conftest.py CORE_MODULES)
set -u
cd "$(dirname "$0")/.."
modules=(tests/test_*.py)
if [ "${1:-}" = "--quick" ] || [ "${1:-}" = "--core" ]; then
  tier="${1#--}"
  shift
  mapfile -t modules < <(TIER="$tier" python - <<'EOF'
import sys; sys.path.insert(0, "tests")
# conftest imports jax; keep that off the TPU tunnel for this listing
import os; os.environ["JAX_PLATFORMS"] = "cpu"
import conftest
names = (conftest.QUICK_MODULES if os.environ["TIER"] == "quick"
         else conftest.CORE_MODULES)
for m in sorted(names):
    import os.path
    p = f"tests/{m}.py"
    if os.path.exists(p):
        print(p)
EOF
)
fi
fail=0
failed_modules=()
for f in "${modules[@]}"; do
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
