#!/usr/bin/env bash
# One-command CI: reproduces the full evidence chain behind the
# verdict, exiting nonzero on ANY stage failure.
#
#   1. full oracle gate      — every oracled query vs DuckDB at sf0.01
#                              (value-hash equality; rows-only entries
#                              checked non-empty)
#   2. plan audit            — registry-wide physical-plan audit; any
#                              unguarded cartesian / corpus-constant
#                              window is a failure
#   3. pytest                — the whole test suite
#   4. bench smoke           — the headline extraction pipeline +
#                              bench queries at sf0.001, scaling off
#                              (the per-round scaling record is a
#                              separate, longer `python bench.py` run)
#
# Usage: tools/ci.sh [--fast]
#   --fast: oracle gate at sf0.001 and pytest -x (first failure stops)
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

FAST=0
[ "${1:-}" = "--fast" ] && FAST=1

if [ "$FAST" = 1 ]; then
  GATE_SF=/root/testdata/sf0.001
  PYTEST_ARGS=(-x -q)
else
  GATE_SF=/root/testdata/sf0.01
  PYTEST_ARGS=(-q)
fi

echo "=== [1/4] oracle gate ($GATE_SF) ==="
python tools/check_queries.py "$GATE_SF" 2>/dev/null | tail -3

echo "=== [2/4] plan audit ==="
python tools/plan_audit.py 2>/dev/null | tail -3

echo "=== [3/4] pytest ==="
python -m pytest tests/ "${PYTEST_ARGS[@]}"

echo "=== [4/4] bench smoke (sf0.001, scaling off) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_SCALING=0 \
  python bench.py 2>/dev/null | tail -1

echo "=== CI green ==="
