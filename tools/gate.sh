#!/usr/bin/env bash
# Round-end local gate — run BEFORE declaring a round done (the round-4
# regression shipped because the full gate wasn't re-run after a late
# change; this script makes the checklist executable):
#
#   1. full pytest suite
#   2. every (Spark query, DuckDB oracle) pair at all three driver SFs
#   3. the bench harness (the driver records its JSON line per round)
#
# Usage: tools/gate.sh [--quick]   (--quick skips the sf0.1 oracle sweep,
# the slowest step, for mid-round iteration; the round-end run must be full)
set -euo pipefail
cd "$(dirname "$0")/.."

quick=${1:-}

echo "=== gate: pytest ==="
python -m pytest tests/ -x -q

echo "=== gate: oracles sf0.001 ==="
python tools/check_oracles.py /root/testdata/sf0.001
echo "=== gate: oracles sf0.01 ==="
python tools/check_oracles.py /root/testdata/sf0.01
if [[ "$quick" != "--quick" ]]; then
  echo "=== gate: oracles sf0.1 ==="
  python tools/check_oracles.py /root/testdata/sf0.1
fi

echo "=== gate: bench ==="
python bench.py

echo "=== gate: ALL GREEN ==="
