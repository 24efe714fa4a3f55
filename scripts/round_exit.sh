#!/bin/bash
# Round-exit ritual (VERDICT round 4, #1/#6): nothing ships unverified.
#   1. full CPU test suite green (includes the full-model equivalence gate);
#   2. learning-curve harness run against the committed REF (fails >25% drift);
#   3. full workload bench refreshed (BENCH_WORKLOADS.json).
# Run serially — the box is single-core; expect ~1-2 h total.
#   bash scripts/round_exit.sh 2>&1 | tee /tmp/round_exit.log
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
rc=0

echo "=== [1/3] full test suite ==="
python -m pytest tests/ -x -q || rc=1

echo "=== [2/3] learning curves vs committed REF ==="
python scripts/learning_curves.py || rc=1

echo "=== [3/3] workload bench ==="
timeout 2400 python scripts/bench_all.py || rc=1

if [ "$rc" -eq 0 ]; then
  echo "ROUND EXIT: all green — commit LEARNING_CURVES.json + BENCH_WORKLOADS.json alongside the snapshot"
else
  echo "ROUND EXIT: FAILURES above — do not snapshot a red gate (VERDICT r4 #1)"
fi
exit "$rc"
