#!/bin/bash
# Round-5 TPU queue B — follow-ups shaped by queue A's results.
# Usage: bash scripts/tpu_queue_r5b.sh 2>&1 | tee /tmp/queue_r5b.log
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== [1] causal batch-4 OOM allocation audit (VERDICT r4 #2a) ==="
timeout 1800 python scripts/probe_causal_oom.py 4

echo "=== [2] causal batch-4 with d_remat ==="
CIPS_D_REMAT=1 timeout 1800 python scripts/probe_causal_oom.py 4

echo "=== queue B done ==="
