#!/bin/bash
# Round-5 TPU queue E — causal batch-4 fit via leaner remat policies.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== [E1] causal batch-4, encoder policy conv2 (frees 2x576MB conv1 saves) ==="
CIPS_CAUSAL_POLICY=enc:conv2 timeout 1800 python scripts/probe_causal_oom.py 4

echo "=== [E2] causal bench, encoder conv2 ==="
CIPS_CAUSAL_POLICY=enc:conv2 CIPS_BENCH_ONLY=causal timeout 1800 python scripts/bench_all.py

echo "=== [E3] causal bench, enc conv2 + decoders conv12 ==="
CIPS_CAUSAL_POLICY=enc:conv2,t1:conv12,pet:conv12 CIPS_BENCH_ONLY=causal timeout 1800 python scripts/bench_all.py

echo "=== queue E done ==="
