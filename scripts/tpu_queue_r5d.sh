#!/bin/bash
# Round-5 TPU queue D — post-compact-pool causal follow-ups.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== [D1] causal batch-4 fit re-check (compact repack_pool) ==="
timeout 1800 python scripts/probe_causal_oom.py 4

echo "=== [D2] causal bench (batch 4 first) ==="
CIPS_BENCH_ONLY=causal timeout 1800 python scripts/bench_all.py

echo "=== [D3] causal encoder grad per-op trace ==="
timeout 1800 python scripts/profile_trace_causal.py enc

echo "=== [D4] causal t1-decoder grad per-op trace ==="
timeout 1800 python scripts/profile_trace_causal.py t1

echo "=== queue D done ==="
