#!/bin/bash
# Round-5 TPU queue F — step-trace attribution across the zoo.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== [F1] flagship step trace (batch 16, conv12, split_d) ==="
timeout 1800 python scripts/profile_trace_step.py 16 conv12

echo "=== [F2] BMGAN G-grad per-op trace ==="
timeout 1800 python scripts/profile_trace_bmgan.py

echo "=== [F3] BMGAN full-step trace ==="
timeout 1800 python scripts/profile_trace_bmgan.py step

echo "=== queue F done ==="
