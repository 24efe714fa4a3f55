#!/bin/bash
# Round-5 TPU queue G — batch-point sweeps + default confirmations.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== [G1] classifier batch 64 ==="
CIPS_BENCH_ONLY=classifier CIPS_BENCH_CLS_BATCH=64 timeout 1800 python scripts/bench_all.py || true

echo "=== [G2] flagship batch 20 (conv12, d_remat) ==="
CIPS_BENCH_ONLY=flagship CIPS_BENCH_FLAGSHIP_BATCH=20 CIPS_D_REMAT=1 timeout 1800 python scripts/bench_all.py || true

echo "=== [G3] flagship batch 16 L2 packing, repeat for noise ==="
CIPS_BENCH_ONLY=flagship CIPS_S2D_FACTORS=222,221,211 timeout 1800 python scripts/bench_all.py
CIPS_BENCH_ONLY=flagship timeout 1800 python scripts/bench_all.py

echo "=== [G4] BMGAN at HEAD (enc depth-2 default) ==="
CIPS_BENCH_ONLY=bmgan timeout 1500 python scripts/bench_all.py

echo "=== queue G done ==="
