#!/bin/bash
# Round-5 TPU measurement queue A — run sequentially (single-core host).
# Usage: bash scripts/tpu_queue_r5a.sh 2>&1 | tee /tmp/queue_r5a.log
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== [1] BMGAN encoder packed-front depth A/B (VERDICT r4 #3) ==="
CIPS_BENCH_ONLY=bmgan timeout 1200 python scripts/bench_all.py
CIPS_BENCH_ONLY=bmgan CIPS_BMGAN_ENC_PACK=2 timeout 1200 python scripts/bench_all.py

echo "=== [2] classifier reference-batch line (VERDICT r4 #8) ==="
CIPS_BENCH_ONLY=classifier CIPS_BENCH_CLS_BATCH=4 timeout 1200 python scripts/bench_all.py

echo "=== [3] causal batch-4 attempt + step time ==="
CIPS_BENCH_ONLY=causal timeout 1800 python scripts/bench_all.py

echo "=== [4] flagship trace at bench config (batch 16, conv12) ==="
timeout 1800 python scripts/profile_trace_step.py 16 conv12

echo "=== [5] flagship L2 (2,1,1) packing A/B at batch 16 ==="
CIPS_BENCH_ONLY=flagship CIPS_S2D_FACTORS=222,221,211 timeout 1800 python scripts/bench_all.py

echo "=== [6] flagship batch 24 with d_remat (post fold-tile HBM re-audit) ==="
CIPS_BENCH_ONLY=flagship CIPS_BENCH_FLAGSHIP_BATCH=24 CIPS_D_REMAT=1 timeout 1800 python scripts/bench_all.py || true

echo "=== [7] LPIPS attribution (BMGAN +P8 was ~82 ms) ==="
timeout 1200 python scripts/probe_lpips_trace.py 1

echo "=== [8] causal per-component re-trace (backward ratio, VERDICT r4 #2b) ==="
timeout 1800 python scripts/probe_causal_parts.py

echo "=== queue A done ==="
