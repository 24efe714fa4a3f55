#!/bin/bash
# Round-5 TPU queue C — remaining unmeasured items from queues A/B
# (fresh VM lost /tmp logs; session-1 recorded only classifier@4, causal
# fallback, flagship-trace split_d note).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "=== [B1] causal batch-4 OOM allocation audit ==="
timeout 1800 python scripts/probe_causal_oom.py 4

echo "=== [A8] causal per-component re-trace ==="
timeout 1800 python scripts/probe_causal_parts.py

echo "=== [A1] BMGAN encoder packed-front depth A/B ==="
CIPS_BENCH_ONLY=bmgan timeout 1500 python scripts/bench_all.py
CIPS_BENCH_ONLY=bmgan CIPS_BMGAN_ENC_PACK=2 timeout 1500 python scripts/bench_all.py
CIPS_BENCH_ONLY=bmgan CIPS_BMGAN_ENC_PACK=0 timeout 1500 python scripts/bench_all.py

echo "=== [A5] flagship L2 (2,1,1) packing A/B at batch 16 ==="
CIPS_BENCH_ONLY=flagship timeout 1800 python scripts/bench_all.py
CIPS_BENCH_ONLY=flagship CIPS_S2D_FACTORS=222,221,211 timeout 1800 python scripts/bench_all.py

echo "=== [A6] flagship batch 24 with d_remat ==="
CIPS_BENCH_ONLY=flagship CIPS_BENCH_FLAGSHIP_BATCH=24 CIPS_D_REMAT=1 timeout 1800 python scripts/bench_all.py || true

echo "=== [A7] LPIPS attribution ==="
timeout 1200 python scripts/probe_lpips_trace.py 1

echo "=== queue C done ==="
