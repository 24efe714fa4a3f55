#!/bin/bash
# Round-4 session-3 queue D: measure the generalised fold-tile (commit
# 8e96aaa) and trace the BMGAN/causal backwards. Waits for queue C first.
set -u
LOG=${LOG:-/tmp/tpu_queue_r4d.log}
cd /root/repo
Q() { echo "=== $(date +%H:%M:%S) $*" >> "$LOG"; }

while ! grep -q QUEUE_R4C_DONE /tmp/tpu_queue_r4c.log 2>/dev/null; do sleep 60; done

FLAG='
import sys, numpy as np; sys.path.insert(0, "scripts")
import bench_all
print("flagship:", bench_all.bench_flagship(np.random.default_rng(0)), flush=True)
'

Q "1. flagship L0+L1@8 FOLD (pre-fold control 13.99)"
CIPS_S2D_FACTORS=222,221 CIPS_BENCH_FLAGSHIP_BATCH=8 \
  timeout 3600 python -c "$FLAG" >> "$LOG" 2>&1

Q "2. flagship L0+L1@16 FOLD (pre-fold OOM by 220MB; fold drops 2x1.12GB saves)"
CIPS_S2D_FACTORS=222,221 \
  timeout 3600 python -c "$FLAG" >> "$LOG" 2>&1

Q "3. causal bench FOLD (pre-fold control 2.397)"
timeout 5400 python -c '
import sys, numpy as np; sys.path.insert(0, "scripts")
import bench_all
print("causal fold:", bench_all.bench_causal(np.random.default_rng(0)), flush=True)
' >> "$LOG" 2>&1

Q "4. BMGAN G-grad trace (G grad 235.7ms vs fwd 54.7 — find the backward hotspots)"
timeout 3600 python scripts/profile_trace_bmgan.py >> "$LOG" 2>&1

Q "5. causal step trace (fresh, post-fold)"
timeout 3600 python scripts/profile_trace_causal.py >> "$LOG" 2>&1

Q "6. classifier batch 64 (32 gave 57.7, still rising)"
timeout 3600 python scripts/probe_classifier_batch.py 64 >> "$LOG" 2>&1

Q "QUEUE_R4D_DONE"
