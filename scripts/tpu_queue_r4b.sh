#!/bin/bash
# Round-4 session-2 TPU measurement queue. Appends to $LOG with === markers.
# Items ordered by information value: the s2d-conv fit test first (it decides
# whether the L0+L1@16 config exists at all), then the GN vreduce A/B on the
# halo path, then causal/BMGAN d_remat probes, then the never-run probes.
set -u
LOG=${LOG:-/tmp/tpu_queue_r4b.log}
cd /root/repo
Q() { echo "=== $(date +%H:%M:%S) $*" >> "$LOG"; }

FLAG='
import sys, numpy as np; sys.path.insert(0, "scripts")
import bench_all
print("flagship:", bench_all.bench_flagship(np.random.default_rng(0)), flush=True)
'

Q "1. flagship L0+L1@16 + d_remat + S2D_IMPL=conv (fit test; was OOM by 183MB)"
CIPS_S2D_FACTORS=222,221 CIPS_D_REMAT=1 CIPS_S2D_IMPL=conv \
  timeout 5400 python -c "$FLAG" >> "$LOG" 2>&1

Q "2. flagship halo@16 NO_VREDUCE (dense showed vreduce costs ~5%)"
CIPS_GN_NO_VREDUCE=1 timeout 5400 python -c "$FLAG" >> "$LOG" 2>&1

Q "3. flagship L0+L1@8 NO_VREDUCE (control 13.33 with vreduce)"
CIPS_S2D_FACTORS=222,221 CIPS_GN_NO_VREDUCE=1 CIPS_BENCH_FLAGSHIP_BATCH=8 \
  timeout 5400 python -c "$FLAG" >> "$LOG" 2>&1

Q "4. causal bench + d_remat (batch 4 fit attempt, else 2)"
CIPS_D_REMAT=1 timeout 5400 python -c '
import sys, numpy as np; sys.path.insert(0, "scripts")
import bench_all
print("causal d_remat:", bench_all.bench_causal(np.random.default_rng(0)), flush=True)
' >> "$LOG" 2>&1

Q "5. BMGAN batch 1/2 probe + d_remat"
CIPS_D_REMAT=1 timeout 5400 python scripts/probe_bmgan_batch.py 1 2 >> "$LOG" 2>&1

Q "6. classifier batch probe (amortisation optimum)"
timeout 5400 python scripts/probe_classifier_batch.py 4 8 16 32 >> "$LOG" 2>&1

Q "7. stale-vs-exact D-fake dynamics"
timeout 7200 python scripts/probe_exact_dfake.py >> "$LOG" 2>&1

Q "QUEUE_R4B_DONE"
