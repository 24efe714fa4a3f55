#!/bin/bash
# Round-4 session-3 TPU queue (resumes r4b after the session died mid-item-3).
# Facts so far (BENCH_NOTES round-4): halo@16 vreduce=ON 12.59, OFF 13.27;
# dense ON 9.88, OFF 10.43 -> vreduce costs ~5% everywhere. L0+L1@16 OOM by
# 220 MB plain, by 1.90 GB with d_remat+s2d_conv (the combo HURTS; isolate).
set -u
LOG=${LOG:-/tmp/tpu_queue_r4c.log}
cd /root/repo
Q() { echo "=== $(date +%H:%M:%S) $*" >> "$LOG"; }

FLAG='
import sys, numpy as np; sys.path.insert(0, "scripts")
import bench_all
print("flagship:", bench_all.bench_flagship(np.random.default_rng(0)), flush=True)
'

Q "3. flagship L0+L1@8 NO_VREDUCE (control 13.33 with vreduce)"
CIPS_S2D_FACTORS=222,221 CIPS_GN_NO_VREDUCE=1 CIPS_BENCH_FLAGSHIP_BATCH=8 \
  timeout 3600 python -c "$FLAG" >> "$LOG" 2>&1

Q "3b. flagship L0+L1@16 + d_remat ONLY (plain was OOM by 220MB; d_remat saves ~1.1GB D acts)"
CIPS_S2D_FACTORS=222,221 CIPS_GN_NO_VREDUCE=1 CIPS_D_REMAT=1 \
  timeout 3600 python -c "$FLAG" >> "$LOG" 2>&1

Q "3c. flagship L0+L1@12 NO_VREDUCE (middle amortisation point)"
CIPS_S2D_FACTORS=222,221 CIPS_GN_NO_VREDUCE=1 CIPS_BENCH_FLAGSHIP_BATCH=12 \
  timeout 3600 python -c "$FLAG" >> "$LOG" 2>&1

Q "4. causal bench + d_remat (batch 4 fit attempt, else 2)"
CIPS_D_REMAT=1 CIPS_GN_NO_VREDUCE=1 timeout 5400 python -c '
import sys, numpy as np; sys.path.insert(0, "scripts")
import bench_all
print("causal d_remat:", bench_all.bench_causal(np.random.default_rng(0)), flush=True)
' >> "$LOG" 2>&1

Q "4b. causal NO_VREDUCE control (no d_remat)"
CIPS_GN_NO_VREDUCE=1 timeout 5400 python -c '
import sys, numpy as np; sys.path.insert(0, "scripts")
import bench_all
print("causal novr:", bench_all.bench_causal(np.random.default_rng(0)), flush=True)
' >> "$LOG" 2>&1

Q "5. BMGAN batch 1/2 probe + d_remat + NO_VREDUCE"
CIPS_D_REMAT=1 CIPS_GN_NO_VREDUCE=1 timeout 5400 python scripts/probe_bmgan_batch.py 1 2 >> "$LOG" 2>&1

Q "6. classifier batch probe (amortisation optimum)"
CIPS_GN_NO_VREDUCE=1 timeout 5400 python scripts/probe_classifier_batch.py 4 8 16 32 >> "$LOG" 2>&1

Q "7. stale-vs-exact D-fake dynamics"
timeout 7200 python scripts/probe_exact_dfake.py >> "$LOG" 2>&1

Q "QUEUE_R4C_DONE"
