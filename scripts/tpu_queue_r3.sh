#!/bin/bash
# Round-3 pending-measurement queue. Waits for scripts/tpu_watch.sh to log
# "TPU UP", then runs the queued probes/benches in priority order, logging
# everything to /tmp/tpu_queue.log. Generous per-step timeouts (kills only
# multi-hour hangs — never a live compile; a SIGTERM mid-remote-compile has
# wedged the TPU backend for hours, BENCH_NOTES session-3 log).
set -u
cd /root/repo
LOG=/tmp/tpu_queue.log
Q() { echo "=== [$(date -u +%H:%M:%S)] $*" >> "$LOG"; }

Q "waiting for TPU UP (/tmp/tpu_watch.log or /tmp/tpu_up)"
while ! grep -q "TPU UP" /tmp/tpu_watch.log 2>/dev/null && [ ! -f /tmp/tpu_up ]; do sleep 30; done
Q "TPU is up — starting queue"

Q "1. halo vs dense packed-conv micro (probe_phase_conv)"
timeout 3600 python scripts/probe_phase_conv.py >> "$LOG" 2>&1

Q "2. GN variadic-reduce probe"
timeout 3600 python scripts/probe_gn_vreduce.py >> "$LOG" 2>&1

Q "3a. flagship bench batch 16 DENSE (control, cache-warm)"
timeout 5400 python -c "
import sys, numpy as np; sys.path.insert(0,'scripts')
import bench_all
print('flagship dense:', bench_all.bench_flagship(np.random.default_rng(0)))
" >> "$LOG" 2>&1

Q "3b. flagship bench batch 16 HALO"
CIPS_PACKED_CONV=halo timeout 5400 python -c "
import sys, numpy as np; sys.path.insert(0,'scripts')
import bench_all
print('flagship halo:', bench_all.bench_flagship(np.random.default_rng(0)))
" >> "$LOG" 2>&1

Q "3c. flagship HALO + level-1 (2,2,1) packing (halo makes L1 1.78x-MAC at full lanes)"
CIPS_PACKED_CONV=halo CIPS_S2D_FACTORS=222,221 timeout 5400 python -c "
import sys, numpy as np; sys.path.insert(0,'scripts')
import bench_all
print('flagship halo L0+L1:', bench_all.bench_flagship(np.random.default_rng(0)))
" >> "$LOG" 2>&1

Q "4. causal bench (batch 4 then 2) HALO (finest levels)"
CIPS_PACKED_CONV=halo timeout 5400 python -c "
import sys, numpy as np; sys.path.insert(0,'scripts')
import bench_all
print('causal halo/finest:', bench_all.bench_causal(np.random.default_rng(0)))
" >> "$LOG" 2>&1

Q "5. causal bench HALO + s2d_levels=all"
CIPS_PACKED_CONV=halo CIPS_S2D_LEVELS=all timeout 5400 python -c "
import sys, numpy as np; sys.path.insert(0,'scripts')
import bench_all
print('causal halo/all:', bench_all.bench_causal(np.random.default_rng(0)))
" >> "$LOG" 2>&1

Q "6. BMGAN batch probe HALO (batch 1 and 2)"
CIPS_PACKED_CONV=halo timeout 5400 python scripts/probe_bmgan_batch.py 1 2 >> "$LOG" 2>&1

Q "7. classifier batch probe (amortisation optimum like the flagship)"
timeout 5400 python scripts/probe_classifier_batch.py 4 8 16 >> "$LOG" 2>&1

Q "8. stale-vs-exact D-fake dynamics (VERDICT item 6), half volume"
timeout 7200 python scripts/probe_exact_dfake.py >> "$LOG" 2>&1

Q "9. scoped-vmem sweep on the flagship step"
timeout 7200 python scripts/sweep_xla_flags.py 16 conv12 >> "$LOG" 2>&1

Q "queue done"
