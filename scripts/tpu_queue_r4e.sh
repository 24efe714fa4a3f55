#!/bin/bash
# Round-4 queue E: BMGAN subpixel-tconv A/B + headline re-bench. Waits for D.
set -u
LOG=${LOG:-/tmp/tpu_queue_r4e.log}
cd /root/repo
Q() { echo "=== $(date +%H:%M:%S) $*" >> "$LOG"; }
while ! grep -q QUEUE_R4D_DONE /tmp/tpu_queue_r4d.log 2>/dev/null; do sleep 60; done

Q "1. BMGAN bench (subpixel tconv landed; pre-tconv control 2.978)"
timeout 3600 python -c '
import sys, numpy as np; sys.path.insert(0, "scripts")
import bench_all
print("bmgan tconv:", bench_all.bench_bmgan(np.random.default_rng(0)), flush=True)
' >> "$LOG" 2>&1

Q "2. BMGAN parts (G grad was 235.7ms; how much did tconv recover?)"
timeout 3600 python scripts/probe_bmgan_parts.py >> "$LOG" 2>&1

Q "3. full bench_all (headline set, all defaults)"
timeout 7200 python bench.py >> "$LOG" 2>&1

Q "QUEUE_R4E_DONE"
