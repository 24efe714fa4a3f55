"""Benchmark: training throughput of all four workloads (volumes/sec/chip).

Runs the full jitted train step of every reference workload at the
(96, 128, 96) working volume with its reference config on the attached
TPU chip, printing ONE JSON line per workload. The flagship T1->PET
synthesis line prints LAST so a tail parser keeps it as the headline
metric (BENCH_r02.json's recorded parse reads the final line); the other
three lines make round-over-round regressions anywhere in the zoo visible
in BENCH_r*.json. scripts/bench_all.py holds the per-workload bench
bodies and writes BENCH_WORKLOADS.json.

vs_baseline anchors (volumes/sec/GPU, analytic — the reference publishes
no numbers, BASELINE.md): flagship 2.0 (batch 2/GPU fp32 + synchronous
per-step NIfTI decode, unet/scripts/train_unet.py:121-193), BMGAN 1.0,
causal 0.8, classifier 4.0. vs_baseline = ours / anchor.
"""

from __future__ import annotations

import gc
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))

import jax

import numpy as np


def main():
    import bench_all

    rng = np.random.default_rng(0)
    rows = []
    # flagship LAST: the driver parses the final JSON line as the headline
    for fn in (
        bench_all.bench_bmgan,
        bench_all.bench_causal,
        bench_all.bench_classifier,
        bench_all.bench_flagship,
    ):
        try:
            metric, vps, anchor = fn(rng)
        except Exception as e:  # noqa: BLE001 — one workload must not kill the rest
            print(f"bench {fn.__name__} FAILED: {type(e).__name__}: {e}"[:400], file=sys.stderr, flush=True)
            gc.collect()
            continue
        gc.collect()  # free the workload's device buffers before the next one
        per_chip = vps / jax.device_count()
        row = {
            "metric": metric,
            "value": round(per_chip, 3),
            "unit": "volumes/sec/chip",
            "vs_baseline": round(per_chip / anchor, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_WORKLOADS.json")
    with open(out, "w", encoding="utf-8") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
