"""Capture a jax.profiler trace of the flagship train step and summarise
the top XLA ops by self-time from the trace protobuf.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import FLAGSHIP_CFG, N_COVARIATES, TRAIN_CFG
from cips_tpu.training.unet_synthesis import build_models, init_state, make_train_step

TRACE_DIR = "/tmp/trace_step"


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    policy = sys.argv[2] if len(sys.argv) > 2 else "conv"
    shape = (batch, 96, 128, 96, 1)
    g, d, p = build_models(
        FLAGSHIP_CFG, n_covariates=N_COVARIATES, dtype=jnp.bfloat16,
        remat_policy=None if policy == "none" else policy,
    )
    state = init_state(
        jax.random.key(0), g, d, p, TRAIN_CFG, batch_shape=(1,) + shape[1:], n_covariates=N_COVARIATES
    )
    rng = np.random.default_rng(0)
    batch_data = {
        "t1": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
        "pet": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
        "info": jnp.asarray(rng.random((batch, 1, N_COVARIATES), np.float32), jnp.bfloat16),
    }
    # split_d=True matches the bench configuration (bench_all.bench_flagship)
    # — without it the concat'd D pass OOMs at batch 16 L0+L1
    step = jax.jit(make_train_step(g, d, p, TRAIN_CFG, split_d=True), donate_argnums=0)
    state, metrics = step(state, batch_data)
    float(metrics["g_loss"])
    state, metrics = step(state, batch_data)
    float(metrics["g_loss"])

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        state, metrics = step(state, batch_data)
    float(metrics["g_loss"])
    jax.profiler.stop_trace()

    # summarise trace events from the trace.json.gz
    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    assert paths, "no trace written"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", []) if e.get("ph") == "X"]
    # keep only TPU device lanes (exclude host threads)
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in trace.get("traceEvents", [])
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    device_pids = {pid for pid, name in pid_names.items() if "TPU" in name or "/device" in name.lower()}
    totals = defaultdict(float)
    for e in events:
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        totals[name] += e.get("dur", 0.0)
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:45]
    grand = sum(totals.values())
    print(f"total device op-time {grand/1e3/3:.1f} ms/step over 3 steps; top ops:")
    for name, dur in top:
        print(f"{dur/1e3/3:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
