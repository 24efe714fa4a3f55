"""Trace the causal PET-decoder grad and summarise top XLA ops."""

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

from cips_tpu.cli import common
from cips_tpu.losses import l1_loss
from cips_tpu.training import causal_task

TRACE_DIR = "/tmp/trace_causal"
VOL = (96, 128, 96)


def main():
    cfg = common.load_config(None, "training_causal.json")
    enc, t1_dec, pet_dec, disc, perc = causal_task.build_models(cfg, n_covariates=5, dtype=jnp.bfloat16)
    shape = (1, *VOL, 1)
    state = causal_task.init_state(
        jax.random.key(0), enc, t1_dec, pet_dec, disc, perc, cfg["training"], shape, n_covariates=5
    )
    gp = state.gen.params
    rng = np.random.default_rng(0)
    t1 = jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)
    pet = jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)
    info = jnp.asarray(rng.random((1, 1, 5), np.float32), jnp.bfloat16)
    latent = jax.jit(lambda p: enc.apply(p, t1))(gp["encoder"])
    z = latent[..., : latent.shape[-1] // 2]

    which = sys.argv[1] if len(sys.argv) > 1 else "pet"
    if which == "step":
        # full train step at batch 2 (the bench-viable config)
        b = int(sys.argv[2]) if len(sys.argv) > 2 else 2
        bshape = (b, *VOL, 1)
        bdata = {
            "t1": jnp.asarray(rng.random(bshape, np.float32), jnp.bfloat16),
            "pet": jnp.asarray(rng.random(bshape, np.float32), jnp.bfloat16),
            "info": jnp.asarray(rng.random((b, 1, 5), np.float32), jnp.bfloat16),
        }
        step = jax.jit(causal_task.make_train_step(enc, t1_dec, pet_dec, disc, perc, cfg["training"]))
        st = causal_task.init_state(
            jax.random.key(0), enc, t1_dec, pet_dec, disc, perc, cfg["training"], (1, *VOL, 1),
            n_covariates=5,
        )
        st, m = step(st, bdata, jax.random.key(1))
        float(m["rec_pet_loss"])
        st, m = step(st, bdata, jax.random.key(2))
        float(m["rec_pet_loss"])
        jax.profiler.start_trace(TRACE_DIR)
        for i in range(3):
            st, m = step(st, bdata, jax.random.key(3 + i))
        float(m["rec_pet_loss"])
        jax.profiler.stop_trace()
        _summarize()
        return
    if which == "pet":
        grad = jax.jit(jax.grad(lambda p: l1_loss(pet_dec.apply(p, z, info), pet)))
        params = gp["pet_decoder"]
    elif which == "t1":
        grad = jax.jit(jax.grad(lambda p: l1_loss(t1_dec.apply(p, z), t1)))
        params = gp["t1_decoder"]
    else:
        grad = jax.jit(jax.grad(lambda p: jnp.mean(jnp.square(enc.apply(p, t1).astype(jnp.float32)))))
        params = gp["encoder"]

    out = grad(params)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    out = grad(params)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()

    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(3):
        out = grad(params)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    jax.profiler.stop_trace()
    _summarize()


def _summarize():
    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = [ev for ev in trace.get("traceEvents", []) if ev.get("ph") == "X"]
    pid_names = {
        ev["pid"]: ev["args"].get("name", "")
        for ev in trace.get("traceEvents", [])
        if ev.get("ph") == "M" and ev.get("name") == "process_name" and "args" in ev
    }
    device_pids = {pid for pid, name in pid_names.items() if "TPU" in name or "/device" in name.lower()}
    totals = defaultdict(float)
    for ev in events:
        if device_pids and ev.get("pid") not in device_pids:
            continue
        totals[ev.get("name", "?")] += ev.get("dur", 0.0)
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:35]
    for name, dur in top:
        print(f"{dur/1e3/3:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
