"""Trace the BMGAN G-grad (and full step) and summarise top XLA ops."""

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

from cips_tpu.losses import l1_loss, patch_adversarial_loss
from cips_tpu.training import bmgan_task

TRACE_DIR = "/tmp/trace_bmgan"
VOL = (96, 128, 96)


def main():
    g, e, d, p = bmgan_task.build_models(dtype=jnp.bfloat16)
    shape = (1, *VOL, 1)
    state = bmgan_task.init_state(jax.random.key(0), g, e, d, p, shape, perceptual_weight=0.0)
    rng = np.random.default_rng(0)
    t1 = jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)
    pet = jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)
    z = jnp.asarray(rng.random((1, 8), np.float32), jnp.bfloat16)

    def g_loss(gp):
        fake = g.apply(gp, t1, z)
        logits = d.apply(state.d.params, fake)
        adv = patch_adversarial_loss(logits, target_is_real=True, for_discriminator=False)
        return adv + 20.0 * l1_loss(fake, pet)

    if "step" in sys.argv:
        # full train step (G + E + D phases) — attribution across phases
        batch = {"t1": t1, "pet": pet}
        step_fn = jax.jit(bmgan_task.make_train_step(g, e, d, p, 20.0, 0.0))

        def run_once(key):
            nonlocal state
            state, m = step_fn(state, batch, key)
            return m

        m = run_once(jax.random.key(1))
        float(m["g_loss"])
        m = run_once(jax.random.key(2))
        float(m["g_loss"])
        jax.profiler.start_trace(TRACE_DIR)
        for i in range(3):
            m = run_once(jax.random.key(3 + i))
        float(m["g_loss"])
        jax.profiler.stop_trace()
    else:
        g_grad = jax.jit(jax.grad(g_loss))
        out = g_grad(state.g.params)
        jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
        out = g_grad(state.g.params)
        jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()

        jax.profiler.start_trace(TRACE_DIR)
        for _ in range(3):
            out = g_grad(state.g.params)
        jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
        jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    assert paths, "no trace written"
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
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:40]
    grand = sum(totals.values())
    print(f"total device op-time {grand/1e3/3:.1f} ms/step over 3 steps; top ops:")
    for name, dur in top:
        print(f"{dur/1e3/3:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
