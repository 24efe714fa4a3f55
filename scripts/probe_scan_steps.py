"""Probe: per-dispatch host/tunnel overhead vs a multi-step device loop.

Times (a) the jitted train step dispatched per step from Python, and
(b) K steps chained inside one jitted lax.scan call. A large gap means the
axon-tunnel dispatch cost dominates and a device loop is the fix.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import FLAGSHIP_CFG, N_COVARIATES, TRAIN_CFG
from cips_tpu.training.unet_synthesis import build_models, init_state, make_train_step


def main():
    batch = 8
    K = 4
    shape = (batch, 96, 128, 96, 1)
    g, d, p = build_models(FLAGSHIP_CFG, n_covariates=N_COVARIATES, dtype=jnp.bfloat16)
    state = init_state(
        jax.random.key(0), g, d, p, TRAIN_CFG, batch_shape=(1,) + shape[1:], n_covariates=N_COVARIATES
    )
    rng = np.random.default_rng(0)
    batch_data = {
        "t1": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
        "pet": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
        "info": jnp.asarray(rng.random((batch, 1, N_COVARIATES), np.float32), jnp.bfloat16),
    }
    step = make_train_step(g, d, p, TRAIN_CFG)
    step_j = jax.jit(step, donate_argnums=0)

    # (a) per-step dispatch
    state, metrics = step_j(state, batch_data)
    float(metrics["g_loss"])
    t0 = time.perf_counter()
    for _ in range(K):
        state, metrics = step_j(state, batch_data)
    float(metrics["g_loss"])
    dt_loop = (time.perf_counter() - t0) / K
    print(f"python-loop dispatch: {dt_loop*1e3:7.1f} ms/step  {batch/dt_loop:5.2f} vol/s", flush=True)

    # (b) K steps inside one jit via lax.scan (same batch each iteration —
    # isolates dispatch overhead; batch content does not affect step cost)
    def multi(state, bd):
        def body(s, _):
            s2, m = step(s, bd)
            return s2, m["g_loss"]
        s, losses = jax.lax.scan(body, state, None, length=K)
        return s, losses

    multi_j = jax.jit(multi, donate_argnums=0)
    print("compiling scan...", flush=True)
    state, losses = multi_j(state, batch_data)
    float(losses[-1])
    t0 = time.perf_counter()
    state, losses = multi_j(state, batch_data)
    float(losses[-1])
    dt_scan = (time.perf_counter() - t0) / K
    print(f"scan-{K} device loop:  {dt_scan*1e3:7.1f} ms/step  {batch/dt_scan:5.2f} vol/s", flush=True)


if __name__ == "__main__":
    main()
