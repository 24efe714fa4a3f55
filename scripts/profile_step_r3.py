"""Round-3 step profile: fold-pool fold + conv2-only save policy x batch.

Times the full jitted GAN train step (flagship config) for the round-3
levers, reporting volumes/sec/chip. OOM configurations are reported and
skipped. Run variants one at a time via argv to keep tunnel sessions short:
  python scripts/profile_step_r3.py conv 8
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


def run(policy, batch, split_d=False):
    shape = (batch, 96, 128, 96, 1)
    g, d, p = build_models(
        FLAGSHIP_CFG, n_covariates=N_COVARIATES, dtype=jnp.bfloat16, remat_policy=policy
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
    step = jax.jit(make_train_step(g, d, p, TRAIN_CFG, split_d=split_d), donate_argnums=0)
    state, metrics = step(state, batch_data)
    float(metrics["g_loss"])
    state, metrics = step(state, batch_data)
    float(metrics["g_loss"])
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, batch_data)
    float(metrics["g_loss"])
    dt = (time.perf_counter() - t0) / n
    print(
        f"policy={policy!r:8s} batch={batch:2d}  step {dt*1e3:7.1f} ms  "
        f"{batch/dt:6.2f} vol/s/chip",
        flush=True,
    )


if __name__ == "__main__":
    if len(sys.argv) > 1:
        run(sys.argv[1], int(sys.argv[2]), split_d="split" in sys.argv)
    else:
        for policy, batch in (("conv", 8), ("conv2", 8), ("conv2", 12), ("conv2", 16), ("conv", 12)):
            try:
                run(policy, batch)
            except Exception as e:  # noqa: BLE001 — OOM reporting
                print(f"policy={policy!r:8s} batch={batch:2d}  FAILED: {type(e).__name__}: {e}"[:300], flush=True)
