"""Causal: python-loop dispatch vs K steps inside one jitted lax.scan.

The batch-2 full-step trace (round-5) sums to ~265 ms of XLA op self-time
per step while the bench wall-clock is ~800 ms — decide whether the gap is
dispatch overhead (scan amortises it) or real device idle (scan matches).
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

from cips_tpu.cli import common
from cips_tpu.training import causal_task

VOL = (96, 128, 96)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    K = 6
    cfg = common.load_config(None, "training_causal.json")
    enc, t1_dec, pet_dec, disc, perc = causal_task.build_models(cfg, n_covariates=5, dtype=jnp.bfloat16)
    step = causal_task.make_train_step(enc, t1_dec, pet_dec, disc, perc, cfg["training"])
    step_j = jax.jit(step, donate_argnums=0)
    state = causal_task.init_state(
        jax.random.key(0), enc, t1_dec, pet_dec, disc, perc, cfg["training"], (1, *VOL, 1), n_covariates=5
    )
    rng = np.random.default_rng(0)
    batch = {
        "t1": jnp.asarray(rng.random((b, *VOL, 1), np.float32), jnp.bfloat16),
        "pet": jnp.asarray(rng.random((b, *VOL, 1), np.float32), jnp.bfloat16),
        "info": jnp.asarray(rng.random((b, 1, 5), np.float32), jnp.bfloat16),
    }

    state, m = step_j(state, batch, jax.random.key(1))
    float(m["rec_pet_loss"])
    t0 = time.perf_counter()
    for i in range(K):
        state, m = step_j(state, batch, jax.random.key(2 + i))
    float(m["rec_pet_loss"])
    dt = (time.perf_counter() - t0) / K
    print(f"python-loop: {dt*1e3:7.1f} ms/step  {b/dt:5.2f} vol/s", flush=True)

    def multi(state, keys):
        def body(s, key):
            s2, mm = step(s, batch, key)
            return s2, mm["rec_pet_loss"]

        return jax.lax.scan(body, state, keys)

    multi_j = jax.jit(multi, donate_argnums=0)
    keys = jax.random.split(jax.random.key(9), K)
    state, losses = multi_j(state, keys)
    float(losses[-1])
    keys2 = jax.random.split(jax.random.key(11), K)
    t0 = time.perf_counter()
    state, losses = multi_j(state, keys2)
    float(losses[-1])
    dt = (time.perf_counter() - t0) / K
    print(f"scan x{K}:    {dt*1e3:7.1f} ms/step  {b/dt:5.2f} vol/s", flush=True)


if __name__ == "__main__":
    main()
