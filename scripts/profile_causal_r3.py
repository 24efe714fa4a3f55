"""Round-3 causal-workload profile: batch size x remat knobs.

  python scripts/profile_causal_r3.py <batch> [exact]
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


def run(batch: int, exact: bool = False, nopack: bool = False):
    cfg = common.load_config(None, "training_causal.json")
    if nopack:
        cfg = dict(cfg)
        cfg["t1_autoencoder_def"] = dict(cfg["t1_autoencoder_def"])
        cfg["t1_autoencoder_def"]["atten_encoder"] = dict(
            cfg["t1_autoencoder_def"]["atten_encoder"], s2d=False
        )
    enc, t1_dec, pet_dec, disc, perc = causal_task.build_models(cfg, n_covariates=5, dtype=jnp.bfloat16)
    shape = (batch, *VOL, 1)
    state = causal_task.init_state(
        jax.random.key(0), enc, t1_dec, pet_dec, disc, perc, cfg["training"], (1, *VOL, 1),
        n_covariates=5,
    )
    rng = np.random.default_rng(0)
    batch_data = {
        "t1": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
        "pet": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
        "info": jnp.asarray(rng.random((batch, 1, 5), np.float32), jnp.bfloat16),
    }
    step = jax.jit(
        causal_task.make_train_step(enc, t1_dec, pet_dec, disc, perc, cfg["training"],
                                    exact_d_fake=exact),
        donate_argnums=0,
    )
    state, m = step(state, batch_data, jax.random.key(1))
    float(m["rec_pet_loss"])
    state, m = step(state, batch_data, jax.random.key(2))
    float(m["rec_pet_loss"])
    n = 6
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, batch_data, jax.random.key(i))
    float(m["rec_pet_loss"])
    dt = (time.perf_counter() - t0) / n
    print(
        f"causal batch={batch} exact={exact} nopack={'nopack' in sys.argv}  "
        f"step {dt*1e3:7.1f} ms  {batch/dt:5.2f} vol/s/chip",
        flush=True,
    )


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    run(batch, exact="exact" in sys.argv, nopack="nopack" in sys.argv)
