"""Round-3 BMGAN profile: batch size x exact_d_fake.

  python scripts/profile_bmgan_r3.py <batch> [exact]
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

from cips_tpu.training import bmgan_task

VOL = (96, 128, 96)


def run(batch: int, exact: bool = False):
    g, e, d, p = bmgan_task.build_models(dtype=jnp.bfloat16)
    shape = (batch, *VOL, 1)
    state = bmgan_task.init_state(jax.random.key(0), g, e, d, p, (1, *VOL, 1), perceptual_weight=0.0)
    rng = np.random.default_rng(0)
    batch_data = {
        "t1": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
        "pet": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
    }
    step = jax.jit(
        bmgan_task.make_train_step(g, e, d, p, 20.0, 0.0, exact_d_fake=exact), donate_argnums=0
    )
    state, m = step(state, batch_data, jax.random.key(1))
    float(m["g_loss"])
    state, m = step(state, batch_data, jax.random.key(2))
    float(m["g_loss"])
    n = 6
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, batch_data, jax.random.key(i))
    float(m["g_loss"])
    dt = (time.perf_counter() - t0) / n
    print(
        f"bmgan batch={batch} exact={exact}  step {dt*1e3:7.1f} ms  "
        f"{batch/dt:5.2f} vol/s/chip",
        flush=True,
    )


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    run(batch, exact="exact" in sys.argv)
