"""Causal batch-4 OOM audit: run the real train step at batch 4 and print
the allocator's program/buffer breakdown from the OOM error (VERDICT r4 #2a).

  python scripts/probe_causal_oom.py [batch]
"""

from __future__ import annotations

import os
import sys

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
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = common.load_config(None, "training_causal.json")
    enc, t1_dec, pet_dec, disc, perc = causal_task.build_models(cfg, n_covariates=5, dtype=jnp.bfloat16)
    step = jax.jit(
        causal_task.make_train_step(enc, t1_dec, pet_dec, disc, perc, cfg["training"]),
        donate_argnums=0,
    )
    state = causal_task.init_state(
        jax.random.key(0), enc, t1_dec, pet_dec, disc, perc, cfg["training"], (1, *VOL, 1), n_covariates=5
    )
    rng = np.random.default_rng(0)
    batch = {
        "t1": jnp.asarray(rng.random((b, *VOL, 1), np.float32), jnp.bfloat16),
        "pet": jnp.asarray(rng.random((b, *VOL, 1), np.float32), jnp.bfloat16),
        "info": jnp.asarray(rng.random((b, 1, 5), np.float32), jnp.bfloat16),
    }
    try:
        state, m = step(state, batch, jax.random.key(1))
        jax.block_until_ready(m)
        print(f"batch {b}: FITS — rec_pet_loss={float(m['rec_pet_loss']):.4f}")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        print(f"batch {b}: OOM/err; first 120 lines of the allocator report:")
        for line in msg.splitlines()[:120]:
            print(line)


if __name__ == "__main__":
    main()
