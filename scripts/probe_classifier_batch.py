"""MCI-classifier full-step throughput vs batch size on TPU.

The reference trains at batch 4 (`MCI_identify/scripts/train_atten_encoder_MCI.py`);
the flagship already benches at its best per-chip batch (16 vs the
reference's 2), so the classifier line should use its amortisation
optimum too.

  python scripts/probe_classifier_batch.py [batches...]
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
from cips_tpu.training import classifier_task

VOL = (96, 128, 96)


def main():
    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [4, 8, 16, 32]
    cfg = common.load_config(None, "training_atten.json")
    model = classifier_task.build_model(cfg, in_channels=2, n_covariates=5, dtype=jnp.bfloat16)
    state0 = classifier_task.init_state(jax.random.key(0), model, (1, *VOL, 2), n_covariates=5)
    step = jax.jit(classifier_task.make_train_step(model, use_tabular=True), donate_argnums=0)
    rng = np.random.default_rng(0)

    for b in batches:
        batch = {
            "imgs": jnp.asarray(rng.random((b, *VOL, 2), np.float32), jnp.bfloat16),
            "info": jnp.asarray(rng.random((b, 1, 5), np.float32), jnp.bfloat16),
            "labels": jnp.asarray(np.arange(b) % 2),
        }
        state = jax.tree.map(jnp.copy, state0)
        try:
            state, m = step(state, batch, jax.random.key(1))
            float(m["ce_loss"])
            state, m = step(state, batch, jax.random.key(1))
            float(m["ce_loss"])
            t0 = time.perf_counter()
            n = 6
            for _ in range(n):
                state, m = step(state, batch, jax.random.key(1))
            float(m["ce_loss"])
            dt = (time.perf_counter() - t0) / n
            print(f"batch {b:3d}: {dt * 1e3:8.1f} ms/step  {b / dt:7.2f} vol/s/chip", flush=True)
        except Exception as e:  # noqa: BLE001 — OOM probes
            print(f"batch {b:3d}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
