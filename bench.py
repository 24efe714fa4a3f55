"""Benchmark: flagship T1->PET synthesis training throughput (volumes/sec/chip).

Runs the full jitted GAN training step (generator update + discriminator
update) of the conditional AttenUNet at the reference's working volume
(96, 128, 96), reference model config (unet/config/training.json:8-34,
adv_weight=0.1, perceptual_weight=0 per :52-57), bf16 compute, on the
attached TPU chip. Prints ONE JSON line.

vs_baseline anchor: the reference publishes no numbers (BASELINE.md). Its
hot loop decodes + preprocesses NIfTIs synchronously per step with
num_workers=0 (SURVEY.md §3.1) on top of fp32 torch 3-D convs at batch
2/GPU; an optimistic analytic anchor for that pipeline on its CUDA GPUs is
~2 volumes/sec/GPU (see BENCH_NOTES.md). vs_baseline = ours / 2.0.
"""

from __future__ import annotations

import json
import time

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_VOLUMES_PER_SEC = 2.0


def main():
    from __graft_entry__ import FLAGSHIP_CFG, N_COVARIATES, TRAIN_CFG
    from cips_tpu.training.unet_synthesis import build_models, init_state, make_train_step

    batch = int(jax.device_count()) * 8  # per-chip batch 8 (batch 10+ exceeds HBM even
    # with the conv-save policy and concat-free up path; see BENCH_NOTES.md)
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
    step = jax.jit(make_train_step(g, d, p, TRAIN_CFG), donate_argnums=0)

    # warmup / compile. NOTE: fetch a scalar to synchronise — through the
    # axon tunnel block_until_ready returns before execution completes.
    state, metrics = step(state, batch_data)
    float(metrics["g_loss"])
    state, metrics = step(state, batch_data)
    float(metrics["g_loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch_data)
    float(metrics["g_loss"])  # true device sync
    dt = time.perf_counter() - t0

    vols_per_sec = batch * n_steps / dt
    per_chip = vols_per_sec / jax.device_count()
    print(
        json.dumps(
            {
                "metric": "t1_to_pet_synthesis_train_throughput",
                "value": round(per_chip, 3),
                "unit": "volumes/sec/chip",
                "vs_baseline": round(per_chip / BASELINE_VOLUMES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
