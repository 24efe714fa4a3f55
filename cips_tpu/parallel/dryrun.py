"""Multichip dry-run: jit the full GAN train step over an n-device mesh.

Runs the flagship training step (G + D updates) with real (data x space)
shardings on tiny shapes, to validate that the multi-chip program compiles
and executes. Invoked either in-process (when the ambient JAX runtime
already exposes enough devices) or as a subprocess with a virtual CPU mesh
(`python -m cips_tpu.parallel.dryrun N`) — the subprocess path avoids
resetting an already-initialised backend through private JAX internals.
"""

from __future__ import annotations

import sys


def run(n_devices: int) -> None:
    import jax
    import jax.numpy as jnp

    from cips_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from cips_tpu.training.unet_synthesis import build_models, init_state, make_train_step

    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}"
    )
    n_space = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    n_data = n_devices // n_space
    mesh = make_mesh(n_data=n_data, n_space=n_space)

    tiny_cfg = {
        "atten_unet_def": {
            "spatial_dims": 3,
            "in_channels": 1,
            "out_channels": 1,
            "num_channels": [8, 8],
            "num_res_blocks": 1,
            "attention_levels": [False, True],
            "norm_num_groups": 8,
            "resblock_updown": True,
            "num_head_channels": [0, 4],
        },
        "discriminator": {"num_channels": 8, "num_layers_d": 1},
        "perceptual_network": {"spatial_dims": 3},
    }
    train_cfg = {"base_lr": 5e-4, "disc_lr": 1e-4, "perceptual_weight": 0, "adv_weight": 0.1}
    n_cov = 5
    g, d, p = build_models(tiny_cfg, n_covariates=n_cov, dtype=jnp.float32)
    b = n_data  # one sample per data-parallel shard
    shape = (b, 8, 16, 8, 1)
    state = init_state(jax.random.key(0), g, d, p, train_cfg, batch_shape=shape, n_covariates=n_cov)
    state = replicate(mesh, state)
    batch = {
        "t1": jnp.ones(shape, jnp.float32),
        "pet": jnp.ones(shape, jnp.float32) * 0.5,
        "info": jnp.ones((b, 1, n_cov), jnp.float32),
    }
    batch = shard_batch(mesh, batch, spatial_axis=1)  # dp over batch, sp over depth
    step = jax.jit(make_train_step(g, d, p, train_cfg))
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics)
    assert bool(jnp.isfinite(metrics["g_loss"])), "non-finite loss in dryrun"


def main(argv=None) -> None:
    n = int((argv or sys.argv[1:])[0])
    import os

    if os.environ.get("CIPS_DRYRUN_CPU"):
        # The ambient sitecustomize registers (and pins) the axon TPU
        # backend at interpreter start, so the env var alone is too late;
        # the platform must be overridden through jax.config before first
        # device use. XLA_FLAGS (virtual device count) is honoured lazily.
        import jax

        jax.config.update("jax_platforms", "cpu")
    run(n)
    print(f"dryrun ok on {n} devices")


if __name__ == "__main__":
    main()
