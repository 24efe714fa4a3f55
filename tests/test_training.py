"""Training-step tests: loss decreases, GAN alternation, multi-device sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cips_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from cips_tpu.training.unet_synthesis import (
    build_models,
    init_state,
    make_eval_step,
    make_train_step,
)

TINY_CFG = {
    "atten_unet_def": {
        "spatial_dims": 3,
        "in_channels": 1,
        "out_channels": 1,
        "num_channels": [8, 8],
        "num_res_blocks": 1,
        "attention_levels": [False, True],
        "norm_num_groups": 8,
        "norm_eps": 1e-6,
        "resblock_updown": True,
        "num_head_channels": [0, 4],
    },
    "discriminator": {"num_channels": 8, "num_layers_d": 1},
    "perceptual_network": {"spatial_dims": 3},
}
TRAIN_CFG = {"base_lr": 1e-3, "disc_lr": 1e-4, "perceptual_weight": 0, "adv_weight": 0.1}


def _batch(rng, b=2, shape=(8, 16, 8), k=3):
    t1 = rng.random((b, *shape, 1), np.float32)
    pet = np.clip(t1 * 0.8 + 0.1 * rng.random((b, *shape, 1), np.float32), 0, 1)
    info = rng.random((b, 1, k), np.float32)
    return {"t1": jnp.asarray(t1), "pet": jnp.asarray(pet), "info": jnp.asarray(info)}


def test_gan_training_step_loss_decreases():
    g, d, p = build_models(TINY_CFG, n_covariates=3, dtype=jnp.float32)
    state = init_state(
        jax.random.key(0), g, d, p, TRAIN_CFG, batch_shape=(2, 8, 16, 8, 1), n_covariates=3
    )
    step = jax.jit(make_train_step(g, d, p, TRAIN_CFG))
    batch = _batch(np.random.default_rng(0))

    first = None
    last = None
    for i in range(8):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["rec_loss"])
        last = float(metrics["rec_loss"])
        assert np.isfinite(float(metrics["g_loss"]))
        assert np.isfinite(float(metrics["d_loss"]))
    assert last < first  # generator learns on a fixed batch
    assert int(state.step) == 8

    ev = jax.jit(make_eval_step(g, d, p, TRAIN_CFG))
    out = ev(state, batch)
    assert out["fake"].shape == batch["pet"].shape


def test_training_step_sharded_8dev():
    n = len(jax.devices())
    assert n == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(n_data=4, n_space=2)
    g, d, p = build_models(TINY_CFG, n_covariates=3, dtype=jnp.float32)
    state = init_state(
        jax.random.key(0), g, d, p, TRAIN_CFG, batch_shape=(4, 8, 16, 8, 1), n_covariates=3
    )
    state = replicate(mesh, state)
    batch = _batch(np.random.default_rng(1), b=4)
    batch = shard_batch(mesh, batch, spatial_axis=1)  # dp on batch, sp on depth
    step = jax.jit(make_train_step(g, d, p, TRAIN_CFG))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["g_loss"]))

    # replicated params stay replicated; batch-sharded compute executed on all devices
    leaf = jax.tree_util.tree_leaves(state.g.params)[0]
    assert leaf.sharding.is_fully_replicated
