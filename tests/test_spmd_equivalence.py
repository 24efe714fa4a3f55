"""SPMD correctness: the sharded train step reproduces single-device numerics.

The reference's DDP allreduce keeps replicas in lockstep; the TPU-native
equivalent is XLA's implicit psum over the mesh. This test runs the same
GAN training step (same params, same batch) on 1 device and on a
(data=4, space=2) mesh and checks losses and updated parameters agree.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cips_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from cips_tpu.training.unet_synthesis import build_models, init_state, make_train_step

CFG = {
    "atten_unet_def": {
        "spatial_dims": 3,
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
TRAIN = {"base_lr": 1e-3, "disc_lr": 1e-4, "perceptual_weight": 0, "adv_weight": 0.1}


def test_sharded_step_matches_single_device():
    g, d, p = build_models(CFG, n_covariates=3, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    batch_np = {
        "t1": rng.random((4, 8, 16, 8, 1)).astype(np.float32),
        "pet": rng.random((4, 8, 16, 8, 1)).astype(np.float32),
        "info": rng.random((4, 1, 3)).astype(np.float32),
    }
    step = jax.jit(make_train_step(g, d, p, TRAIN))

    # single device
    s0 = init_state(jax.random.key(0), g, d, p, TRAIN, batch_shape=(4, 8, 16, 8, 1), n_covariates=3)
    s1, m1 = step(s0, {k: jnp.asarray(v) for k, v in batch_np.items()})

    # 4x2 mesh, dp on batch + sp on depth
    mesh = make_mesh(n_data=4, n_space=2)
    s0m = replicate(mesh, init_state(jax.random.key(0), g, d, p, TRAIN, batch_shape=(4, 8, 16, 8, 1), n_covariates=3))
    s2, m2 = step(s0m, shard_batch(mesh, batch_np, spatial_axis=1))

    np.testing.assert_allclose(float(m1["g_loss"]), float(m2["g_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["d_loss"]), float(m2["d_loss"]), rtol=1e-5)

    flat1 = jax.tree_util.tree_leaves(s1.g.params)
    flat2 = jax.tree_util.tree_leaves(s2.g.params)
    worst = max(
        float(jnp.max(jnp.abs(a - b))) for a, b in zip(flat1, flat2)
    )
    assert worst < 1e-4, f"params diverged by {worst}"


def test_collective_bytes_parser():
    """_collective_bytes reads current HLO text (shape AFTER '=', layout
    braces, tuple-shaped all-reduce) — the round-4 full-volume dryrun
    failed on the old pre-'=' pattern with payload 0."""
    from cips_tpu.parallel.dryrun import _collective_bytes

    class FakeCompiled:
        def as_text(self):
            return "\n".join([
                "%collective-permute.1 = f32[1,2,9,5,64]{4,3,2,1,0} collective-permute(%convolution), channel_id=3",
                "%all-reduce.474 = (f32[1,64]{1,0}, f32[1,64]{1,0}) all-reduce(%a, %b), channel_id=5",
                "%all-gather = bf16[2,8]{1,0} all-gather(%x), dimensions={0}",
                "%add = f32[4]{0} add(%p, %q)",  # not a collective
            ])

    want = (1 * 2 * 9 * 5 * 64) * 4 + 2 * (64 * 4) + (2 * 8) * 2
    assert _collective_bytes(FakeCompiled()) == want
