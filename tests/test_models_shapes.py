"""Shape/dtype property tests for the model zoo at toy channel counts.

Toy configs seeded from the reference's own smoke tests
(unet/utils/atten_unet_model.py:2034-2051).
"""

import jax
import jax.numpy as jnp
import pytest

from cips_tpu.models.atten_unet import AttenUNet
from cips_tpu.models.decoder import DiffusionModelDecoder
from cips_tpu.models.encoder import DiffusionModelEncoder


def test_atten_unet_forward_backward():
    model = AttenUNet(
        spatial_dims=3,
        in_channels=1,
        out_channels=1,
        cross_attention_dim=3,
        with_conditioning=True,
        num_res_blocks=(1, 1, 1),
        num_channels=(8, 16, 16),
        norm_num_groups=8,
        attention_levels=(False, False, True),
        num_head_channels=(0, 0, 8),
    )
    x = jnp.ones((1, 8, 16, 8, 1))
    ctx = jnp.ones((1, 1, 3))
    params = model.init(jax.random.key(0), x, ctx)
    y = model.apply(params, x, ctx)
    assert y.shape == x.shape
    # zero-init output conv -> initial output must be exactly zero
    assert float(jnp.abs(y).max()) == 0.0

    def loss(p):
        return jnp.abs(model.apply(p, x, ctx) - 1.0).mean()

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in leaves)
    # gradients reach the stem conv
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total > 0.0


def test_atten_unet_unconditional_and_resblock_updown():
    model = AttenUNet(
        spatial_dims=3,
        num_res_blocks=1,
        num_channels=(8, 8),
        norm_num_groups=8,
        attention_levels=(False, True),
        num_head_channels=(0, 4),
        resblock_updown=True,
        with_conditioning=False,
    )
    x = jnp.ones((1, 8, 16, 8, 1))
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    assert y.shape == x.shape


def test_resblock_updown_2d():
    """Regression: repack_pool/repack_tile must stay rank-generic on the
    unpacked path — 2-D resblock up/down configs (spatial_dims=2, which the
    reference's AttenUNet supports) previously crashed in the 5-D-only
    _pool2/_tile2."""
    from cips_tpu.models.blocks import ResnetBlock

    x = jnp.ones((1, 8, 16, 8))
    down = ResnetBlock(spatial_dims=2, out_channels=8, down=True, norm_num_groups=8)
    p = down.init(jax.random.key(0), x)
    y = down.apply(p, x)
    assert y.shape == (1, 4, 8, 8)
    up = ResnetBlock(spatial_dims=2, out_channels=8, up=True, norm_num_groups=8)
    p = up.init(jax.random.key(0), y)
    z = up.apply(p, y)
    assert z.shape == (1, 8, 16, 8)


def test_encoder_mlp_head_logits():
    model = DiffusionModelEncoder(
        spatial_dims=3,
        in_channels=2,
        out_channels=2,
        num_channels=(8, 16),
        num_res_blocks=1,
        attention_levels=(False, True),
        norm_num_groups=8,
        num_head_channels=(0, 8),
        with_conditioning=True,
        cross_attention_dim=5,
        head="mlp",
    )
    x = jnp.ones((1, 8, 8, 8, 2))
    ctx = jnp.ones((1, 1, 5))
    params = model.init(jax.random.key(0), x, ctx)
    logits = model.apply(params, x, ctx)
    assert logits.shape == (1, 2)


def test_encoder_spatial_head_latent_resolution():
    # 3-level spatial encoder downsamples twice -> 1/4 resolution latent
    model = DiffusionModelEncoder(
        spatial_dims=3,
        out_channels=6,
        num_channels=(8, 16, 16),
        num_res_blocks=1,
        attention_levels=(False, False, True),
        norm_num_groups=8,
        num_head_channels=(0, 0, 8),
        head="spatial",
    )
    x = jnp.ones((1, 8, 16, 8, 1))
    params = model.init(jax.random.key(0), x)
    z = model.apply(params, x)
    assert z.shape == (1, 2, 4, 2, 6)


def test_decoder_upscales_latent_to_volume():
    model = DiffusionModelDecoder(
        spatial_dims=3,
        in_channels=3,
        out_channels=1,
        num_channels=(16, 16, 8),
        num_res_blocks=1,
        attention_levels=(True, False, False),
        norm_num_groups=8,
        num_head_channels=(8, 0, 0),
        with_conditioning=True,
        cross_attention_dim=6,
    )
    z = jnp.ones((1, 2, 4, 2, 3))
    ctx = jnp.ones((1, 1, 6))
    params = model.init(jax.random.key(0), z, ctx)
    y = model.apply(params, z, ctx)
    assert y.shape == (1, 8, 16, 8, 1)


def test_encoder_decoder_compose():
    """spatial encoder -> split mu/sigma -> decoder reproduces input resolution."""
    enc = DiffusionModelEncoder(
        out_channels=6,
        num_channels=(8, 8, 8),
        num_res_blocks=1,
        attention_levels=(False, False, False),
        norm_num_groups=8,
        head="spatial",
    )
    dec = DiffusionModelDecoder(
        in_channels=3,
        out_channels=1,
        num_channels=(8, 8, 8),
        num_res_blocks=1,
        attention_levels=(False, False, False),
        norm_num_groups=8,
        with_conditioning=False,
        cross_attention_dim=None,
    )
    x = jnp.ones((1, 8, 8, 8, 1))
    ep = enc.init(jax.random.key(0), x)
    z = enc.apply(ep, x)
    mu, sigma = z[..., :3], z[..., 3:]
    dp = dec.init(jax.random.key(1), mu)
    y = dec.apply(dp, mu)
    assert y.shape == x.shape
    assert mu.shape == sigma.shape == (1, 2, 2, 2, 3)
