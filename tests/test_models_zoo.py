"""Smoke tests: PatchDiscriminator, BMGAN trio, AutoencoderKL, UnetGenerator3d, losses."""

import jax
import jax.numpy as jnp
import numpy as np

from cips_tpu.losses import kl_divergence, l1_loss, lsgan_discriminator_loss, patch_adversarial_loss
from cips_tpu.models.autoencoder_kl import AutoencoderKL, Decoder
from cips_tpu.models.bmgan import BMGANDiscriminator, DenseUNetGenerator, ResNetEncoder
from cips_tpu.models.discriminator import PatchDiscriminator
from cips_tpu.models.unet3d import UnetGenerator3d


def test_patch_discriminator_feature_list():
    d = PatchDiscriminator(spatial_dims=3, num_channels=8, num_layers_d=2)
    x = jnp.ones((1, 16, 16, 16, 1))
    params = d.init(jax.random.key(0), x)
    feats = d.apply(params, x)
    # num_layers_d stride-2 convs + penultimate + logits
    assert len(feats) == 4
    # /4 from the stride-2 convs, then two k4/s1/p1 convs shrink by 1 each
    assert feats[-1].shape == (1, 2, 2, 2, 1)


def test_bmgan_generator_encoder_discriminator():
    g = DenseUNetGenerator(
        input_conv_channel=4,
        down_channels=(4, 8),
        middle_channels=8,
        up_channels=(8, 4, 4),
    )
    t1 = jnp.ones((1, 16, 16, 16, 1))
    z = jnp.zeros((1, 8))
    gp = g.init(jax.random.key(0), t1, z)
    fake = g.apply(gp, t1, z)
    assert fake.shape == t1.shape
    assert float(jnp.abs(fake).max()) <= 1.0  # tanh output

    e = ResNetEncoder(input_layer_channel=4, channels=(4, 8, 8, 8))
    ep = e.init(jax.random.key(0), t1)
    mu, log_var = e.apply(ep, t1)
    assert mu.shape == (1, 8) and log_var.shape == (1, 8)

    d = BMGANDiscriminator(num_layers_d=1)
    dp = d.init(jax.random.key(0), t1)
    logits = d.apply(dp, t1)
    assert logits.shape[0] == 1 and logits.shape[-1] == 1


def test_autoencoder_kl_returns_triple():
    vae = AutoencoderKL(num_channels=(8, 8), num_res_blocks=1, norm_num_groups=8)
    x = jnp.ones((1, 8, 8, 8, 1))
    params = vae.init(jax.random.key(0), x, jax.random.key(1))
    recon, mu, sigma = vae.apply(params, x, jax.random.key(2))
    assert recon.shape == x.shape
    assert mu.shape == (1, 4, 4, 4, 3)
    assert sigma.shape == mu.shape
    assert bool(jnp.all(sigma > 0))


def test_standalone_decoder_shapes():
    dec = Decoder(num_channels=(8, 8, 8), num_res_blocks=1, norm_num_groups=8)
    z = jnp.ones((1, 2, 2, 2, 3))
    p = dec.init(jax.random.key(0), z)
    y = dec.apply(p, z)
    assert y.shape == (1, 8, 8, 8, 1)


def test_unet3d_generator():
    m = UnetGenerator3d(input_nc=1, output_nc=1, num_downs=3, ngf=4)
    x = jnp.ones((1, 8, 8, 8, 1))
    p = m.init(jax.random.key(0), x)
    y = m.apply(p, x)
    assert y.shape == x.shape
    assert float(jnp.abs(y).max()) <= 1.0


def test_losses_values():
    a = jnp.zeros((2, 4))
    b = jnp.ones((2, 4))
    assert float(l1_loss(a, b)) == 1.0

    # standard-normal latent has zero KL
    assert abs(float(kl_divergence(jnp.zeros((2, 8)), jnp.zeros((2, 8))))) < 1e-6
    assert float(kl_divergence(jnp.ones((2, 8)), jnp.zeros((2, 8)))) > 0

    logits = jnp.full((2, 3, 3, 3, 1), 0.5)
    g_loss = patch_adversarial_loss(logits, target_is_real=True, for_discriminator=False)
    np.testing.assert_allclose(float(g_loss), 0.25, rtol=1e-6)
    d_loss = lsgan_discriminator_loss(logits_fake=logits, logits_real=logits)
    np.testing.assert_allclose(float(d_loss), 0.25, rtol=1e-6)


def test_instance_norm_custom_vjp_matches_autodiff():
    """_InstanceNorm's hand VJP == autodiff of the plain formula (both phases)."""
    from cips_tpu.models.discriminator import _InstanceNorm

    rng = np.random.default_rng(3)
    for p, shape, c in [(1, (2, 4, 5, 3, 6), 6), (2, (2, 4, 5, 3, 6), 3)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        mod = _InstanceNorm(phases=p)
        params = mod.init(jax.random.key(0), x)
        params = jax.tree_util.tree_map(
            lambda t: jnp.asarray(rng.standard_normal(t.shape), t.dtype), params
        )

        def ref_apply(params, x):
            scale = params["params"]["scale"]
            bias = params["params"]["bias"]
            b = x.shape[0]
            xr = x.reshape(b, -1, p, c).swapaxes(1, 2)  # (B, P, S, C)
            mu = xr.mean(axis=(1, 2), keepdims=True)
            var = jnp.square(xr - mu).mean(axis=(1, 2), keepdims=True)
            y = (xr - mu) / jnp.sqrt(var + 1e-5) * scale + bias
            return y.swapaxes(1, 2).reshape(x.shape)

        tgt = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        loss = lambda f: (lambda pr, xx: jnp.mean(jnp.square(f(pr, xx) - tgt)))
        y_new = mod.apply(params, x)
        y_ref = ref_apply(params, x)
        np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref), atol=2e-5)
        g_new = jax.grad(loss(mod.apply), argnums=(0, 1))(params, x)
        g_ref = jax.grad(loss(ref_apply), argnums=(0, 1))(params, x)
        for a, b_ in zip(jax.tree_util.tree_leaves(g_new), jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)
