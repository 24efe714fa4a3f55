"""Numerical parity vs torch for the building blocks the reference uses.

The reference is pure torch; these tests build the torch equivalent of each
block (same math as unet/utils/atten_unet_model.py), copy weights into the
flax module, and assert the outputs agree — pinning down that the rebuild's
semantics (GroupNorm, SiLU/conv ordering, attention scaling, GEGLU MLP,
nearest upsampling, LSGAN/KL losses) match the original to float tolerance.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp


def to_jax_conv_weight(w: torch.Tensor) -> np.ndarray:
    # torch conv3d weight (out, in, kd, kh, kw) -> flax (kd, kh, kw, in, out)
    return w.detach().numpy().transpose(2, 3, 4, 1, 0)


def test_groupnorm_parity():
    from cips_tpu.models.blocks import GroupNorm

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 4, 4, 8)).astype(np.float32)
    gamma = rng.standard_normal(8).astype(np.float32)
    beta = rng.standard_normal(8).astype(np.float32)

    tg = tnn.GroupNorm(num_groups=4, num_channels=8, eps=1e-6)
    with torch.no_grad():
        tg.weight.copy_(torch.from_numpy(gamma))
        tg.bias.copy_(torch.from_numpy(beta))
    want = tg(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).detach().numpy()

    m = GroupNorm(num_groups=4, epsilon=1e-6)
    params = m.init(jax.random.key(0), jnp.asarray(x))
    params = jax.tree_util.tree_map(lambda _: None, params)  # replaced below
    params = {"params": {"GroupNorm_0": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}}}
    got = np.asarray(m.apply(params, jnp.asarray(x))).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_conv_same_padding_parity():
    from cips_tpu.models.blocks import conv

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 6, 8, 6, 3)).astype(np.float32)
    tconv = tnn.Conv3d(3, 5, kernel_size=3, stride=2, padding=1)
    want = tconv(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).detach().numpy()

    m = conv(5, 3, 2, 3)
    params = {
        "params": {
            "kernel": jnp.asarray(to_jax_conv_weight(tconv.weight)),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
    }
    got = np.asarray(m.apply(params, jnp.asarray(x))).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_nearest_upsample_and_avgpool_parity():
    from cips_tpu.models.blocks import avg_pool_2x, nearest_upsample_2x

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4, 4, 4, 2)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))

    want_up = torch.nn.functional.interpolate(xt, scale_factor=2.0, mode="nearest").numpy()
    got_up = np.asarray(nearest_upsample_2x(jnp.asarray(x))).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got_up, want_up, atol=1e-6)

    want_pool = torch.nn.functional.avg_pool3d(xt, 2, 2).numpy()
    got_pool = np.asarray(avg_pool_2x(jnp.asarray(x))).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got_pool, want_pool, atol=1e-6)


def test_cross_attention_parity():
    """Full CrossAttention vs a torch replica of the reference's module
    (atten_unet_model.py:65-175: scale=1/sqrt(head_dim), no qkv bias,
    out-proj with bias, context unsqueezed)."""
    from cips_tpu.models.blocks import CrossAttention

    rng = np.random.default_rng(3)
    B, L, C, ctx_dim, heads, hd = 2, 6, 8, 5, 2, 4
    x = rng.standard_normal((B, L, C)).astype(np.float32)
    ctx = rng.standard_normal((B, 1, ctx_dim)).astype(np.float32)

    wq = rng.standard_normal((heads * hd, C)).astype(np.float32)
    wk = rng.standard_normal((heads * hd, ctx_dim)).astype(np.float32)
    wv = rng.standard_normal((heads * hd, ctx_dim)).astype(np.float32)
    wo = rng.standard_normal((C, heads * hd)).astype(np.float32)
    bo = rng.standard_normal(C).astype(np.float32)

    def torch_attention():
        q = torch.from_numpy(x) @ torch.from_numpy(wq).T
        k = torch.from_numpy(ctx) @ torch.from_numpy(wk).T
        v = torch.from_numpy(ctx) @ torch.from_numpy(wv).T

        def split(t):
            b, l, d = t.shape
            return t.reshape(b, l, heads, d // heads).permute(0, 2, 1, 3).reshape(b * heads, l, d // heads)

        qh, kh, vh = split(q), split(k), split(v)
        scores = torch.bmm(qh, kh.transpose(1, 2)) * (1.0 / np.sqrt(hd))
        probs = scores.softmax(-1)
        out = torch.bmm(probs, vh)
        b2, l2, d2 = out.shape
        out = out.reshape(B, heads, l2, d2).permute(0, 2, 1, 3).reshape(B, l2, heads * d2)
        return (out @ torch.from_numpy(wo).T + torch.from_numpy(bo)).numpy()

    want = torch_attention()

    m = CrossAttention(
        query_dim=C, cross_attention_dim=ctx_dim, num_attention_heads=heads, num_head_channels=hd
    )
    params = {
        "params": {
            "to_q": {"kernel": jnp.asarray(wq.T)},
            "to_k": {"kernel": jnp.asarray(wk.T)},
            "to_v": {"kernel": jnp.asarray(wv.T)},
            "to_out": {"kernel": jnp.asarray(wo.T), "bias": jnp.asarray(bo)},
        }
    }
    got = np.asarray(m.apply(params, jnp.asarray(x), jnp.asarray(ctx)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


def test_geglu_parity():
    from cips_tpu.models.blocks import GEGLUFeedForward

    rng = np.random.default_rng(4)
    C = 6
    x = rng.standard_normal((2, 3, C)).astype(np.float32)
    w1 = rng.standard_normal((C, C * 8)).astype(np.float32)  # -> 2 * 4C
    b1 = rng.standard_normal(C * 8).astype(np.float32)
    w2 = rng.standard_normal((C * 4, C)).astype(np.float32)
    b2 = rng.standard_normal(C).astype(np.float32)

    h = torch.from_numpy(x) @ torch.from_numpy(w1) + torch.from_numpy(b1)
    a, gate = h.chunk(2, dim=-1)
    want = ((a * torch.nn.functional.gelu(gate)) @ torch.from_numpy(w2) + torch.from_numpy(b2)).numpy()

    m = GEGLUFeedForward(dim=C)
    params = {
        "params": {
            "proj_in": {"kernel": jnp.asarray(w1), "bias": jnp.asarray(b1)},
            "proj_out": {"kernel": jnp.asarray(w2), "bias": jnp.asarray(b2)},
        }
    }
    got = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_losses_parity_with_torch():
    from cips_tpu.losses import kl_divergence, l1_loss, patch_adversarial_loss

    rng = np.random.default_rng(5)
    a = rng.standard_normal((2, 3, 4)).astype(np.float32)
    b = rng.standard_normal((2, 3, 4)).astype(np.float32)
    want_l1 = torch.nn.functional.l1_loss(torch.from_numpy(a), torch.from_numpy(b)).item()
    np.testing.assert_allclose(float(l1_loss(jnp.asarray(a), jnp.asarray(b))), want_l1, rtol=1e-6)

    mu = rng.standard_normal((3, 8)).astype(np.float32)
    logvar = rng.standard_normal((3, 8)).astype(np.float32)
    tm, tl = torch.from_numpy(mu), torch.from_numpy(logvar)
    # reference causal kl: -0.5*sum(1+logvar-mu^2-exp(logvar)) / batch
    want_kl = (-0.5 * torch.sum(1 + tl - tm.pow(2) - tl.exp()) / mu.shape[0]).item()
    np.testing.assert_allclose(
        float(kl_divergence(jnp.asarray(mu), jnp.asarray(logvar))), want_kl, rtol=1e-5
    )

    logits = rng.standard_normal((2, 3, 3, 3, 1)).astype(np.float32)
    want_mse = torch.nn.functional.mse_loss(
        torch.from_numpy(logits), torch.ones_like(torch.from_numpy(logits))
    ).item()
    got = float(
        patch_adversarial_loss(jnp.asarray(logits), target_is_real=True, for_discriminator=False)
    )
    np.testing.assert_allclose(got, want_mse, rtol=1e-6)
