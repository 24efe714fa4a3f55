"""Pallas flash attention vs einsum reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cips_tpu.ops.attention import _reference_attention
from cips_tpu.ops.pallas.flash_attention import flash_attention


@pytest.mark.parametrize("l,d,h", [(512, 32, 2), (1024, 64, 1)])
def test_flash_matches_reference(l, d, h):
    rng = np.random.default_rng(0)
    shape = (1, h, l, d)
    q = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    scale = 1.0 / (d**0.5)
    want = _reference_attention(q, k, v, scale, upcast=False)
    got = flash_attention(q, k, v, scale=scale, block_q=128, block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_flash_rejects_indivisible():
    q = jnp.zeros((1, 1, 100, 32))
    with pytest.raises(ValueError):
        flash_attention(q, q, q, block_q=64, block_k=64)


def test_flash_gradients_match_reference():
    rng = np.random.default_rng(1)
    shape = (1, 2, 256, 32)
    q = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    scale = 1.0 / (32**0.5)
    tgt = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum((_reference_attention(q, k, v, scale, upcast=False) - tgt) ** 2)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, scale=scale, block_q=64, block_k=64, interpret=True)
        return jnp.sum((o - tgt) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_flash):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-3, rtol=2e-3)
