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
