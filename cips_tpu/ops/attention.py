"""Multi-head attention over flattened voxel tokens.

The reference applies attention to the flattened (d*h*w)-token sequence of a
3-D feature map at coarse UNet levels (reference:
`unet/utils/atten_unet_model.py:143-156` — baddbmm scores, softmax, bmm).
Here the same math is expressed as batched einsums so XLA maps it onto the
MXU, with an optional Pallas flash-attention path for long token sequences
(`cips_tpu/ops/pallas/flash_attention.py`).

Shapes follow the TPU-friendly convention:
  q: (B, H, Lq, Dh)   k, v: (B, H, Lk, Dh)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Token count above which the Pallas fused kernel is preferred on TPU.
# Measured on v5e (B8/H4/D32): 2304 tokens einsum 3.2 ms vs pallas 4.5 ms;
# 4608 tokens einsum 21.4 ms vs pallas 13.4 ms — the crossover sits between.
_PALLAS_MIN_TOKENS = 4096


def _reference_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float, upcast: bool
) -> jax.Array:
    dtype = q.dtype
    if upcast:
        q = q.astype(jnp.float32)
        k = k.astype(jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * jnp.asarray(scale, scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(dtype)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float | None = None,
    upcast: bool = False,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Scaled dot-product attention, (B, H, L, Dh) layout.

    ``scale`` defaults to 1/sqrt(head_dim) (matching the reference's
    ``1/math.sqrt(num_head_channels)``). ``upcast`` reproduces the
    reference's optional fp32 upcast of the score computation.
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)

    if use_pallas is None:
        on_tpu = jax.default_backend() == "tpu"
        use_pallas = on_tpu and q.shape[2] >= _PALLAS_MIN_TOKENS and q.shape[2] == k.shape[2]
    if use_pallas:
        try:
            from cips_tpu.ops.pallas.flash_attention import flash_attention

            return flash_attention(q, k, v, scale=scale)
        except Exception:  # pragma: no cover - fallback if kernel unavailable
            pass
    return _reference_attention(q, k, v, scale, upcast)


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, L, H*Dh) -> (B, H, L, Dh)."""
    b, l, d = x.shape
    x = x.reshape(b, l, num_heads, d // num_heads)
    return x.transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, L, Dh) -> (B, L, H*Dh)."""
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)
