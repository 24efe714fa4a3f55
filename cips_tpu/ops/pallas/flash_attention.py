"""Fused blockwise (flash) attention over voxel tokens — Pallas TPU kernel.

The attention levels of the UNet family attend over the flattened voxel
grid (SpatialTransformer / AttentionBlock; reference
`unet/utils/atten_unet_model.py:330-335` materialises the full L x L score
matrix). At coarse levels (L ~ 2.3k) that is fine, but finer levels reach
18k-147k tokens: this kernel computes online-softmax attention one
(block_q x block_k) tile at a time. K/V stream through the grid's innermost
dimension (double-buffered DMA handled by the Pallas pipeline), so VMEM
holds only one tile of each operand regardless of sequence length; running
max / denominator / output live in VMEM scratch across the k steps.

Layout: q, k, v are (B, H, L, Dh). Requirements: L % block sizes == 0
(voxel-grid token counts are highly composite; the dispatcher in
cips_tpu/ops/attention.py falls back to the einsum path otherwise).
fp32 accumulation regardless of input dtype. Differentiable via a chunked
O(block_q * L)-memory custom VJP (lse is a second kernel output).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *, scale: float):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    k = k_ref[0].astype(jnp.float32)  # (block_k, d)
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k)
    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + p.sum(axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        l_final = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0] = (acc_scr[:] / l_final).astype(o_ref.dtype)
        # lse laid out (bh, nq, block_q); its block is the full (nq, block_q)
        # slab (TPU tiling rejects a (1, block_q) 2-D block). Programs for
        # one batch*head share the buffer, each filling its q-row.
        lse_ref[0, iq, :] = (m_scr[:, :1] + jnp.log(l_final))[:, 0]


def _flash_forward(q, k, v, scale, block_q, block_k, interpret):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h
    qr = q.reshape(bh, lq, d)
    kr = k.reshape(bh, lk, d)
    vr = v.reshape(bh, lk, d)

    grid = (bh, lq // block_q, lk // block_k)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, iq, ik: (ib, ik, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, lq // block_q, block_q), lambda ib, iq, ik: (ib, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, lq // block_q, block_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max (lane-broadcast)
            pltpu.VMEM((block_q, 128), jnp.float32),  # running denominator
            pltpu.VMEM((block_q, d), jnp.float32),  # output accumulator
        ],
        interpret=interpret,
    )(qr, kr, vr)
    return out.reshape(b, h, lq, d), lse.reshape(b, h, lq)


def _flash_backward(scale, block_q, residuals, g):
    """Chunked flash-attention backward — O(block_q * L) memory, pure jnp.

    Standard flash backward: with P = exp(q k^T * scale - lse),
      D  = rowsum(dO * O)
      dS = P * (dO V^T - D)
      dQ = dS K * scale ;  dK = dS^T Q * scale ;  dV = P^T dO
    computed per q-block inside a scan, accumulating dK/dV.
    """
    q, k, v, out, lse = residuals
    dtype = q.dtype
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    of = out.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    b, h, lq, d = q.shape
    nq = lq // block_q
    delta = jnp.sum(gf * of, axis=-1)  # (B, H, L)

    def per_block(carry, i):
        dk_acc, dv_acc = carry
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * block_q, block_q, axis=2)
        qb, gb = sl(qf), sl(gf)
        lse_b = jax.lax.dynamic_slice_in_dim(lse, i * block_q, block_q, axis=2)
        db = jax.lax.dynamic_slice_in_dim(delta, i * block_q, block_q, axis=2)
        s = jnp.einsum("bhqd,bhkd->bhqk", qb, kf) * scale
        p = jnp.exp(s - lse_b[..., None])
        dp = jnp.einsum("bhqd,bhkd->bhqk", gb, vf)
        ds = p * (dp - db[..., None])
        dq_b = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * scale
        dk_acc = dk_acc + jnp.einsum("bhqk,bhqd->bhkd", ds, qb) * scale
        dv_acc = dv_acc + jnp.einsum("bhqk,bhqd->bhkd", p, gb)
        return (dk_acc, dv_acc), dq_b

    (dk, dv), dq_blocks = jax.lax.scan(
        per_block,
        (jnp.zeros_like(kf), jnp.zeros_like(vf)),
        jnp.arange(nq),
    )
    # (nq, B, H, block_q, d) -> (B, H, L, d)
    dq = dq_blocks.transpose(1, 2, 0, 3, 4).reshape(b, h, lq, d)
    return dq.astype(dtype), dk.astype(dtype), dv.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_core(q, k, v, scale, block_q, block_k, interpret):
    out, _ = _flash_forward(q, k, v, scale, block_q, block_k, interpret)
    return out


def _flash_core_fwd(q, k, v, scale, block_q, block_k, interpret):
    out, lse = _flash_forward(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _flash_core_bwd(scale, block_q, block_k, interpret, residuals, g):
    return _flash_backward(scale, block_q, residuals, g)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention, (B, H, L, Dh) -> (B, H, L, Dh). Differentiable:
    forward is the Pallas online-softmax kernel; backward is a chunked
    O(block_q * L)-memory custom VJP."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if scale is None:
        scale = 1.0 / (d**0.5)
    block_q = min(block_q, lq)
    block_k = min(block_k, lk)
    if lq % block_q or lk % block_k:
        raise ValueError(f"token counts ({lq}, {lk}) must divide block sizes ({block_q}, {block_k})")
    return _flash_core(q, k, v, scale, block_q, block_k, interpret)
