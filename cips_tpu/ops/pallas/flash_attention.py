"""Fused blockwise (flash) attention over voxel tokens — Pallas TPU kernel.

The attention levels of the UNet family attend over the flattened voxel
grid (SpatialTransformer / AttentionBlock; reference
`unet/utils/atten_unet_model.py:330-335` materialises the full L x L score
matrix). At coarse levels (L ~ 2.3k) that is fine, but attention at finer
levels (L = 18k+ at 1/4 resolution) needs O(L) memory: this kernel computes
online-softmax attention one (block_q x block_k) tile at a time, keeping
running max/denominator in VMEM — scores never hit HBM.

Layout: q, k, v are (B, H, L, Dh). Requirements: L % block sizes == 0
(voxel-grid token counts are highly composite; the dispatcher in
cips_tpu/ops/attention.py falls back to the einsum path otherwise).
fp32 accumulation regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, block_k: int):
    # refs carry a leading length-1 (batch*head) dim from the BlockSpec
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    seq_len = k_ref.shape[1]
    num_k = seq_len // block_k
    block_q, d = q.shape

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    # log-sum-exp per query row — the backward's softmax reconstruction key.
    # lse is laid out (bh, nq, block_q) and its block is the full (nq,
    # block_q) slab (TPU tiling rejects a (1, block_q) 2-D block):
    # consecutive q-programs share the buffer and each fills its row,
    # flushed when the batch*head index advances.
    iq = pl.program_id(1)
    lse_ref[0, iq, :] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _flash_forward(q, k, v, scale, block_q, block_k, interpret):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h
    qr = q.reshape(bh, lq, d)
    kr = k.reshape(bh, lk, d)
    vr = v.reshape(bh, lk, d)

    grid = (bh, lq // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda ib, iq: (ib, iq, 0)),
            pl.BlockSpec((1, lk, d), lambda ib, iq: (ib, 0, 0)),
            pl.BlockSpec((1, lk, d), lambda ib, iq: (ib, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda ib, iq: (ib, iq, 0)),
            pl.BlockSpec((1, lq // block_q, block_q), lambda ib, iq: (ib, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, lq // block_q, block_q), jnp.float32),
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
