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
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30

# checkpoint_name tag on the custom-VJP residuals (q, k, v, out, lse): under
# a remat policy that saves this name, the backward uses the saved residuals
# directly and the rematerialised forward kernel call is dead-code-eliminated
# — attention is exp-heavy (VPU-bound) and its residuals are tiny
# ((B,H,L,Dh) x 4 + (B,H,L)), so re-running the kernel to regenerate them is
# never the right trade. Verified: print_saved_residuals lists all five under
# save_only_these_names(ATTN_RESID_NAME).
ATTN_RESID_NAME = "flashresid"


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *, scale: float):
    iq = pl.program_id(1)
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (block_q, d), native dtype — bf16 operands run the MXU at
    # full rate (fp32 operands quarter it); accumulation stays fp32 via
    # preferred_element_type. p is rounded to the input dtype before the
    # p @ v dot, matching the reference einsum path's probs.astype(dtype)
    # (ops/attention.py _reference_attention).
    k = k_ref[0]  # (block_k, d)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (block_q, block_k)
    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + p.sum(axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
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


def _bwd_dq_kernel(qs_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dq_ref, dq_scr, *, scale):
    """dQ: grid (bh, nq, nk), k innermost; dq accumulates in VMEM scratch.

    Scores are computed TRANSPOSED, s_t[k, q] = (K @ (Q*scale)^T)[k, q], so
    the per-q lse/delta rows broadcast along the LANE axis ((1, block_q)
    against (block_k, block_q)) — no (block_q, 1) column-vector relayout,
    which Mosaic handles poorly.
    """
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    qb = qs_ref[0]  # (block_q, d)
    kb = k_ref[0]  # (block_k, d)
    vb = v_ref[0]
    gb = g_ref[0]  # (block_q, d)
    iq = pl.program_id(1)
    lse_row = lse_ref[0, pl.ds(iq, 1), :]  # (1, block_q) f32
    delta_row = delta_ref[0, pl.ds(iq, 1), :]

    s_t = jax.lax.dot_general(  # (block_k, block_q) = scale * K Q^T
        kb, qb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p_t = jnp.exp(s_t - lse_row)
    dp_t = jax.lax.dot_general(  # (block_k, block_q) = V dO^T
        vb, gb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds_t = (p_t * (dp_t - delta_row)).astype(kb.dtype)
    # dq += ds^T K * scale  — contract the k axis (dim 0 of both operands)
    dq_scr[:] += jax.lax.dot_general(
        ds_t, kb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    qs_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, scale
):
    """dK/dV: grid (bh, nk, nq), q innermost; dk/dv accumulate in scratch."""
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    qb = qs_ref[0]  # (block_q, d)
    kb = k_ref[0]
    vb = v_ref[0]
    gb = g_ref[0]
    lse_row = lse_ref[0, pl.ds(iq, 1), :]  # (1, block_q)
    delta_row = delta_ref[0, pl.ds(iq, 1), :]

    s_t = jax.lax.dot_general(
        kb, qb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p_t = jnp.exp(s_t - lse_row)
    dp_t = jax.lax.dot_general(
        vb, gb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds_t = (p_t * (dp_t - delta_row)).astype(kb.dtype)
    # dk += ds_t Q * scale   ((block_k, block_q) @ (block_q, d))
    dk_scr[:] += jax.lax.dot_general(
        ds_t, qb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    # dv += p_t dO
    dv_scr[:] += jax.lax.dot_general(
        p_t.astype(gb.dtype), gb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward_pallas(scale, block_q, block_k, interpret, residuals, g):
    """Pallas flash backward: score tiles never leave VMEM.

    The jnp-scan backward materialised every (block_q, L) score/probability
    matrix in HBM (the conv producing s cannot fuse the exp) — ~43 GB of
    HBM traffic per L=18432 call, measured 52 ms/call on v5e. Here s/p/ds
    live in VMEM tiles and only dq/dk/dv (the size of q/k/v) touch HBM.
    """
    q, k, v, out, lse = residuals
    b, h, lq, d = q.shape
    lk = k.shape[2]
    bh = b * h
    nq = lq // block_q
    nk = lk // block_k
    qr = q.reshape(bh, lq, d)
    kr = k.reshape(bh, lk, d)
    vr = v.reshape(bh, lk, d)
    gr = g.astype(q.dtype).reshape(bh, lq, d)
    # lse/delta as (bh, nq, block_q) slabs (TPU tiling rejects (1, block_q))
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    lse_s = lse.reshape(bh, nq, block_q)
    delta_s = delta.reshape(bh, nq, block_q)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, iq, ik: (ib, ik, 0)),
            pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
            pl.BlockSpec((1, nq, block_q), lambda ib, iq, ik: (ib, 0, 0)),
            pl.BlockSpec((1, nq, block_q), lambda ib, iq, ik: (ib, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda ib, iq, ik: (ib, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(qr, kr, vr, gr, lse_s, delta_s)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda ib, ik, iq: (ib, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, ik, iq: (ib, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, ik, iq: (ib, ik, 0)),
            pl.BlockSpec((1, block_q, d), lambda ib, ik, iq: (ib, iq, 0)),
            pl.BlockSpec((1, nq, block_q), lambda ib, ik, iq: (ib, 0, 0)),
            pl.BlockSpec((1, nq, block_q), lambda ib, ik, iq: (ib, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda ib, ik, iq: (ib, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda ib, ik, iq: (ib, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, lk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, lk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(qr, kr, vr, gr, lse_s, delta_s)

    return (
        dq.reshape(b, h, lq, d),
        dk.reshape(b, h, lk, d),
        dv.reshape(b, h, lk, d),
    )


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
    b, h, lq, d = q.shape
    nq = lq // block_q
    # All dots run on bf16/native-dtype operands with fp32 ACCUMULATION
    # (preferred_element_type) — an all-fp32 formulation compiled to fp32 MXU
    # convs at 1/4 the bf16 rate and dominated the measured backward cost
    # (52 ms/call at L=18432, d=32 on v5e). Softmax math (exp, ds scaling)
    # stays fp32: s accumulates in fp32 and p is only rounded to the input
    # dtype AFTER the exp, where |p| <= 1.
    f32 = functools.partial(jnp.einsum, preferred_element_type=jnp.float32)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B, H, L)

    def per_block(carry, i):
        dk_acc, dv_acc = carry
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * block_q, block_q, axis=2)
        qb, gb = sl(q), sl(g)
        lse_b = jax.lax.dynamic_slice_in_dim(lse, i * block_q, block_q, axis=2)
        db = jax.lax.dynamic_slice_in_dim(delta, i * block_q, block_q, axis=2)
        s = f32("bhqd,bhkd->bhqk", qb, k) * scale
        p = jnp.exp(s - lse_b[..., None])
        dp = f32("bhqd,bhkd->bhqk", gb, v)
        ds = (p * (dp - db[..., None])).astype(dtype)
        pb = p.astype(dtype)
        dq_b = f32("bhqk,bhkd->bhqd", ds, k) * scale
        dk_acc = dk_acc + f32("bhqk,bhqd->bhkd", ds, qb) * scale
        dv_acc = dv_acc + f32("bhqk,bhqd->bhkd", pb, gb)
        return (dk_acc, dv_acc), dq_b

    (dk, dv), dq_blocks = jax.lax.scan(
        per_block,
        (jnp.zeros(k.shape, jnp.float32), jnp.zeros(v.shape, jnp.float32)),
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
    res = tuple(checkpoint_name(x, ATTN_RESID_NAME) for x in (q, k, v, out, lse))
    return out, res


def _flash_core_bwd(scale, block_q, block_k, interpret, residuals, g):
    return _flash_backward_pallas(scale, block_q, block_k, interpret, residuals, g)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _pick_block(l: int, candidates=(512, 256, 128)) -> int:
    """Largest candidate dividing l (voxel token counts are highly composite).

    Bigger tiles amortise per-grid-cell overhead: at L=18432, d=32 the
    (256, 512) tiling runs 20k grid cells and the forward measured 25 ms
    (overhead-bound, ~1.2 us/cell) — 4x-larger tiles quarter the cell count.
    """
    for c in candidates:
        if l % c == 0:
            return c
    return l


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention, (B, H, L, Dh) -> (B, H, L, Dh). Differentiable:
    forward is the Pallas online-softmax kernel; backward is a pair of
    Pallas kernels (dQ; dK/dV) whose score tiles never leave VMEM."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if scale is None:
        scale = 1.0 / (d**0.5)
    block_q = _pick_block(lq) if block_q is None else min(block_q, lq)
    block_k = _pick_block(lk, (1024, 512, 256, 128)) if block_k is None else min(block_k, lk)
    if lq % block_q or lk % block_k:
        raise ValueError(f"token counts ({lq}, {lk}) must divide block sizes ({block_q}, {block_k})")
    return _flash_core(q, k, v, scale, block_q, block_k, interpret)
