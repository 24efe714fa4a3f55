"""Building blocks of the attention-UNet model family, TPU-native.

Functional flax.linen re-design of the block zoo the reference vendors in
`unet/utils/atten_unet_model.py` (MONAI-generative lineage): ResnetBlock,
Up/Downsample, AttentionBlock, CrossAttention, SpatialTransformer and the
Down/Mid/Up block factories. Semantics (normalisation placement, zero-init
output convolutions, skip wiring, head counts) follow the reference; the
implementation is new and channels-last — activations are (N, *spatial, C)
so XLA keeps convolutions and the flattened voxel-token attention in its
native TPU layout.

Reference anchors (for parity checking, /root/reference):
  ResnetBlock        unet/utils/atten_unet_model.py:565-662
  Down/Upsample      unet/utils/atten_unet_model.py:464-562
  AttentionBlock     unet/utils/atten_unet_model.py:346-459
  CrossAttention     unet/utils/atten_unet_model.py:65-175
  SpatialTransformer unet/utils/atten_unet_model.py:238-343
  Down/Mid/Up blocks unet/utils/atten_unet_model.py:665-1409
  factories          unet/utils/atten_unet_model.py:1412-1572
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from cips_tpu.ops.attention import merge_heads, multi_head_attention, split_heads
from cips_tpu.ops.s2d import (
    F8,
    PHASES,
    Factors,
    packed_conv,
    packed_conv_pooled,
    packed_conv_tiled,
    phase_count,
    phase_mean,
    phase_tile,
    repack_pool,
    repack_tile,
    repack_tile_compact,
)

Dtype = jnp.dtype

# Activation-checkpoint name carried by conv outputs inside the
# rematerialised UNet blocks. With the "conv" remat policy
# (save_only_these_names(CONV_SAVE_NAME)) the backward pass keeps those conv
# outputs resident and recomputes only the cheap elementwise chain
# (GroupNorm / SiLU / pad / concat) between them — the MXU work runs once.
# Only PACKED conv outputs carry the saved name: their channel count is a
# lane multiple (128-dense in HBM), while unpacked mid-level tensors (e.g.
# C=32) are stored with up to 4x padding expansion (measured, v5e) — saving
# those costs 4x their logical size, so they stay whole-block remat.
CONV_SAVE_NAME = "resconv"
CONV_NOSAVE_NAME = "resconv_padded"
# A resblock's FINAL conv output carries a distinct name so the lighter
# "conv2" policy can keep only one saved tensor per block (half the saved
# HBM of "conv"; the backward then re-runs conv1/skip once per block) —
# the trade that unlocks batch 12/16 on the flagship.
CONV2_SAVE_NAME = "resconv2"
# 1x1 skip-projection outputs: as LARGE as a conv2 output but 1/27 of a k3
# conv to recompute — the "conv12" policy drops exactly these saves.
CONV_SKIP_SAVE_NAME = "resconvskip"
# GroupNorm statistics: (B, G)-shaped — saving them is ~free and spares the
# backward recompute its full-tensor reduction passes.
GN_STAT_NAME = "gnstat"
# Flash-attention custom-VJP residuals (ops/pallas/flash_attention.py
# ATTN_RESID_NAME): saved under EVERY policy mode — (B,H,L,Dh)-sized, and
# saving them dead-code-eliminates the rematerialised forward attention
# kernel (exp-roofline VPU work) in the backward pass.
from cips_tpu.ops.pallas.flash_attention import ATTN_RESID_NAME  # noqa: E402


def conv_save_policy(mode: str = "conv"):
    """jax.checkpoint policy for the named remat modes.

    "conv"     — save every packed conv output (conv1/conv2/skip): backward
                 recomputes only the elementwise GN/SiLU chain.
    "conv12"   — save conv1+conv2 but RECOMPUTE the 1x1 skip projections:
                 their saved outputs are full-size tensors but cost 1/27 of
                 a k3 conv to re-run — near-"conv" speed at ~2/3 the saved
                 HBM (the batch-16 enabler without conv2's conv1 re-runs).
    "conv2"    — save only each block's final conv output: half the saved
                 set; backward re-runs conv1/skip once per block.
    "conv_all" — additionally save unpacked (padded-layout) conv outputs.
    """
    if mode == "conv":
        return jax.checkpoint_policies.save_only_these_names(
            CONV_SAVE_NAME, CONV2_SAVE_NAME, CONV_SKIP_SAVE_NAME, GN_STAT_NAME, ATTN_RESID_NAME
        )
    if mode == "conv12":
        return jax.checkpoint_policies.save_only_these_names(
            CONV_SAVE_NAME, CONV2_SAVE_NAME, GN_STAT_NAME, ATTN_RESID_NAME
        )
    if mode == "conv2":
        return jax.checkpoint_policies.save_only_these_names(
            CONV2_SAVE_NAME, GN_STAT_NAME, ATTN_RESID_NAME
        )
    if mode == "conv_all":
        return jax.checkpoint_policies.save_only_these_names(
            CONV_SAVE_NAME, CONV2_SAVE_NAME, CONV_SKIP_SAVE_NAME, CONV_NOSAVE_NAME, GN_STAT_NAME,
            ATTN_RESID_NAME
        )
    raise ValueError(f"unknown remat policy mode {mode!r}")


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def heads_for(channels: int, num_head_channels: int | None) -> tuple[int, int]:
    """(num_heads, head_dim) for a channel count and per-head width.

    The reference divides `channels // num_head_channels` unchecked
    (atten_unet_model.py:372, :925); zero / non-dividing / oversized head
    widths fall back to a single head here.
    """
    if not num_head_channels or num_head_channels <= 0 or num_head_channels > channels:
        return 1, channels
    if channels % num_head_channels:
        return 1, channels
    return channels // num_head_channels, num_head_channels


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour x2 upsampling over all spatial dims of (N, *S, C)."""
    for axis in range(1, x.ndim - 1):
        x = jnp.repeat(x, 2, axis=axis)
    return x


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """2x average pooling over all spatial dims of (N, *S, C)."""
    ndim = x.ndim - 2
    window = (2,) * ndim
    return nn.avg_pool(x, window_shape=window, strides=window)


class _GNScaleBias(nn.Module):
    """Parameter holder named GroupNorm_0 so the tree matches nn.GroupNorm
    (checkpoint / torch-importer compatibility)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


def _sum_pair(a, b, axes):
    """Two fp32 channel sums of the activation and its square.

    Default: two plain `jnp.sum`s. The variadic-reduce fusion (ONE
    `lax.reduce` over both operands, CIPS_GN_VREDUCE=1) was written to stop
    the sibling reductions CSE-ing their f32 convert into a materialised
    fp32 copy, but MEASURED SLOWER end to end on v5e (round-4 session-2
    A/B: flagship dense 9.88 vreduce vs 10.43 plain, halo 12.59 vs 13.27 —
    the variadic lowering serialises on the VPU and costs ~5% of the step;
    it also explains the round-3 9.865 headline dip vs 10.09)."""
    if not os.environ.get("CIPS_GN_VREDUCE"):
        return jnp.sum(a, axes), jnp.sum(b, axes)
    zero = jnp.float32(0)

    def comb(acc, val):
        return acc[0] + val[0], acc[1] + val[1]

    return jax.lax.reduce((a, b), (zero, zero), comb, axes)


def _gn_stats(parts, cs, p):
    """Per-part fp32 channel moments, layout-agnostic (multi-axis reduce,
    never a flattening reshape). Returns ((B, C) mean, (B, C) mean-square)."""
    b = parts[0].shape[0]
    ch_s1, ch_s2 = [], []
    for part, ci in zip(parts, cs):
        sp_axes = tuple(range(1, part.ndim - 1))
        n = 1
        for s in part.shape[1:-1]:
            n *= s
        x32 = part.astype(jnp.float32)
        t1, t2 = _sum_pair(x32, jnp.square(x32), sp_axes)
        s1 = checkpoint_name(t1 / n, GN_STAT_NAME)  # (B, P*ci)
        s2 = checkpoint_name(t2 / n, GN_STAT_NAME)
        ch_s1.append(s1.reshape(b, p, ci).mean(axis=1))  # (B, ci)
        ch_s2.append(s2.reshape(b, p, ci).mean(axis=1))
    s1c = ch_s1[0] if len(ch_s1) == 1 else jnp.concatenate(ch_s1, axis=-1)
    s2c = ch_s2[0] if len(ch_s2) == 1 else jnp.concatenate(ch_s2, axis=-1)
    return s1c, s2c


def _gn_affine_apply(parts, cs, p, w_c, off_c):
    """FMA each part with its (B, C) channel slice of w/off, broadcast over
    the part's own rank (no reshape — layout-agnostic)."""
    b = parts[0].shape[0]
    outs, off = [], 0
    for part, ci in zip(parts, cs):
        wi = jax.lax.dynamic_slice_in_dim(w_c, off, ci, axis=1)
        oi = jax.lax.dynamic_slice_in_dim(off_c, off, ci, axis=1)
        bshape = (b,) + (1,) * (part.ndim - 2) + (p * ci,)
        w_pc = jnp.tile(wi, (1, p)).reshape(bshape)
        off_pc = jnp.tile(oi, (1, p)).reshape(bshape)
        outs.append(part * w_pc.astype(part.dtype) + off_pc.astype(part.dtype))
        off += ci
    return tuple(outs)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn_core(parts, scale, bias, p, g, eps):
    """Group norm over a tuple of channel-concat parts in the packed domain.

    Forward: two fused fp32 reductions per part + tiny group combine + one
    FMA pass. Backward (hand-written, see ``_gn_bwd``): two fused reductions
    per part + one FMA pass with per-(B, C) fp32 coefficients — XLA autodiff
    of the stats graph materialised an fp32 copy of the activation plus a
    relayout/broadcast chain (measured ~10 ms per norm at causal batch 4)."""
    y, _ = _gn_fwd(parts, scale, bias, p, g, eps)
    return y


def _gn_fwd(parts, scale, bias, p, g, eps):
    cs = [part.shape[-1] // p for part in parts]
    c = sum(cs)
    gs = c // g
    b = parts[0].shape[0]
    s1c, s2c = _gn_stats(parts, cs, p)
    mean_g = s1c.reshape(b, g, gs).mean(axis=2)  # (B, G)
    meansq_g = s2c.reshape(b, g, gs).mean(axis=2)
    inv = jax.lax.rsqrt(jnp.maximum(meansq_g - jnp.square(mean_g), 0.0) + eps)
    w_c = (inv[:, :, None] * scale.reshape(g, gs)[None]).reshape(b, c)
    off_c = (
        bias.reshape(g, gs)[None]
        - mean_g[:, :, None] * inv[:, :, None] * scale.reshape(g, gs)[None]
    ).reshape(b, c)
    y = _gn_affine_apply(parts, cs, p, w_c, off_c)
    return y, (parts, scale, mean_g, inv)


def _gn_bwd(p, g, eps, res, grads):
    parts, scale, mean_g, inv = res  # mean_g/inv: (B, G) fp32
    cs = [part.shape[-1] // p for part in parts]
    c = sum(cs)
    gs = c // g
    b = parts[0].shape[0]
    spatial = 1
    for s in parts[0].shape[1:-1]:
        spatial *= s
    n = spatial * p * gs  # elements per (batch, group)

    ch_g, ch_gx = [], []
    for part, gr, ci in zip(parts, grads, cs):
        sp_axes = tuple(range(1, part.ndim - 1))
        g32 = gr.astype(jnp.float32)
        sum_g, sum_gx = _sum_pair(g32, g32 * part.astype(jnp.float32), sp_axes)  # (B, P*ci)
        ch_g.append(sum_g.reshape(b, p, ci).sum(axis=1))  # (B, ci)
        ch_gx.append(sum_gx.reshape(b, p, ci).sum(axis=1))
    sum_g_c = ch_g[0] if len(ch_g) == 1 else jnp.concatenate(ch_g, axis=-1)  # (B, C)
    sum_gx_c = ch_gx[0] if len(ch_gx) == 1 else jnp.concatenate(ch_gx, axis=-1)

    gamma = scale[None]  # (1, C)
    s1_g = (gamma * sum_g_c).reshape(b, g, gs).sum(axis=2)  # (B, G)
    s2_g = (gamma * sum_gx_c).reshape(b, g, gs).sum(axis=2)
    centered = s2_g - mean_g * s1_g
    # dx = a*g + bb*x + cc (derivation: y = (x-mu)*inv*gamma + beta)
    bb_g = -(inv**3) * centered / n  # (B, G)
    cc_g = -inv * s1_g / n - bb_g * mean_g
    inv_c = jnp.repeat(inv, gs, axis=1)  # (B, C)
    a_c = inv_c * gamma
    bb_c = jnp.repeat(bb_g, gs, axis=1)
    cc_c = jnp.repeat(cc_g, gs, axis=1)

    mean_c = jnp.repeat(mean_g, gs, axis=1)
    d_scale = jnp.sum(inv_c * (sum_gx_c - mean_c * sum_g_c), axis=0)  # (C,)
    d_bias = jnp.sum(sum_g_c, axis=0)

    dparts, off = [], 0
    for part, gr, ci in zip(parts, grads, cs):
        ai = jax.lax.dynamic_slice_in_dim(a_c, off, ci, axis=1)
        bi = jax.lax.dynamic_slice_in_dim(bb_c, off, ci, axis=1)
        ci_ = jax.lax.dynamic_slice_in_dim(cc_c, off, ci, axis=1)
        bshape = (b,) + (1,) * (part.ndim - 2) + (p * ci,)
        a_pc = jnp.tile(ai, (1, p)).reshape(bshape).astype(gr.dtype)
        b_pc = jnp.tile(bi, (1, p)).reshape(bshape).astype(gr.dtype)
        c_pc = jnp.tile(ci_, (1, p)).reshape(bshape).astype(gr.dtype)
        dparts.append(gr * a_pc + part * b_pc + c_pc)
        off += ci
    return tuple(dparts), d_scale, d_bias


_gn_core.defvjp(_gn_fwd, _gn_bwd)


class GroupNorm(nn.Module):
    """Group normalisation with fp32 statistics and activation-dtype apply.

    The reference runs fp32 end-to-end; under bf16 compute the moments are
    the one numerically fragile spot (SURVEY.md §7 "hard parts"), so they
    accumulate in fp32 — but WITHOUT materialising an fp32 copy of the
    tensor: the converts fuse into the reductions, and the normalisation is
    a single fused x*w + b elementwise pass in the activation dtype
    (profiling showed nn.GroupNorm's fp32 round trip costing ~20% of the
    train step in convert/copy traffic).

    ``packed=True``: the input is a space-to-depth representation
    (B, Z, Y, X, P*C); the phase axis counts as spatial so the result
    equals GN on the full-resolution tensor, with the same (C,)-shaped
    scale/bias parameters. ``phases`` = P of the packing.
    """

    num_groups: int
    epsilon: float = 1e-6
    packed: bool = False
    phases: int = PHASES
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # A tuple input is the channel-concat of its parts, kept apart so the
        # concat is never materialised (the up-path skip fusion). Exact for
        # ANY part boundary: per-channel fp32 partial moments are reduced per
        # part (lane-preserving — the naive (B,S,P,G,gs) reduction ran at
        # ~15% of HBM bandwidth), the tiny (B, C) channel stats concatenate
        # across parts, and the (B, G) group moments combine from those —
        # mathematically identical to GN on the materialised concat even
        # when a group straddles the boundary (e.g. the flagship's
        # up_3/resnet_0 with 32+16 channels in groups of 3, whose interleave
        # fallback was the largest batch-12 HBM allocation).
        parts = tuple(x) if isinstance(x, (tuple, list)) else (x,)
        p = self.phases if self.packed else 1
        cs = [part.shape[-1] // p for part in parts]
        c = sum(cs)
        g = self.num_groups
        if c % g:
            raise ValueError(f"channels {c} not divisible by num_groups {g}")
        scale, bias = _GNScaleBias(c, name="GroupNorm_0")()
        outs = _gn_core(parts, scale, bias, p, g, self.epsilon)
        return outs[0] if not isinstance(x, (tuple, list)) else tuple(outs)


class PackedConv(nn.Module):
    """Convolution in the space-to-depth domain with ORIGINAL parameters.

    The parameter tree matches `conv()` exactly ((k,k,k,Cin,Cout) kernel +
    (Cout,) bias under the same names), so a packed model and its unpacked
    twin share checkpoints; only the runtime arithmetic differs (the kernel
    is scattered to (P*Cin, P*Cout) at trace time — ops/s2d.py).
    """

    features: int
    kernel: int = 3
    zero_init: bool = False
    factors: Factors = F8
    tiled_input: bool = False  # input is the UNPACKED pre-tile of a nearest
    # upsample; the tile folds into the kernel (ops/s2d.packed_conv_tiled)
    pooled_input: bool = False  # input is the PACKED pre-pool of a 2x down
    # transition into the unpacked next level; phase_mean folds into the
    # kernel (ops/s2d.packed_conv_pooled) and the output is UNPACKED
    strided_output: bool = False  # the conv is the ORIGINAL stride-2 k3
    # conv: the packed input's cell grid IS the stride-2 output grid, so the
    # output is UNPACKED with no realign (ops/s2d.packed_conv_strided) —
    # serves strided ResidualUnits (BMGAN ResNet_encoder) in the s2d domain
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> jax.Array:
        assert not (self.tiled_input and self.pooled_input)
        assert not (self.strided_output and (self.tiled_input or self.pooled_input))
        # A tuple input is the channel-concat of its parts: the kernel is
        # sliced along Cin and the partial convolutions summed — linearity
        # makes this exact, and the concat temporary never exists.
        parts = tuple(x) if isinstance(x, (tuple, list)) else (x,)
        p = phase_count(self.factors)
        cins = [part.shape[-1] // (1 if self.tiled_input else p) for part in parts]
        cin = sum(cins)
        k = self.kernel
        kernel_init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        w = self.param("kernel", kernel_init, (k, k, k, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        from cips_tpu.ops import s2d as _s2d

        # Halo formulation (CIPS_PACKED_CONV=halo, k=3 packed-output sites):
        # partial halo grids sum BEFORE the single realign fusion —
        # realignment commutes with the sum by linearity.
        use_halo = (
            not self.pooled_input
            and not self.strided_output
            and _s2d.packed_conv_uses_halo(k)
        )
        if self.strided_output:
            assert k == 3, "strided packed conv exists for k=3 only"
            conv_fn = _s2d.packed_conv_strided
        elif use_halo:
            conv_fn = (
                (lambda x_, w_, f: _s2d.packed_conv_tiled_halo(x_, w_, f, realign=False))
                if self.tiled_input
                else (lambda x_, w_, f: _s2d.packed_conv_halo_impl(x_, w_, f, realign=False))
            )
        elif self.tiled_input:
            conv_fn = packed_conv_tiled
        elif self.pooled_input:
            conv_fn = packed_conv_pooled
        else:
            conv_fn = packed_conv
        y = None
        off = 0
        for part, ci in zip(parts, cins):
            wi = jax.lax.dynamic_slice_in_dim(w, off, ci, axis=3)
            yi = conv_fn(part.astype(self.dtype), wi.astype(self.dtype), f=self.factors)
            y = yi if y is None else y + yi
            off += ci
        if use_halo:
            y = _s2d.halo_realign(y, parts[0].shape[1:4], self.features, self.factors)
        if self.pooled_input or self.strided_output:  # unpacked output: plain bias
            return y + b.astype(y.dtype)
        return y + jnp.tile(b.astype(y.dtype), p)


def conv(
    features: int,
    kernel: int = 3,
    stride: int = 1,
    spatial_dims: int = 3,
    zero_init: bool = False,
    name: Optional[str] = None,
    dtype: Dtype = jnp.float32,
) -> nn.Conv:
    """'same'-style convolution matching the reference's Convolution usage.

    kernel k with padding (k-1)//2 on both sides — identical output sizes to
    torch Conv3d(k, stride, padding=(k-1)//2) for the even volumes used here.
    Zero-init reproduces the reference's `zero_module` output convs
    (atten_unet_model.py:56-62), which stabilise early GAN training.
    """
    pad = (kernel - 1) // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel,) * spatial_dims,
        strides=(stride,) * spatial_dims,
        padding=[(pad, pad)] * spatial_dims,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class Downsample(nn.Module):
    """Stride-2 conv (use_conv) or 2x average-pool downsampling."""

    spatial_dims: int
    use_conv: bool
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.use_conv:
            features = self.out_channels or x.shape[-1]
            return conv(features, 3, 2, self.spatial_dims, dtype=self.dtype, name="op")(x)
        return avg_pool_2x(x)


class Upsample(nn.Module):
    """Nearest x2 upsampling with optional 3x3 conv."""

    spatial_dims: int
    use_conv: bool
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nearest_upsample_2x(x)
        if self.use_conv:
            features = self.out_channels or x.shape[-1]
            x = conv(features, 3, 1, self.spatial_dims, dtype=self.dtype, name="conv")(x)
        return x


class PackedUpsample(nn.Module):
    """Nearest x2 upsample + conv, producing a space-to-depth output.

    Parameter tree matches `Upsample` (child conv named "conv"), so packed
    and unpacked models share checkpoints. repack_tile == nearest x2 on the
    full grid (ops/s2d.py). ``f_in`` is the input's packing (None =
    unpacked), ``f_out`` the produced packing."""

    out_channels: int
    f_in: Optional[Factors] = None
    f_out: Factors = F8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # fold the tile into the conv kernel (packed_conv_tiled): prod(f_out)
        # fewer MACs than convolving the materialised tile, and the
        # (…, P*C) tile temporary never exists.
        x = repack_tile_compact(x, self.f_in, self.f_out)
        return PackedConv(
            self.out_channels, 3, factors=self.f_out, tiled_input=True,
            dtype=self.dtype, name="conv",
        )(x)


class ResnetBlock(nn.Module):
    """GN -> SiLU -> (up/down) -> conv -> GN -> SiLU -> zero-conv, + skip.

    Mirrors atten_unet_model.py:565-662 with the timestep path stripped (the
    reference never feeds one — AttenUNet.forward takes no timesteps).

    ``f_in`` / ``f_out`` select the space-to-depth execution domain per side
    (None = full-resolution; a per-axis factor tuple = packed; exact math,
    identical parameters — ops/s2d.py). They differ only across up/down
    blocks, where `repack_tile`/`repack_pool` carry the 2x resample and the
    packing change in one exact transform.
    """

    spatial_dims: int
    out_channels: Optional[int] = None
    up: bool = False
    down: bool = False
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    f_in: Optional[Factors] = None
    f_out: Optional[Factors] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x2: Optional[jax.Array] = None) -> jax.Array:
        f_in, f_out = self.f_in, self.f_out
        if not (self.up or self.down):
            assert f_in == f_out, "packing can only change across up/down blocks"
        if x2 is not None:
            # dual input == channel-concat(x, x2) WITHOUT materialising the
            # concat: GN normalises the parts with split affine params and
            # the convs slice their kernel along Cin (the up-path skip
            # fusion — the concat temporaries were the batch>8 HBM blocker).
            if self.up or self.down or f_in is None:
                raise NotImplementedError("dual-input resnet requires an interior packed block")
            p = phase_count(f_in)
            in_ch = (x.shape[-1] + x2.shape[-1]) // p
            out_ch = self.out_channels or in_ch
            hs = GroupNorm(
                self.norm_num_groups, self.norm_eps, packed=True, phases=p, name="norm1"
            )((x, x2))
            hs = tuple(nn.silu(h) for h in hs)
            h = checkpoint_name(
                PackedConv(out_ch, 3, factors=f_out, dtype=self.dtype, name="conv1")(hs), CONV_SAVE_NAME
            )
            h = GroupNorm(
                self.norm_num_groups, self.norm_eps, packed=True, phases=p, name="norm2"
            )(h)
            h = nn.silu(h)
            h = checkpoint_name(
                PackedConv(out_ch, 3, zero_init=True, factors=f_out, dtype=self.dtype, name="conv2")(h),
                CONV2_SAVE_NAME,
            )
            if out_ch != in_ch:
                xs = checkpoint_name(
                    PackedConv(out_ch, 1, factors=f_out, dtype=self.dtype, name="skip")((x, x2)),
                    CONV_SKIP_SAVE_NAME,
                )
            else:  # identity skip: the interleaved concat is unavoidable
                c1, c2 = x.shape[-1] // p, x2.shape[-1] // p
                xr = x.reshape(*x.shape[:-1], p, c1)
                x2r = x2.reshape(*x2.shape[:-1], p, c2)
                xs = jnp.concatenate([xr, x2r], axis=-1).reshape(*x.shape[:-1], p * (c1 + c2))
            return xs + h

        in_ch = x.shape[-1] // phase_count(f_in)
        out_ch = self.out_channels or in_ch

        h = GroupNorm(
            self.norm_num_groups, self.norm_eps, packed=f_in is not None,
            phases=phase_count(f_in), name="norm1",
        )(x)
        h = nn.silu(h)

        # upsampling into a packed domain: the tile's P phase blocks are
        # identical (repack_tile == phase_tile(repack_tile_compact(...))), so
        # conv1/skip fold the tile into their kernels (packed_conv_tiled) —
        # the P*C-channel tile temporary was the dominant batch>8 HBM
        # allocation, and for packed->packed transitions (L0+L1 flagship,
        # causal s2d_levels=all) the folded conv1 output joins the
        # conv12-droppable save class (the 1.12 GB up_2 saves of the
        # L0+L1@16 OOM, BENCH_NOTES round-4).
        fuse_tile = self.up and f_out is not None
        if fuse_tile:
            x = repack_tile_compact(x, f_in, f_out)
            h = repack_tile_compact(h, f_in, f_out)
        # downsampling out of the (2,2,2)-packed domain: the pool windows
        # coincide with the packing cells, so conv1/skip fold the phase_mean
        # into their kernels (packed_conv_pooled) — the pooled temporary and
        # its relayout never materialise (mirror of the fold-tile trick).
        fuse_pool = self.down and f_in == F8 and f_out is None
        if self.up and not fuse_tile:
            if f_in is None and f_out is None:
                # rank-generic path: repack_tile's packed domain is 3-D only
                x = nearest_upsample_2x(x)
                h = nearest_upsample_2x(h)
            else:
                x = repack_tile(x, f_in, f_out)
                h = repack_tile(h, f_in, f_out)
        elif self.down and not fuse_pool:
            if f_in is None and f_out is None:
                x = avg_pool_2x(x)
                h = avg_pool_2x(h)
            else:
                x = repack_pool(x, f_in, f_out)
                h = repack_pool(h, f_in, f_out)

        if f_out is not None:
            h = checkpoint_name(
                PackedConv(
                    out_ch, 3, factors=f_out, tiled_input=fuse_tile, dtype=self.dtype, name="conv1"
                )(h),
                # the fold-tile conv1 issues P-times FEWER MACs than a dense
                # packed conv (ops/s2d.packed_conv_tiled) yet its output is a
                # full P*C-channel level-0 tensor — cheap to recompute, huge
                # to save: it joins the "conv12"-droppable class
                CONV_SKIP_SAVE_NAME if fuse_tile else CONV_SAVE_NAME,
            )
            h = GroupNorm(
                self.norm_num_groups, self.norm_eps, packed=True, phases=phase_count(f_out), name="norm2"
            )(h)
            h = nn.silu(h)
            h = checkpoint_name(
                PackedConv(out_ch, 3, zero_init=True, factors=f_out, dtype=self.dtype, name="conv2")(h),
                CONV2_SAVE_NAME,
            )
            if out_ch != in_ch:
                x = checkpoint_name(
                    PackedConv(
                        out_ch, 1, factors=f_out, tiled_input=fuse_tile, dtype=self.dtype, name="skip"
                    )(x),
                    CONV_SKIP_SAVE_NAME,
                )
            elif fuse_tile:
                # identity skip: the tile materialises only at the residual add
                x = phase_tile(x, f_out)
        else:
            if fuse_pool:
                h = checkpoint_name(
                    PackedConv(
                        out_ch, 3, factors=f_in, pooled_input=True, dtype=self.dtype, name="conv1"
                    )(h),
                    CONV_NOSAVE_NAME,
                )
            else:
                h = checkpoint_name(
                    conv(out_ch, 3, 1, self.spatial_dims, dtype=self.dtype, name="conv1")(h),
                    CONV_NOSAVE_NAME,
                )
            h = GroupNorm(self.norm_num_groups, self.norm_eps, name="norm2")(h)
            h = nn.silu(h)
            h = checkpoint_name(
                conv(out_ch, 3, 1, self.spatial_dims, zero_init=True, dtype=self.dtype, name="conv2")(h),
                CONV_NOSAVE_NAME,
            )
            if out_ch != in_ch:
                if fuse_pool:
                    x = checkpoint_name(
                        PackedConv(
                            out_ch, 1, factors=f_in, pooled_input=True, dtype=self.dtype, name="skip"
                        )(x),
                        CONV_NOSAVE_NAME,
                    )
                else:
                    x = checkpoint_name(
                        conv(out_ch, 1, 1, self.spatial_dims, dtype=self.dtype, name="skip")(x),
                        CONV_NOSAVE_NAME,
                    )
            elif fuse_pool:
                # identity skip: the pooled tensor materialises only at the add
                x = phase_mean(x, f_in)
        return x + h


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


class CrossAttention(nn.Module):
    """Multi-head (cross-)attention over token sequences (B, L, C).

    Context defaults to self-attention; a 2-D (B, C_ctx) context is promoted
    to a length-1 sequence as in the reference (atten_unet_model.py:110-112).
    """

    query_dim: int
    cross_attention_dim: Optional[int] = None
    num_attention_heads: int = 8
    num_head_channels: int = 64
    dropout: float = 0.0
    upcast_attention: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        inner_dim = self.num_head_channels * self.num_attention_heads

        def dense(features, use_bias, name):
            return nn.Dense(
                features,
                use_bias=use_bias,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=name,
            )

        ctx = x if context is None else context
        if ctx.ndim == 2:
            ctx = ctx[:, None, :]

        q = dense(inner_dim, False, "to_q")(x)
        k = dense(inner_dim, False, "to_k")(ctx)
        v = dense(inner_dim, False, "to_v")(ctx)

        q = split_heads(q, self.num_attention_heads)
        k = split_heads(k, self.num_attention_heads)
        v = split_heads(v, self.num_attention_heads)

        out = multi_head_attention(
            q, k, v, scale=1.0 / (self.num_head_channels**0.5), upcast=self.upcast_attention
        )
        out = merge_heads(out)
        out = dense(self.query_dim, True, "to_out")(out)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP: Linear -> (x, gate) -> x * gelu(gate) -> Linear.

    Matches MONAI MLPBlock(act="GEGLU", mlp_dim=4*C) used by the reference's
    BasicTransformerBlock (atten_unet_model.py:212).
    """

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        hidden = self.dim * self.mult
        h = nn.Dense(hidden * 2, dtype=self.dtype, param_dtype=jnp.float32, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)  # exact erf GELU, == torch F.gelu
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    """Pre-LN self-attn -> cross-attn -> GEGLU MLP with residuals."""

    num_channels: int
    num_attention_heads: int
    num_head_channels: int
    dropout: float = 0.0
    cross_attention_dim: Optional[int] = None
    upcast_attention: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        def ln(name):
            return nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32, name=name)

        attn_kwargs = dict(
            query_dim=self.num_channels,
            num_attention_heads=self.num_attention_heads,
            num_head_channels=self.num_head_channels,
            dropout=self.dropout,
            upcast_attention=self.upcast_attention,
            dtype=self.dtype,
        )
        x = CrossAttention(name="attn1", **attn_kwargs)(
            ln("norm1")(x).astype(x.dtype), deterministic=deterministic
        ) + x
        x = CrossAttention(
            name="attn2", cross_attention_dim=self.cross_attention_dim, **attn_kwargs
        )(ln("norm2")(x).astype(x.dtype), context=context, deterministic=deterministic) + x
        x = GEGLUFeedForward(
            self.num_channels, dropout=self.dropout, dtype=self.dtype, name="ff"
        )(ln("norm3")(x).astype(x.dtype), deterministic=deterministic) + x
        return x


class SpatialTransformer(nn.Module):
    """GN -> 1x1 proj -> flatten voxels to tokens -> N transformer blocks -> 1x1 zero-proj + residual."""

    spatial_dims: int
    in_channels: int
    num_attention_heads: int
    num_head_channels: int
    num_layers: int = 1
    dropout: float = 0.0
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    cross_attention_dim: Optional[int] = None
    upcast_attention: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        residual = x
        batch = x.shape[0]
        spatial = x.shape[1:-1]
        inner_dim = self.num_attention_heads * self.num_head_channels

        h = GroupNorm(self.norm_num_groups, self.norm_eps, name="norm")(x)
        h = conv(inner_dim, 1, 1, self.spatial_dims, dtype=self.dtype, name="proj_in")(h)
        # channels-last: flattening spatial dims to tokens is a pure reshape,
        # no transpose needed (the reference permutes NCDHW -> tokens).
        tokens = h.reshape(batch, -1, inner_dim)
        for i in range(self.num_layers):
            tokens = BasicTransformerBlock(
                num_channels=inner_dim,
                num_attention_heads=self.num_attention_heads,
                num_head_channels=self.num_head_channels,
                dropout=self.dropout,
                cross_attention_dim=self.cross_attention_dim,
                upcast_attention=self.upcast_attention,
                dtype=self.dtype,
                name=f"block_{i}",
            )(tokens, context=context, deterministic=deterministic)
        h = tokens.reshape(batch, *spatial, inner_dim)
        h = conv(
            self.in_channels, 1, 1, self.spatial_dims, zero_init=True, dtype=self.dtype, name="proj_out"
        )(h)
        return h + residual


class AttentionBlock(nn.Module):
    """Pure spatial self-attention: GN, linear qkv over flattened voxels, residual."""

    spatial_dims: int
    num_channels: int
    num_head_channels: Optional[int] = None
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        batch = x.shape[0]
        spatial = x.shape[1:-1]
        channels = self.num_channels
        num_heads, _ = heads_for(channels, self.num_head_channels)

        h = GroupNorm(self.norm_num_groups, self.norm_eps, name="norm")(x)
        tokens = h.reshape(batch, -1, channels)

        def dense(name):
            return nn.Dense(channels, dtype=self.dtype, param_dtype=jnp.float32, name=name)

        q = split_heads(dense("to_q")(tokens), num_heads)
        k = split_heads(dense("to_k")(tokens), num_heads)
        v = split_heads(dense("to_v")(tokens), num_heads)
        out = multi_head_attention(q, k, v, scale=1.0 / ((channels / num_heads) ** 0.5))
        out = merge_heads(out)
        out = dense("proj_attn")(out)
        return out.reshape(batch, *spatial, channels) + residual


# ---------------------------------------------------------------------------
# UNet structural blocks
# ---------------------------------------------------------------------------


def _make_downsampler(
    spatial_dims, out_channels, resblock_updown, norm_num_groups, norm_eps, dtype,
    f_in=None, f_out=None, res_cls=None,
):
    if resblock_updown:
        return (res_cls or ResnetBlock)(
            spatial_dims=spatial_dims,
            out_channels=out_channels,
            down=True,
            norm_num_groups=norm_num_groups,
            norm_eps=norm_eps,
            f_in=f_in,
            f_out=f_out,
            dtype=dtype,
            name="downsampler",
        )
    if f_in is not None or f_out is not None:
        raise NotImplementedError("s2d levels require resblock_updown=True")
    return Downsample(
        spatial_dims=spatial_dims, use_conv=True, out_channels=out_channels, dtype=dtype, name="downsampler"
    )


def _make_upsampler(
    spatial_dims, out_channels, resblock_updown, norm_num_groups, norm_eps, dtype,
    f_in=None, f_out=None,
):
    if resblock_updown:
        return ResnetBlock(
            spatial_dims=spatial_dims,
            out_channels=out_channels,
            up=True,
            norm_num_groups=norm_num_groups,
            norm_eps=norm_eps,
            f_in=f_in,
            f_out=f_out,
            dtype=dtype,
            name="upsampler",
        )
    if f_in is not None or f_out is not None:
        raise NotImplementedError("s2d levels require resblock_updown=True")
    return Upsample(
        spatial_dims=spatial_dims, use_conv=True, out_channels=out_channels, dtype=dtype, name="upsampler"
    )


class DownBlock(nn.Module):
    """Resnets (+ optional per-resnet attention) and a downsampler.

    ``attention_mode``: None | 'self' | 'cross' unifies the reference's
    DownBlock / AttnDownBlock / CrossAttnDownBlock triple. Returns the new
    hidden state plus the list of residuals for the skip connections.
    """

    spatial_dims: int
    out_channels: int
    num_res_blocks: int = 1
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    add_downsample: bool = True
    resblock_updown: bool = False
    attention_mode: Optional[str] = None
    num_head_channels: int = 1
    transformer_num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    upcast_attention: bool = False
    dropout_cattn: float = 0.0
    factors: Optional[Factors] = None  # this level's s2d packing (no attention on packed levels)
    factors_down: Optional[Factors] = None  # the downsampled level's packing
    # When set, the RESNETS (and the downsampler) rematerialise under the
    # named conv-save policy while the attention blocks stay OUTSIDE remat:
    # flash attention's custom-VJP residuals are invisible to checkpoint
    # policies (the policy cannot reach inside custom_vjp), so remat'ing an
    # attention block re-runs the whole exp-roofline kernel in the backward
    # pass to regenerate ~10 MB of residuals. Callers should prefer this
    # over wrapping the entire block in nn.remat.
    remat_policy: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jax.Array,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        if self.factors is not None and self.attention_mode is not None:
            raise NotImplementedError("s2d level must not carry attention")
        res_cls = (
            nn.remat(ResnetBlock, policy=conv_save_policy(self.remat_policy))
            if self.remat_policy
            else ResnetBlock
        )
        outputs = []
        for i in range(self.num_res_blocks):
            h = res_cls(
                spatial_dims=self.spatial_dims,
                out_channels=self.out_channels,
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                f_in=self.factors,
                f_out=self.factors,
                dtype=self.dtype,
                name=f"resnet_{i}",
            )(h)
            if self.attention_mode == "self":
                h = AttentionBlock(
                    spatial_dims=self.spatial_dims,
                    num_channels=self.out_channels,
                    num_head_channels=self.num_head_channels,
                    norm_num_groups=self.norm_num_groups,
                    norm_eps=self.norm_eps,
                    dtype=self.dtype,
                    name=f"attn_{i}",
                )(h)
            elif self.attention_mode == "cross":
                n_heads, head_dim = heads_for(self.out_channels, self.num_head_channels)
                h = SpatialTransformer(
                    spatial_dims=self.spatial_dims,
                    in_channels=self.out_channels,
                    num_attention_heads=n_heads,
                    num_head_channels=head_dim,
                    num_layers=self.transformer_num_layers,
                    dropout=self.dropout_cattn,
                    norm_num_groups=self.norm_num_groups,
                    norm_eps=self.norm_eps,
                    cross_attention_dim=self.cross_attention_dim,
                    upcast_attention=self.upcast_attention,
                    dtype=self.dtype,
                    name=f"attn_{i}",
                )(h, context=context, deterministic=deterministic)
            outputs.append(h)

        if self.add_downsample:
            h = _make_downsampler(
                self.spatial_dims,
                self.out_channels,
                self.resblock_updown,
                self.norm_num_groups,
                self.norm_eps,
                self.dtype,
                f_in=self.factors,
                f_out=self.factors_down,
                res_cls=res_cls,
            )(h)
            outputs.append(h)
        return h, outputs


class MidBlock(nn.Module):
    """resnet -> (self|cross) attention -> resnet."""

    spatial_dims: int
    in_channels: int
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    with_conditioning: bool = False
    num_head_channels: int = 1
    transformer_num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    upcast_attention: bool = False
    dropout_cattn: float = 0.0
    # remat the two resnets only — attention stays outside remat (see
    # DownBlock.remat_policy for why).
    remat_policy: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jax.Array,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        res_cls = (
            nn.remat(ResnetBlock, policy=conv_save_policy(self.remat_policy))
            if self.remat_policy
            else ResnetBlock
        )
        common = dict(
            spatial_dims=self.spatial_dims,
            out_channels=self.in_channels,
            norm_num_groups=self.norm_num_groups,
            norm_eps=self.norm_eps,
            dtype=self.dtype,
        )
        h = res_cls(name="resnet_1", **common)(h)
        if self.with_conditioning:
            n_heads, head_dim = heads_for(self.in_channels, self.num_head_channels)
            h = SpatialTransformer(
                spatial_dims=self.spatial_dims,
                in_channels=self.in_channels,
                num_attention_heads=n_heads,
                num_head_channels=head_dim,
                num_layers=self.transformer_num_layers,
                dropout=self.dropout_cattn,
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                cross_attention_dim=self.cross_attention_dim,
                upcast_attention=self.upcast_attention,
                dtype=self.dtype,
                name="attention",
            )(h, context=context, deterministic=deterministic)
        else:
            h = AttentionBlock(
                spatial_dims=self.spatial_dims,
                num_channels=self.in_channels,
                num_head_channels=self.num_head_channels,
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                name="attention",
            )(h)
        h = res_cls(name="resnet_2", **common)(h)
        return h


class UpBlock(nn.Module):
    """Pop skip residuals, concat on channels, resnet (+ attention), upsample."""

    spatial_dims: int
    out_channels: int
    num_res_blocks: int = 1
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    add_upsample: bool = True
    resblock_updown: bool = False
    attention_mode: Optional[str] = None
    num_head_channels: int = 1
    transformer_num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    upcast_attention: bool = False
    dropout_cattn: float = 0.0
    factors: Optional[Factors] = None  # this level's s2d packing
    factors_up: Optional[Factors] = None  # the upsampled (finer) level's packing
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jax.Array,
        res_list: Sequence[jax.Array],
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        if self.factors is not None and self.attention_mode is not None:
            raise NotImplementedError("s2d level must not carry attention")
        res_list = list(res_list)
        for i in range(self.num_res_blocks):
            res = res_list.pop()
            block = ResnetBlock(
                spatial_dims=self.spatial_dims,
                out_channels=self.out_channels,
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                f_in=self.factors,
                f_out=self.factors,
                dtype=self.dtype,
                name=f"resnet_{i}",
            )
            if self.factors is not None:
                # dual-input form: the resnet consumes concat(h, res) without
                # materialising the (phase-interleaved) concat — its 2C-wide
                # temporaries (and the 2x-padded layout copies the 6-D
                # interleave dragged in) were the dominant batch>8 HBM
                # allocations. Exact for any GN group boundary (the packed
                # GroupNorm combines per-channel stats across parts).
                h = block(h, res)
            else:
                h = block(jnp.concatenate([h, res], axis=-1))
            if self.attention_mode == "self":
                h = AttentionBlock(
                    spatial_dims=self.spatial_dims,
                    num_channels=self.out_channels,
                    num_head_channels=self.num_head_channels,
                    norm_num_groups=self.norm_num_groups,
                    norm_eps=self.norm_eps,
                    dtype=self.dtype,
                    name=f"attn_{i}",
                )(h)
            elif self.attention_mode == "cross":
                n_heads, head_dim = heads_for(self.out_channels, self.num_head_channels)
                h = SpatialTransformer(
                    spatial_dims=self.spatial_dims,
                    in_channels=self.out_channels,
                    num_attention_heads=n_heads,
                    num_head_channels=head_dim,
                    num_layers=self.transformer_num_layers,
                    dropout=self.dropout_cattn,
                    norm_num_groups=self.norm_num_groups,
                    norm_eps=self.norm_eps,
                    cross_attention_dim=self.cross_attention_dim,
                    upcast_attention=self.upcast_attention,
                    dtype=self.dtype,
                    name=f"attn_{i}",
                )(h, context=context, deterministic=deterministic)

        if self.add_upsample:
            h = _make_upsampler(
                self.spatial_dims,
                self.out_channels,
                self.resblock_updown,
                self.norm_num_groups,
                self.norm_eps,
                self.dtype,
                f_in=self.factors,
                f_out=self.factors_up,
            )(h)
        return h


def attention_mode(level_has_attention: bool, with_conditioning: bool) -> Optional[str]:
    """Reference block-factory selection (atten_unet_model.py:1412-1572)."""
    if not level_has_attention:
        return None
    return "cross" if with_conditioning else "self"
