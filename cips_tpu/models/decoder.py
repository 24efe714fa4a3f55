"""DiffusionModelDecoder — covariate-conditioned latent->volume decoder.

Rebuild of the external `monai_diffusion.generative` `atten_decoder` used by
the causal workload (`causal_synthesis/scripts/train_unify_causal_gen.py:116`,
`gen_test_unify_causal.py:73`; config `configs/training_causal.json:56-74`):
a low-resolution Gaussian latent (z channels, 1/4 resolution) is decoded to a
full-resolution 1-channel PET volume while cross-attending to the tabular
causal-covariate vector. The decoder-only counterpart of AttenUNet: stem ->
conditioned mid block -> per-level resnets (+ attention per
``attention_levels``) with upsampling between levels -> GN/SiLU/zero-conv.

``num_channels`` is coarse-to-fine; len(num_channels)-1 upsamplings, so a
3-level decoder scales x4 — composing exactly with the 3-level spatial
DiffusionModelEncoder.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cips_tpu.models.blocks import (
    GroupNorm,
    MidBlock,
    PackedConv,
    PackedUpsample,
    ResnetBlock,
    SpatialTransformer,
    Upsample,
    conv,
    heads_for,
)
from cips_tpu.ops.s2d import auto_factor, depth_to_space, phase_count


def _tuplify(v, n: int) -> Tuple:
    if isinstance(v, (int, float, bool)):
        return (v,) * n
    return tuple(v)


class DiffusionModelDecoder(nn.Module):
    spatial_dims: int = 3
    in_channels: int = 3
    out_channels: int = 1
    num_res_blocks: Sequence[int] | int = 2
    num_channels: Sequence[int] = (64, 64, 32)
    attention_levels: Sequence[bool] = (True, False, False)
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    resblock_updown: bool = False
    num_head_channels: Sequence[int] | int = 32
    with_conditioning: bool = True
    transformer_num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    upcast_attention: bool = False
    remat: bool = False  # jax.checkpoint resnet/attention stages
    remat_policy: str = "conv"  # see models/blocks.conv_save_policy; "conv_all"
    # also saves unpacked conv outputs (the right default for mostly
    # unpacked models — the causal trio's backward was 4-5x fwd under "conv")
    s2d: bool = False  # space-to-depth finest level (exact; no attention there)
    # "finest": pack only the last level (measured default). "all": also pack
    # every attention-free NON-finest level whose channel count admits a
    # factor (64 -> (2,1,1)) — full 128-lane occupancy on the middle levels
    # at 2x issued MACs (ops/s2d.py). Exact either way; identical parameters.
    s2d_levels: str = "finest"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        z: jax.Array,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        if context is not None and not self.with_conditioning:
            raise ValueError("context requires with_conditioning=True")
        n = len(self.num_channels)
        if self.s2d and (self.attention_levels[-1] or self.spatial_dims != 3 or n < 2):
            raise ValueError("s2d needs a 3-D, attention-free finest level")
        f0 = auto_factor(self.num_channels[-1]) if self.s2d else None
        if self.s2d and f0 is None:
            raise ValueError("s2d finest level needs a 128-lane-compatible channel count")
        # Per-level packing factors. Level 0 always runs unpacked (it hosts
        # conv_in and the attention-bearing mid block); attention levels
        # cannot pack (token grid changes).
        fs: list = [None] * n
        if self.s2d:
            fs[n - 1] = f0
            if self.s2d_levels == "all":
                for i in range(1, n - 1):
                    if not (self.attention_levels[i] and self.with_conditioning):
                        fs[i] = auto_factor(self.num_channels[i])
            elif self.s2d_levels != "finest":
                raise ValueError(f"unknown s2d_levels {self.s2d_levels!r}")
        res_blocks = _tuplify(self.num_res_blocks, n)
        head_channels = _tuplify(self.num_head_channels, n)

        policy = _conv_save_policy(self.remat_policy)
        res_cls = nn.remat(ResnetBlock, policy=policy) if self.remat else ResnetBlock
        # attention is NEVER remat-wrapped: flash attention's custom-VJP
        # residuals are invisible to checkpoint policies, so a remat'd
        # attention block re-runs the exp-roofline kernel in the backward
        # pass to regenerate ~10 MB of residuals (blocks.DownBlock notes).
        # MidBlock remats its two resnets internally for the same reason.
        attn_cls = SpatialTransformer
        mid_cls = functools.partial(
            MidBlock, remat_policy=self.remat_policy if self.remat else None
        )

        h = conv(self.num_channels[0], 3, 1, self.spatial_dims, dtype=self.dtype, name="conv_in")(z)

        h = mid_cls(
            spatial_dims=self.spatial_dims,
            in_channels=self.num_channels[0],
            norm_num_groups=self.norm_num_groups,
            norm_eps=self.norm_eps,
            with_conditioning=self.with_conditioning,
            num_head_channels=head_channels[0],
            transformer_num_layers=self.transformer_num_layers,
            cross_attention_dim=self.cross_attention_dim,
            upcast_attention=self.upcast_attention,
            dtype=self.dtype,
            name="mid",
        )(h, context, deterministic)

        for i in range(n):
            for j in range(res_blocks[i]):
                h = res_cls(
                    spatial_dims=self.spatial_dims,
                    out_channels=self.num_channels[i],
                    norm_num_groups=self.norm_num_groups,
                    norm_eps=self.norm_eps,
                    f_in=fs[i],
                    f_out=fs[i],
                    dtype=self.dtype,
                    name=f"up_{i}_resnet_{j}",
                )(h)
                if self.attention_levels[i] and self.with_conditioning:
                    n_heads, head_dim = heads_for(self.num_channels[i], head_channels[i])
                    h = attn_cls(
                        spatial_dims=self.spatial_dims,
                        in_channels=self.num_channels[i],
                        num_attention_heads=n_heads,
                        num_head_channels=head_dim,
                        num_layers=self.transformer_num_layers,
                        norm_num_groups=self.norm_num_groups,
                        norm_eps=self.norm_eps,
                        cross_attention_dim=self.cross_attention_dim,
                        upcast_attention=self.upcast_attention,
                        dtype=self.dtype,
                        name=f"up_{i}_attn_{j}",
                    )(h, context, deterministic)
            if i != n - 1:
                if self.resblock_updown:
                    h = ResnetBlock(
                        spatial_dims=self.spatial_dims,
                        out_channels=self.num_channels[i],
                        up=True,
                        norm_num_groups=self.norm_num_groups,
                        norm_eps=self.norm_eps,
                        f_in=fs[i],
                        f_out=fs[i + 1],
                        dtype=self.dtype,
                        name=f"up_{i}_upsampler",
                    )(h)
                elif fs[i + 1] is not None:
                    h = PackedUpsample(
                        out_channels=self.num_channels[i], f_in=fs[i], f_out=fs[i + 1],
                        dtype=self.dtype, name=f"up_{i}_upsampler",
                    )(h)
                else:
                    if fs[i] is not None:
                        h = depth_to_space(h, fs[i])
                    h = Upsample(
                        spatial_dims=self.spatial_dims,
                        use_conv=True,
                        out_channels=self.num_channels[i],
                        dtype=self.dtype,
                        name=f"up_{i}_upsampler",
                    )(h)

        if self.s2d:
            h = GroupNorm(
                self.norm_num_groups, self.norm_eps, packed=True,
                phases=phase_count(f0), name="out_norm",
            )(h)
            h = nn.silu(h)
            h = PackedConv(
                self.out_channels, 3, zero_init=True, factors=f0, dtype=self.dtype, name="conv_out"
            )(h)
            return depth_to_space(h, f0)
        h = GroupNorm(self.norm_num_groups, self.norm_eps, name="out_norm")(h)
        h = nn.silu(h)
        return conv(
            self.out_channels, 3, 1, self.spatial_dims, zero_init=True, dtype=self.dtype, name="conv_out"
        )(h)


def _conv_save_policy(mode: str = "conv"):
    """named conv-save checkpoint policy (see models/blocks.py)."""
    from cips_tpu.models.blocks import conv_save_policy

    return conv_save_policy(mode)
