"""AttenUNet — the T1->PET conditional generator.

TPU-native re-design of the reference's main synthesis model
(`unet/utils/atten_unet_model.py:1575-1860`, built by
`unet/scripts/train_unet.py:61-70` from `unet/config/training.json`):
a 3-D UNet whose coarse levels run cross-attention between flattened voxel
tokens and the tabular causal-covariate vector. No timestep embedding — the
reference strips the diffusion-time path from its forward.

Constructor keywords match the reference JSON config schema so
`AttenUNet(**cfg["atten_unet_def"], cross_attention_dim=n)` works verbatim.
Activations are channels-last (N, D, H, W, C).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cips_tpu.models.blocks import (
    DownBlock,
    GroupNorm,
    MidBlock,
    PackedConv,
    UpBlock,
    attention_mode,
    conv,
)
from cips_tpu.ops.s2d import F8, Factors, depth_to_space, phase_count, space_to_depth


def _tuplify(v, n: int) -> Tuple:
    if isinstance(v, (int, float, bool)):
        return (v,) * n
    return tuple(v)


class AttenUNet(nn.Module):
    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 1
    num_res_blocks: Sequence[int] | int = (2, 2, 2, 2)
    num_channels: Sequence[int] = (32, 64, 64, 64)
    attention_levels: Sequence[bool] = (False, False, True, True)
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    resblock_updown: bool = False
    num_head_channels: Sequence[int] | int = 8
    with_conditioning: bool = False
    transformer_num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    num_class_embeds: Optional[int] = None
    upcast_attention: bool = False
    use_flash_attention: bool = False  # accepted for config parity; Pallas dispatch is automatic
    dropout_cattn: float = 0.0
    remat: bool = False  # jax.checkpoint each block: ~4x less activation HBM, ~1.3x FLOPs
    remat_skip_coarsest: int = 0  # store (not remat) the N coarsest levels + mid: their
    # activations are tiny but their recompute is not free
    remat_policy: Optional[str] = None  # None = recompute whole blocks; "conv" =
    # save conv outputs (blocks.CONV_SAVE_NAME), recompute only the cheap
    # elementwise chain between them — backward keeps the MXU work single-pass;
    # "conv2" = save only each block's final conv (half the saved HBM,
    # backward re-runs conv1/skip once per block — the batch-12/16 enabler)
    s2d: bool = False  # space-to-depth fine levels: exact math, 128-lane tensors (BENCH_NOTES.md)
    s2d_factors: Optional[Sequence[Optional[Factors]]] = None  # per-level packing factor
    # tuples (None = unpacked). Default when s2d=True: level 0 (2,2,2), level 1
    # (2,2,1) when it is attention-free and not the coarsest level — i.e. the
    # factors that make the flagship's 16/32-channel levels exactly 128-lane.
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        n = len(self.num_channels)
        if self.with_conditioning and self.cross_attention_dim is None:
            raise ValueError("with_conditioning=True requires cross_attention_dim")
        if self.cross_attention_dim is not None and not self.with_conditioning:
            raise ValueError("cross_attention_dim requires with_conditioning=True")
        if any(c % self.norm_num_groups for c in self.num_channels):
            raise ValueError("all num_channels must be multiples of norm_num_groups")
        if len(self.attention_levels) != n:
            raise ValueError("attention_levels must match num_channels length")
        self._res_blocks = _tuplify(self.num_res_blocks, n)
        self._head_channels = _tuplify(self.num_head_channels, n)
        if self.s2d:
            if self.spatial_dims != 3 or n < 2:
                raise ValueError("s2d requires 3-D volumes and >= 2 levels")
            if self.attention_levels[0]:
                raise ValueError("s2d level 0 cannot carry attention")
            if not self.resblock_updown:
                raise ValueError("s2d requires resblock_updown=True")
        factors = self.level_factors()
        for i, f in enumerate(factors):
            if f is None:
                continue
            if self.attention_levels[i]:
                raise ValueError(f"s2d level {i} cannot carry attention")
            if i == n - 1:
                raise ValueError("the coarsest level (mid block) cannot be packed")

    def level_factors(self) -> Tuple[Optional[Factors], ...]:
        """Per-level packing factors; index i = level i (finest first)."""
        n = len(self.num_channels)
        if not self.s2d:
            return (None,) * n
        if self.s2d_factors is not None:
            fs = tuple(tuple(f) if f is not None else None for f in self.s2d_factors)
            return fs + (None,) * (n - len(fs))
        # default: pack level 0 at (2,2,2) and — since the fold-tile
        # transition landed (ops/s2d.repack_tile_compact) — level 1 at
        # (2,2,1) when it is attention-free and not the coarsest level:
        # 16.75 vol/s/chip at the flagship batch-16 optimum vs 13.27 for
        # L0-only on v5e (BENCH_NOTES round-4; pre-fold the L1 repack
        # transitions measured net-negative, probe_l1_pack.py).
        if n > 2 and not self.attention_levels[1]:
            return (F8, (2, 2, 1)) + (None,) * (n - 2)
        return (F8,) + (None,) * (n - 1)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        down_block_additional_residuals: Optional[Sequence[jax.Array]] = None,
        mid_block_additional_residual: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        if context is not None and not self.with_conditioning:
            raise ValueError("context requires with_conditioning=True")
        n = len(self.num_channels)
        res_blocks = _tuplify(self.num_res_blocks, n)
        head_channels = _tuplify(self.num_head_channels, n)

        factors = self.level_factors()
        if factors[0] is not None:
            x = space_to_depth(x, factors[0])
            h = PackedConv(
                self.num_channels[0], 3, factors=factors[0], dtype=self.dtype, name="conv_in"
            )(x)
        else:
            h = conv(self.num_channels[0], 3, 1, self.spatial_dims, dtype=self.dtype, name="conv_in")(x)

        # remat: recompute block interiors in the backward pass; only block
        # boundaries (the skip tensors) stay live in HBM. With
        # remat_policy="conv", conv outputs are additionally saved so the
        # backward recompute is elementwise-only (GN/SiLU/concat).
        skip = self.remat_skip_coarsest
        policy = None
        if self.remat_policy is not None:
            from cips_tpu.models.blocks import conv_save_policy

            policy = conv_save_policy(self.remat_policy)

        def down_cls(i):
            return (
                nn.remat(DownBlock, static_argnums=(3,), policy=policy)
                if (self.remat and i < n - skip)
                else DownBlock
            )
        mid_cls = (
            nn.remat(MidBlock, static_argnums=(3,), policy=policy)
            if (self.remat and skip == 0)
            else MidBlock
        )
        def up_cls(i):  # up block i operates at level n-1-i (coarse first)
            return (
                nn.remat(UpBlock, static_argnums=(4,), policy=policy)
                if (self.remat and i >= skip)
                else UpBlock
            )

        # down path — collect skip residuals, starting with the stem output
        # (reference: atten_unet_model.py:1822-1829)
        residuals = [h]
        for i in range(n):
            is_final = i == n - 1
            h, outs = down_cls(i)(
                spatial_dims=self.spatial_dims,
                out_channels=self.num_channels[i],
                num_res_blocks=res_blocks[i],
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                add_downsample=not is_final,
                resblock_updown=self.resblock_updown,
                attention_mode=attention_mode(self.attention_levels[i], self.with_conditioning),
                num_head_channels=head_channels[i],
                transformer_num_layers=self.transformer_num_layers,
                cross_attention_dim=self.cross_attention_dim,
                upcast_attention=self.upcast_attention,
                dropout_cattn=self.dropout_cattn,
                factors=factors[i],
                factors_down=factors[i + 1] if not is_final else None,
                dtype=self.dtype,
                name=f"down_{i}",
            )(h, context, deterministic)
            residuals.extend(outs)

        # ControlNet-style additional residual hooks (reference :1832-1847)
        if down_block_additional_residuals is not None:
            residuals = [r + extra for r, extra in zip(residuals, down_block_additional_residuals)]

        h = mid_cls(
            spatial_dims=self.spatial_dims,
            in_channels=self.num_channels[-1],
            norm_num_groups=self.norm_num_groups,
            norm_eps=self.norm_eps,
            with_conditioning=self.with_conditioning,
            num_head_channels=head_channels[-1],
            transformer_num_layers=self.transformer_num_layers,
            cross_attention_dim=self.cross_attention_dim,
            upcast_attention=self.upcast_attention,
            dropout_cattn=self.dropout_cattn,
            dtype=self.dtype,
            name="mid",
        )(h, context, deterministic)

        if mid_block_additional_residual is not None:
            h = h + mid_block_additional_residual

        # up path — each block consumes (num_res_blocks + 1) skip residuals
        # (reference :1744-1771, :1851-1855)
        rev_channels = list(reversed(self.num_channels))
        rev_res = list(reversed(res_blocks))
        rev_attn = list(reversed(self.attention_levels))
        rev_heads = list(reversed(head_channels))
        for i in range(n):
            is_final = i == n - 1
            take = rev_res[i] + 1
            skips, residuals = residuals[-take:], residuals[:-take]
            h = up_cls(i)(
                spatial_dims=self.spatial_dims,
                out_channels=rev_channels[i],
                num_res_blocks=take,
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                add_upsample=not is_final,
                resblock_updown=self.resblock_updown,
                attention_mode=attention_mode(rev_attn[i], self.with_conditioning),
                num_head_channels=rev_heads[i],
                transformer_num_layers=self.transformer_num_layers,
                cross_attention_dim=self.cross_attention_dim,
                upcast_attention=self.upcast_attention,
                dropout_cattn=self.dropout_cattn,
                factors=factors[n - 1 - i],
                factors_up=factors[n - 2 - i] if not is_final else None,
                dtype=self.dtype,
                name=f"up_{i}",
            )(h, skips, context, deterministic)

        if factors[0] is not None:
            h = GroupNorm(
                self.norm_num_groups, self.norm_eps, packed=True,
                phases=phase_count(factors[0]), name="out_norm",
            )(h)
            h = nn.silu(h)
            h = PackedConv(
                self.out_channels, 3, zero_init=True, factors=factors[0], dtype=self.dtype, name="conv_out"
            )(h)
            return depth_to_space(h, factors[0])
        h = GroupNorm(self.norm_num_groups, self.norm_eps, name="out_norm")(h)
        h = nn.silu(h)
        h = conv(
            self.out_channels, 3, 1, self.spatial_dims, zero_init=True, dtype=self.dtype, name="conv_out"
        )(h)
        return h
