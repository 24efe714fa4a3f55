"""AutoencoderKL and its standalone Decoder (KL-VAE for T1 anatomy).

Rebuild of the external MONAI-generative `AutoencoderKL` / `Decoder` the
causal workload imports (`causal_synthesis/scripts/train_unify_causal_gen.py:7,110`
constructs the standalone Decoder; `gen_test_unify_causal.py:5,68` uses the
full AutoencoderKL whose forward returns `(recon, z_mu, z_sigma)` at :124).

Layout: ``num_channels`` is fine-to-coarse. The encoder downsamples
len(num_channels)-1 times; the decoder mirrors it. With the causal config's
3-level lists both sides run at the same 1/4-resolution latent as the
spatial DiffusionModelEncoder, so all causal-pipeline components compose.
(The reference's 4-level decoder config against a 1/4-res latent is a shape
inconsistency in its external-package wiring; we keep the configs coherent.)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cips_tpu.models.blocks import AttentionBlock, GroupNorm, PackedConv, PackedUpsample, ResnetBlock, Upsample, conv
from cips_tpu.ops.s2d import auto_factor, depth_to_space, phase_count


def _tuplify(v, n: int) -> Tuple:
    if isinstance(v, (int, float, bool)):
        return (v,) * n
    return tuple(v)


class Encoder(nn.Module):
    """VAE encoder: stem -> per-level resnets + stride-2 downsample -> moments."""

    spatial_dims: int = 3
    in_channels: int = 1
    latent_channels: int = 3
    num_channels: Sequence[int] = (32, 64, 64)
    num_res_blocks: Sequence[int] | int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    with_nonlocal_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        n = len(self.num_channels)
        res_blocks = _tuplify(self.num_res_blocks, n)
        h = conv(self.num_channels[0], 3, 1, self.spatial_dims, dtype=self.dtype, name="conv_in")(x)
        for i in range(n):
            for j in range(res_blocks[i]):
                h = ResnetBlock(
                    spatial_dims=self.spatial_dims,
                    out_channels=self.num_channels[i],
                    norm_num_groups=self.norm_num_groups,
                    norm_eps=self.norm_eps,
                    dtype=self.dtype,
                    name=f"down_{i}_res_{j}",
                )(h)
            if i != n - 1:
                h = conv(
                    self.num_channels[i], 3, 2, self.spatial_dims, dtype=self.dtype, name=f"down_{i}_ds"
                )(h)
        if self.with_nonlocal_attn:
            h = ResnetBlock(
                spatial_dims=self.spatial_dims,
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                name="mid_res_1",
            )(h)
            h = AttentionBlock(
                spatial_dims=self.spatial_dims,
                num_channels=self.num_channels[-1],
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                name="mid_attn",
            )(h)
            h = ResnetBlock(
                spatial_dims=self.spatial_dims,
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                name="mid_res_2",
            )(h)
        h = GroupNorm(self.norm_num_groups, self.norm_eps, name="out_norm")(h)
        h = nn.silu(h)
        mu = conv(self.latent_channels, 3, 1, self.spatial_dims, dtype=self.dtype, name="conv_mu")(h)
        log_var = conv(
            self.latent_channels, 3, 1, self.spatial_dims, dtype=self.dtype, name="conv_log_var"
        )(h)
        return mu, log_var


class Decoder(nn.Module):
    """VAE decoder: latent stem -> per-level resnets + nearest-up conv -> volume.

    Constructor keys follow the reference's decoder config
    (causal_synthesis/configs/training_causal.json:32-53).
    """

    spatial_dims: int = 3
    in_channels: int = 3
    out_channels: int = 1
    num_channels: Sequence[int] = (32, 64, 64)
    num_res_blocks: Sequence[int] | int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    attention_levels: Sequence[bool] | None = None
    with_encoder_nonlocal_attn: bool = False  # config parity; encoder-side flag
    with_decoder_nonlocal_attn: bool = False
    remat: bool = False  # jax.checkpoint resnet stages
    remat_policy: str = "conv"  # see models/blocks.conv_save_policy
    s2d: bool = False  # space-to-depth finest level (exact)
    # "finest" (measured default) or "all": also pack attention-free
    # non-finest levels whose channel count admits a factor (decoder.py).
    s2d_levels: str = "finest"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        n = len(self.num_channels)
        res_blocks = _tuplify(self.num_res_blocks, n)
        rev_channels = list(reversed(self.num_channels))
        rev_res = list(reversed(res_blocks))
        res_cls = nn.remat(ResnetBlock, policy=_conv_save_policy(self.remat_policy)) if self.remat else ResnetBlock

        h = conv(rev_channels[0], 3, 1, self.spatial_dims, dtype=self.dtype, name="conv_in")(z)
        if self.with_decoder_nonlocal_attn:
            h = ResnetBlock(
                spatial_dims=self.spatial_dims,
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                name="mid_res_1",
            )(h)
            h = AttentionBlock(
                spatial_dims=self.spatial_dims,
                num_channels=rev_channels[0],
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                name="mid_attn",
            )(h)
            h = ResnetBlock(
                spatial_dims=self.spatial_dims,
                norm_num_groups=self.norm_num_groups,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                name="mid_res_2",
            )(h)
        f0 = auto_factor(rev_channels[-1]) if self.s2d else None
        if self.s2d and f0 is None:
            raise ValueError("s2d finest level needs a 128-lane-compatible channel count")
        # Per-level factors (decoder.py convention): level 0 stays unpacked
        # (conv_in / optional nonlocal attention live there).
        fs: list = [None] * n
        if self.s2d:
            fs[n - 1] = f0
            if self.s2d_levels == "all":
                for i in range(1, n - 1):
                    fs[i] = auto_factor(rev_channels[i])
            elif self.s2d_levels != "finest":
                raise ValueError(f"unknown s2d_levels {self.s2d_levels!r}")
        for i in range(n):
            for j in range(rev_res[i]):
                h = res_cls(
                    spatial_dims=self.spatial_dims,
                    out_channels=rev_channels[i],
                    norm_num_groups=self.norm_num_groups,
                    norm_eps=self.norm_eps,
                    f_in=fs[i],
                    f_out=fs[i],
                    dtype=self.dtype,
                    name=f"up_{i}_res_{j}",
                )(h)
            if i != n - 1:
                if fs[i + 1] is not None:
                    h = PackedUpsample(
                        out_channels=rev_channels[i], f_in=fs[i], f_out=fs[i + 1],
                        dtype=self.dtype, name=f"up_{i}_us",
                    )(h)
                else:
                    if fs[i] is not None:
                        h = depth_to_space(h, fs[i])
                    h = Upsample(
                        spatial_dims=self.spatial_dims,
                        use_conv=True,
                        out_channels=rev_channels[i],
                        dtype=self.dtype,
                        name=f"up_{i}_us",
                    )(h)
        if self.s2d:
            h = GroupNorm(
                self.norm_num_groups, self.norm_eps, packed=True,
                phases=phase_count(f0), name="out_norm",
            )(h)
            h = nn.silu(h)
            h = PackedConv(self.out_channels, 3, factors=f0, dtype=self.dtype, name="conv_out")(h)
            return depth_to_space(h, f0)
        h = GroupNorm(self.norm_num_groups, self.norm_eps, name="out_norm")(h)
        h = nn.silu(h)
        return conv(self.out_channels, 3, 1, self.spatial_dims, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """Full KL-VAE; __call__ returns (reconstruction, z_mu, z_sigma)."""

    spatial_dims: int = 3
    in_channels: int = 1
    out_channels: int = 1
    latent_channels: int = 3
    num_channels: Sequence[int] = (32, 64, 64)
    num_res_blocks: Sequence[int] | int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    attention_levels: Sequence[bool] | None = None
    with_encoder_nonlocal_attn: bool = False
    with_decoder_nonlocal_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            spatial_dims=self.spatial_dims,
            in_channels=self.in_channels,
            latent_channels=self.latent_channels,
            num_channels=self.num_channels,
            num_res_blocks=self.num_res_blocks,
            norm_num_groups=self.norm_num_groups,
            norm_eps=self.norm_eps,
            with_nonlocal_attn=self.with_encoder_nonlocal_attn,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            spatial_dims=self.spatial_dims,
            in_channels=self.latent_channels,
            out_channels=self.out_channels,
            num_channels=self.num_channels,
            num_res_blocks=self.num_res_blocks,
            norm_num_groups=self.norm_num_groups,
            norm_eps=self.norm_eps,
            with_decoder_nonlocal_attn=self.with_decoder_nonlocal_attn,
            dtype=self.dtype,
        )

    def encode(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        mu, log_var = self.encoder(x)
        sigma = jnp.exp(0.5 * log_var)
        return mu, sigma

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(z)

    def __call__(
        self, x: jax.Array, rng: Optional[jax.Array] = None
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        mu, sigma = self.encode(x)
        if rng is not None:
            z = mu + sigma * jax.random.normal(rng, sigma.shape, sigma.dtype)
        else:
            z = mu
        return self.decode(z), mu, sigma


def _conv_save_policy(mode: str = "conv"):
    """named conv-save checkpoint policy (see models/blocks.py)."""
    from cips_tpu.models.blocks import conv_save_policy

    return conv_save_policy(mode)
