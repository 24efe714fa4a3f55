"""BMGAN — bidirectional-mapping GAN baseline (T1 -> PET with latent code).

Rebuild of `bl_methods/BMGAN/bmgan_model.py`:
  * DenseUNetGenerator (:25-101): T1 concatenated with a spatially-broadcast
    8-dim latent (9 input channels) through a dense-block UNet —
    down channels [128,256,256,512], transposed-conv ups, Tanh output;
  * ResNetEncoder (:103-130): PET -> 6 stride-2 residual units -> two linear
    heads (mu, log_var) — the bidirectional mapping E;
  * BMGANDiscriminator (:133-144): PatchDiscriminator(3, 32, 1, num_layers_d=4)
    returning only the final patch-logit map.

Dense blocks follow the MONAI ConvDenseBlock recipe (unit output concatenated
with its input, then fused by a 3x3 conv + InstanceNorm + LeakyReLU); the
inner unit is a strided-free residual conv unit. Channels-last throughout.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cips_tpu.models.discriminator import PatchDiscriminator, _InstanceNorm


def _conv(spatial_dims, features, kernel=3, stride=1, name=None, dtype=jnp.float32):
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        kernel_size=(kernel,) * spatial_dims,
        strides=(stride,) * spatial_dims,
        padding=[(pad, pad)] * spatial_dims,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class _ResidualUnit(nn.Module):
    """MONAI-style ResidualUnit: conv/norm/act with a (1x1) residual path."""

    spatial_dims: int
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = _conv(self.spatial_dims, self.features, 3, self.stride, "conv", self.dtype)(x)
        h = _InstanceNorm(name="norm")(h)
        h = nn.leaky_relu(h, 0.2)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = _conv(self.spatial_dims, self.features, 1, self.stride, "skip", self.dtype)(x)
        return x + h


class _DenseBlock(nn.Module):
    """Two dense steps: unit -> concat(input, out) -> 3x3 conv fuse -> IN -> LReLU."""

    spatial_dims: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(2):
            y = _ResidualUnit(self.spatial_dims, self.features, dtype=self.dtype, name=f"unit_{i}")(x)
            x = jnp.concatenate([x, y], axis=-1)
            x = _conv(self.spatial_dims, self.features, 3, 1, f"fuse_{i}", self.dtype)(x)
            x = _InstanceNorm(name=f"norm_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        return x


class DenseUNetGenerator(nn.Module):
    spatial_dims: int = 3
    latent_dim: int = 8
    input_conv_channel: int = 64
    output_conv_channel: int = 64
    down_channels: Sequence[int] = (128, 256, 256, 512)
    middle_channels: int = 512
    up_channels: Sequence[int] = (512, 256, 256, 256, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, latent: jax.Array) -> jax.Array:
        sd = self.spatial_dims
        # broadcast the latent over the volume and concatenate on channels
        # (reference bmgan_model.py:76-79)
        lat = latent.reshape(latent.shape[0], *([1] * sd), -1)
        lat = jnp.broadcast_to(lat, x.shape[:-1] + (latent.shape[-1],)).astype(x.dtype)
        h = jnp.concatenate([x, lat], axis=-1)

        # stem: two 3x3 convs then a stride-2 conv (/2)
        for i in range(2):
            h = _conv(sd, self.input_conv_channel, 3, 1, f"stem_{i}", self.dtype)(h)
            h = _InstanceNorm(name=f"stem_norm_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        h = _conv(sd, self.input_conv_channel, 3, 2, "stem_down", self.dtype)(h)
        h = _InstanceNorm(name="stem_down_norm")(h)
        h = nn.leaky_relu(h, 0.2)

        skips = [h]
        for i, c in enumerate(self.down_channels):
            h = _DenseBlock(sd, c, dtype=self.dtype, name=f"down_dense_{i}")(h)
            h = _conv(sd, c, 3, 2, f"down_conv_{i}", self.dtype)(h)
            h = _InstanceNorm(name=f"down_norm_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
            skips.append(h)

        h = _DenseBlock(sd, self.middle_channels, dtype=self.dtype, name="middle")(h)

        for i, c in enumerate(self.up_channels):
            h = jnp.concatenate([h, skips[-1 - i]], axis=-1)
            h = _DenseBlock(sd, c, dtype=self.dtype, name=f"up_dense_{i}")(h)
            h = nn.ConvTranspose(
                c,
                kernel_size=(4,) * sd,
                strides=(2,) * sd,
                padding="SAME",  # exact x2 doubling, == torch ConvTranspose(k4,s2,p1)
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"up_tconv_{i}",
            )(h)
            h = _InstanceNorm(name=f"up_norm_{i}")(h)
            h = nn.leaky_relu(h, 0.2)

        for i in range(2):
            h = _conv(sd, self.output_conv_channel, 3, 1, f"head_{i}", self.dtype)(h)
            h = _InstanceNorm(name=f"head_norm_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        h = _conv(sd, 1, 3, 1, "head_out", self.dtype)(h)
        return jnp.tanh(h)


class ResNetEncoder(nn.Module):
    """PET -> latent Gaussian (mu, log_var), each ``latent_dim``-dimensional."""

    spatial_dims: int = 3
    input_layer_channel: int = 32
    channels: Sequence[int] = (64, 128, 128, 128, 128, 128)
    latent_dim: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        sd = self.spatial_dims
        h = _conv(sd, self.input_layer_channel, 3, 1, "stem", self.dtype)(x)
        h = _InstanceNorm(name="stem_norm")(h)
        h = nn.relu(h)
        for i, c in enumerate(self.channels):
            h = _ResidualUnit(sd, c, stride=2, dtype=self.dtype, name=f"res_{i}")(h)
        h = h.reshape(h.shape[0], -1)
        mu = nn.Dense(self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32, name="mu")(h)
        log_var = nn.Dense(self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32, name="log_var")(h)
        return mu, log_var


class BMGANDiscriminator(nn.Module):
    """PatchDiscriminator(3, 32, 1, num_layers_d=4); returns the logit map only.

    num_layers_d=4 needs input extents >= 48 voxels for a non-empty patch
    map (4 stride-2 convs then two shrink-by-1 k4 convs) — fine at the
    (96, 128, 96) working volume."""

    spatial_dims: int = 3
    num_channels: int = 32
    num_layers_d: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        logits = PatchDiscriminator(
            spatial_dims=self.spatial_dims,
            num_channels=self.num_channels,
            in_channels=1,
            num_layers_d=self.num_layers_d,
            dtype=self.dtype,
            name="patch_d",
        )(x)[-1]
        if logits.size == 0:
            raise ValueError(
                f"empty patch-logit map {logits.shape}: input too small for "
                f"num_layers_d={self.num_layers_d}"
            )
        return logits
