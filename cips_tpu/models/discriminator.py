"""PatchDiscriminator — pix2pix-style 3-D PatchGAN.

Rebuild of the MONAI-generative `PatchDiscriminator` every adversarial
trainer in the reference instantiates (`unet/scripts/train_unet.py:19,74`,
`bl_methods/BMGAN/bmgan_model.py:133-144`): `num_layers_d` stride-2 convs
with doubling channels, InstanceNorm + LeakyReLU(0.2), then a stride-1
conv and a 1-channel patch-logit head. Returns the list of intermediate
feature maps with the logits last — callers take `[-1]`
(`train_unet.py:154`).

Channels-last (N, *spatial, C); InstanceNorm is per-sample GroupNorm with
one group per channel, computed in fp32.
"""

from __future__ import annotations

from functools import partial
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _in_core(xr: jax.Array, scale: jax.Array, bias: jax.Array, p: int, eps: float) -> jax.Array:
    """Instance-norm over ``xr`` of shape (B, S, P*C): per-(batch, channel)
    stats over spatial AND the P space-to-depth phases (so the result equals
    InstanceNorm on the full-resolution tensor with the same (C,) params).

    Stats accumulate in fp32 with the converts fused into the reductions; the
    apply is one fused x*w + off pass in the activation dtype. The hand
    backward (see ``_in_core_bwd``) is two fused reductions + one FMA pass —
    XLA autodiff of the stats graph materialised an fp32 broadcast chain
    (pad/convert fusion tail) that dominated the BMGAN G backward."""
    y, _ = _in_fwd(xr, scale, bias, p, eps)
    return y


def _in_fwd(xr, scale, bias, p, eps):
    b = xr.shape[0]
    c = xr.shape[-1] // p
    x32 = xr.astype(jnp.float32)
    s1 = jnp.mean(x32, axis=1)  # (B, P*C); convert fused into reduce
    s2 = jnp.mean(jnp.square(x32), axis=1)
    if p > 1:
        s1 = s1.reshape(b, p, c).mean(axis=1)  # (B, C)
        s2 = s2.reshape(b, p, c).mean(axis=1)
    inv = jax.lax.rsqrt(jnp.maximum(s2 - jnp.square(s1), 0.0) + eps)
    w = inv * scale[None]  # (B, C)
    off = bias[None] - s1 * w
    if p > 1:
        w, off = jnp.tile(w, (1, p)), jnp.tile(off, (1, p))
    y = xr * w[:, None, :].astype(xr.dtype) + off[:, None, :].astype(xr.dtype)
    return y, (xr, scale, s1, inv)


def _in_core_bwd(p, eps, res, g):
    xr, scale, mu, inv = res
    b = xr.shape[0]
    c = xr.shape[-1] // p
    n = xr.shape[1] * p  # voxels per (batch, channel)
    sum_g = jnp.sum(g.astype(jnp.float32), axis=1)  # (B, P*C)
    sum_gx = jnp.sum((g * xr).astype(jnp.float32), axis=1)
    if p > 1:
        sum_g = sum_g.reshape(b, p, c).sum(axis=1)  # (B, C)
        sum_gx = sum_gx.reshape(b, p, c).sum(axis=1)
    mean_g = sum_g / n
    centered = sum_gx - mu * sum_g  # = n * mean(g * (x - mu))
    a = scale[None] * inv  # (B, C) fp32 coefficients of dx = a*g + bb*x + cc
    bb = -(scale[None] * inv**3) * centered / n
    cc = -a * mean_g - bb * mu
    d_scale = jnp.sum(inv * centered, axis=0)  # (C,)
    d_bias = jnp.sum(sum_g, axis=0)
    if p > 1:
        a, bb, cc = (jnp.tile(t, (1, p)) for t in (a, bb, cc))
    dx = (
        g * a[:, None, :].astype(g.dtype)
        + xr * bb[:, None, :].astype(g.dtype)
        + cc[:, None, :].astype(g.dtype)
    )
    return dx, d_scale, d_bias


_in_core.defvjp(lambda xr, scale, bias, p, eps: _in_fwd(xr, scale, bias, p, eps), _in_core_bwd)


class _InstanceNorm(nn.Module):
    """Instance norm with fp32 statistics and activation-dtype apply.

    Moments accumulate in fp32 with the converts fused into the reductions
    (per-(batch, channel) over spatial — the channel lanes stay intact), and
    the normalisation is one fused x*w + b pass in the activation dtype; no
    fp32 copy of the tensor is materialised (the same treatment that cut
    ~20% off the flagship step in blocks.GroupNorm). The backward is a
    hand-written VJP (``_in_core``): two fused reductions + one FMA pass."""

    epsilon: float = 1e-5
    phases: int = 1  # >1: input is a space-to-depth packing with P phases —
    # the phase axis counts as spatial, so the result equals InstanceNorm on
    # the full-resolution tensor with the same (C,) parameters

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.phases
        c = x.shape[-1] // p
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xr = x.reshape(x.shape[0], -1, x.shape[-1])
        y = _in_core(xr, scale, bias, p, self.epsilon)
        return y.reshape(x.shape)


class PatchDiscriminator(nn.Module):
    spatial_dims: int = 3
    num_channels: int = 64
    in_channels: int = 1
    out_channels: int = 1
    num_layers_d: int = 3
    kernel_size: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        k = self.kernel_size
        pad = [( (k - 1) // 2, (k - 1) // 2 )] * self.spatial_dims

        def conv(features, stride, name):
            return nn.Conv(
                features,
                kernel_size=(k,) * self.spatial_dims,
                strides=(stride,) * self.spatial_dims,
                padding=pad,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=name,
            )

        features: List[jax.Array] = []
        h = conv(self.num_channels, 2, "conv_0")(x)
        h = nn.leaky_relu(h, 0.2)
        features.append(h)

        ch = self.num_channels
        for i in range(1, self.num_layers_d):
            ch = min(ch * 2, 512)
            h = conv(ch, 2, f"conv_{i}")(h)
            h = _InstanceNorm(name=f"norm_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
            features.append(h)

        ch = min(ch * 2, 512)
        h = conv(ch, 1, "conv_penultimate")(h)
        h = _InstanceNorm(name="norm_penultimate")(h)
        h = nn.leaky_relu(h, 0.2)
        features.append(h)

        logits = conv(self.out_channels, 1, "conv_out")(h)
        if 0 in logits.shape:
            # same loud failure as BMGANDiscriminator: an empty patch map
            # otherwise flows into a mean() and surfaces as a silent NaN loss
            raise ValueError(
                f"empty patch-logit map {logits.shape}: input too small for "
                f"num_layers_d={self.num_layers_d} (k={self.kernel_size})"
            )
        features.append(logits)
        return features
