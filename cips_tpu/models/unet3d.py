"""UnetGenerator3d — legacy pix2pix-style recursive 3-D UNet.

Rebuild of `unet/utils/unet_model.py:5-99`: nested skip-connection blocks;
down = Conv(k4, s2) [+ LeakyReLU(0.2) + norm]; up = nearest x2 upsample +
Conv(k3) after ReLU [+ norm]; skip = channel concat; Tanh output. The
reference keeps it as the simple/legacy generator (configured via
`unet_def` in unet/config/training.json:2-6, no in-repo trainer uses it);
we keep it for the same completeness. BatchNorm is replaced by instance
norm — batch statistics don't interact well with per-device data-parallel
batches of 2, and the reference's own modern models all use group/instance
norms.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from cips_tpu.models.blocks import nearest_upsample_2x
from cips_tpu.models.discriminator import _InstanceNorm


class _SkipBlock(nn.Module):
    outer_nc: int
    inner_nc: int
    depth: int  # how many nested levels remain below this one
    inner_channels: tuple
    outermost: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def conv(features, kernel, stride, name):
            pad = 1
            return nn.Conv(
                features,
                kernel_size=(kernel,) * 3,
                strides=(stride,) * 3,
                padding=[(pad, pad)] * 3,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=name,
            )

        h = x
        if not self.outermost:
            h = nn.leaky_relu(h, 0.2)
        h = conv(self.inner_nc, 4, 2, "downconv")(h)
        innermost = self.depth == 0
        if not self.outermost and not innermost:
            h = _InstanceNorm(name="downnorm")(h)

        if not innermost:
            h = _SkipBlock(
                outer_nc=self.inner_nc,
                inner_nc=self.inner_channels[0],
                depth=self.depth - 1,
                inner_channels=self.inner_channels[1:],
                dtype=self.dtype,
                name="submodule",
            )(h)

        h = nn.relu(h)
        h = nearest_upsample_2x(h)
        h = conv(self.outer_nc, 3, 1, "upconv")(h)
        if self.outermost:
            return jnp.tanh(h)
        h = _InstanceNorm(name="upnorm")(h)
        return jnp.concatenate([h, x], axis=-1)


class UnetGenerator3d(nn.Module):
    input_nc: int = 1
    output_nc: int = 1
    num_downs: int = 4
    ngf: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # channel ladder mirroring unet_model.py:14-24: innermost at ngf*8,
        # widening toward the outside.
        ngf = self.ngf
        if self.num_downs >= 5:
            ladder = [ngf, ngf * 2, ngf * 4, ngf * 8]
            ladder += [ngf * 8] * (self.num_downs - 5)
            ladder += [ngf * 8]
        else:
            ladder = [ngf * 2, ngf * 4, ngf * 8][: self.num_downs - 1]
            ladder += [ngf * 8]
        return _SkipBlock(
            outer_nc=self.output_nc,
            inner_nc=ladder[0],
            depth=self.num_downs - 1,
            inner_channels=tuple(ladder[1:]),
            outermost=True,
            dtype=self.dtype,
            name="model",
        )(x)
