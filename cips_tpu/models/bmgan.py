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

from cips_tpu.models.blocks import (
    CONV2_SAVE_NAME,
    CONV_SAVE_NAME,
    PackedConv,
    conv_save_policy,
)
from cips_tpu.models.discriminator import PatchDiscriminator, _InstanceNorm
from cips_tpu.ops.s2d import (
    _env_choice,
    auto_factor,
    conv_transpose_k4s2,
    depth_to_space,
    phase_count,
    space_to_depth,
)
from jax.ad_checkpoint import checkpoint_name

# Up-path ConvTranspose lowering. "native" (default) is measured faster at
# both BMGAN up shapes; "subpixel" keeps the exact dense-k2 formulation
# available (probe_bmgan_segments A/B, BENCH_NOTES round 4).
_TCONV_IMPL = _env_choice("CIPS_BMGAN_TCONV", "native", ("native", "subpixel"))


class _SubpixelTConv(nn.Module):
    """nn.ConvTranspose(kernel=4, stride=2, SAME) with the SAME parameter
    tree ('kernel' (4,4,4,Cin,Cout) + 'bias'), computed as a dense k-2 conv
    + halo realign + depth_to_space (ops/s2d.conv_transpose_k4s2) — the
    input-dilated k-4 lowering runs 64 taps over an 87.5%-zero input on the
    MXU. Exact (bit-level vs nn.ConvTranspose, tests/test_s2d.py); 3-D only
    (2-D callers keep nn.ConvTranspose)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (4, 4, 4, cin, self.features), jnp.float32
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = conv_transpose_k4s2(x.astype(self.dtype), w.astype(self.dtype))
        return y + b.astype(y.dtype)


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


class _CatConv(nn.Module):
    """Convolution over the channel-concat of its inputs WITHOUT
    materialising the concat: the kernel is sliced along Cin and the
    partial convolutions summed (exact by linearity — the same treatment
    as the flagship's skip fusion, blocks.PackedConv tuple input).

    Parameter tree matches nn.Conv ((k..,Cin,Cout) 'kernel' + 'bias'), so
    checkpoints and the torch importer are unaffected. The dense-block
    concat chain was the dominant HBM temporary of the BMGAN generator.
    """

    spatial_dims: int
    features: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, *parts) -> jax.Array:
        cins = [p.shape[-1] for p in parts]
        k = self.kernel
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k,) * self.spatial_dims + (sum(cins), self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        pad = [( (k - 1) // 2, (k - 1) // 2 )] * self.spatial_dims
        dn = ("NDHWC", "DHWIO", "NDHWC") if self.spatial_dims == 3 else ("NHWC", "HWIO", "NHWC")
        y = None
        off = 0
        for part, ci in zip(parts, cins):
            wi = jax.lax.dynamic_slice_in_dim(w, off, ci, axis=self.spatial_dims)
            yi = jax.lax.conv_general_dilated(
                part.astype(self.dtype), wi.astype(self.dtype),
                (1,) * self.spatial_dims, pad, dimension_numbers=dn,
            )
            y = yi if y is None else y + yi
            off += ci
        return y + b.astype(y.dtype)


class _ResidualUnit(nn.Module):
    """MONAI ResidualUnit (monai.networks.blocks.convolutions semantics):
    ``subunits`` x (conv k3 -> InstanceNorm -> act) with the stride on the
    FIRST conv, plus a residual path — identity when shape-preserving, else
    a conv with kernel 1 (stride 1) or kernel 3 (strided), exactly MONAI's
    rkernel rule. ``act``: 'leakyrelu' (slope 0.2 — the ConvDenseBlock call
    sites, bmgan_model.py:14-21) or 'prelu' (the MONAI default the
    reference's ResNet_encoder units inherit, bmgan_model.py:118)."""

    spatial_dims: int
    features: int
    stride: int = 1
    subunits: int = 1
    act: str = "leakyrelu"
    dtype: jnp.dtype = jnp.float32

    def _apply_act(self, x: jax.Array, i: int) -> jax.Array:
        if self.act == "prelu":
            # torch nn.PReLU(): one shared learned slope, init 0.25
            a = self.param(f"prelu_{i}", nn.initializers.constant(0.25), (1,), jnp.float32)
            return jnp.where(x >= 0, x, a.astype(x.dtype) * x)
        return nn.leaky_relu(x, 0.2)

    @nn.compact
    def __call__(self, x) -> jax.Array:
        # tuple input == channel-concat of the parts without materialising
        # it: first conv and the residual conv slice their kernels (exact)
        parts = tuple(x) if isinstance(x, (tuple, list)) else None
        if parts is not None:
            assert self.stride == 1, "tuple input only on stride-1 dense units"
        h = x
        stride = self.stride
        for i in range(max(1, self.subunits)):
            cname, nname = ("conv", "norm") if i == 0 else (f"conv_{i}", f"norm_{i}")
            if i == 0 and parts is not None:
                h = _CatConv(self.spatial_dims, self.features, 3, dtype=self.dtype, name=cname)(*parts)
            else:
                h = _conv(self.spatial_dims, self.features, 3, stride, cname, self.dtype)(h)
            h = checkpoint_name(h, CONV_SAVE_NAME)
            h = _InstanceNorm(name=nname)(h)
            h = self._apply_act(h, i)
            stride = 1
        in_ch = sum(p.shape[-1] for p in parts) if parts is not None else x.shape[-1]
        if self.stride != 1 or in_ch != self.features:
            k = 1 if self.stride == 1 else 3
            if parts is not None:
                x = _CatConv(self.spatial_dims, self.features, k, dtype=self.dtype, name="skip")(*parts)
            else:
                x = _conv(self.spatial_dims, self.features, k, self.stride, "skip", self.dtype)(x)
        elif parts is not None:
            x = jnp.concatenate(parts, axis=-1)  # identity skip: concat unavoidable
        return x + h


class _DenseBlock(nn.Module):
    """Two dense steps: unit -> concat(input, out) -> 3x3 conv fuse -> IN -> LReLU.

    The concat never materialises: the fuse conv consumes (input..., unit
    output) as kernel-sliced parts (_CatConv), and a tuple input threads the
    up-path skip concat through the first unit the same way — the dense
    chain's concat temporaries were the generator's dominant HBM traffic."""

    spatial_dims: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> jax.Array:
        parts = tuple(x) if isinstance(x, (tuple, list)) else (x,)
        for i in range(2):
            y = _ResidualUnit(self.spatial_dims, self.features, dtype=self.dtype, name=f"unit_{i}")(
                parts if len(parts) > 1 else parts[0]
            )
            x = _CatConv(self.spatial_dims, self.features, 3, dtype=self.dtype, name=f"fuse_{i}")(
                *parts, y
            )
            x = checkpoint_name(x, CONV2_SAVE_NAME)
            x = _InstanceNorm(name=f"norm_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
            parts = (x,)
        return x


class DenseUNetGenerator(nn.Module):
    spatial_dims: int = 3
    latent_dim: int = 8
    input_conv_channel: int = 64
    output_conv_channel: int = 64
    down_channels: Sequence[int] = (128, 256, 256, 512)
    middle_channels: int = 512
    up_channels: Sequence[int] = (512, 256, 256, 256, 128)
    s2d: bool = True  # space-to-depth the full-resolution stem/head convs
    # with auto_factor(C) packing (64ch -> (2,1,1) = exactly 128 lanes);
    # exact math, identical parameters — the full-res C=64 tensors otherwise
    # pad 2x in HBM (ops/s2d.py)
    remat: bool = False  # rematerialise each dense block under the named
    # conv-save policy — halves the saved-activation set for batch >= 2
    remat_policy: str = "conv_all"
    dtype: jnp.dtype = jnp.float32

    def _dense(self, features: int, name: str):
        if self.remat:
            cls = nn.remat(_DenseBlock, policy=conv_save_policy(self.remat_policy))
        else:
            cls = _DenseBlock
        return cls(self.spatial_dims, features, dtype=self.dtype, name=name)

    def _stem_factors(self):
        if not self.s2d or self.spatial_dims != 3:
            return None
        return auto_factor(self.input_conv_channel)

    @nn.compact
    def __call__(self, x: jax.Array, latent: jax.Array) -> jax.Array:
        sd = self.spatial_dims
        # broadcast the latent over the volume and concatenate on channels
        # (reference bmgan_model.py:76-79)
        lat = latent.reshape(latent.shape[0], *([1] * sd), -1)
        lat = jnp.broadcast_to(lat, x.shape[:-1] + (latent.shape[-1],)).astype(x.dtype)
        h = jnp.concatenate([x, lat], axis=-1)

        f = self._stem_factors()
        # stem: two 3x3 convs then a stride-2 conv (/2)
        if f is not None:
            p = phase_count(f)
            h = space_to_depth(h, f)
            for i in range(2):
                h = PackedConv(
                    self.input_conv_channel, 3, factors=f, dtype=self.dtype, name=f"stem_{i}"
                )(h)
                h = _InstanceNorm(phases=p, name=f"stem_norm_{i}")(h)
                h = nn.leaky_relu(h, 0.2)
            # the stride-2 down conv absorbs the packing (its output grid is
            # the /2 grid): the depth_to_space relayout never materialises
            # and the contraction keeps full lanes (ops/s2d.packed_conv_strided)
            h = PackedConv(
                self.input_conv_channel, 3, factors=f, strided_output=True,
                dtype=self.dtype, name="stem_down",
            )(h)
        else:
            for i in range(2):
                h = _conv(sd, self.input_conv_channel, 3, 1, f"stem_{i}", self.dtype)(h)
                h = _InstanceNorm(name=f"stem_norm_{i}")(h)
                h = nn.leaky_relu(h, 0.2)
            h = _conv(sd, self.input_conv_channel, 3, 2, "stem_down", self.dtype)(h)
        h = _InstanceNorm(name="stem_down_norm")(h)
        h = nn.leaky_relu(h, 0.2)

        skips = [h]
        for i, c in enumerate(self.down_channels):
            h = self._dense(c, f"down_dense_{i}")(h)
            h = _conv(sd, c, 3, 2, f"down_conv_{i}", self.dtype)(h)
            h = _InstanceNorm(name=f"down_norm_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
            skips.append(h)

        h = self._dense(self.middle_channels, "middle")(h)

        for i, c in enumerate(self.up_channels):
            # skip concat threads into the dense block as kernel-sliced parts
            h = self._dense(c, f"up_dense_{i}")((h, skips[-1 - i]))
            if sd == 3 and _TCONV_IMPL == "subpixel":
                # measured SLOWER than XLA's native lowering at both up-path
                # shapes (fwd 14.4 vs 10.1 ms, grad 26.8 vs 13.3 ms at /2,
                # batch 1 — probe_bmgan_segments, BENCH_NOTES round 4):
                # XLA already phase-decomposes the input-dilated k4s2; kept
                # as an opt-in for future shape regimes.
                h = _SubpixelTConv(c, dtype=self.dtype, name=f"up_tconv_{i}")(h)
            else:
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

        f_out = (
            None
            if (not self.s2d or self.spatial_dims != 3)
            else auto_factor(self.output_conv_channel)
        )
        if f_out is not None:
            p = phase_count(f_out)
            h = space_to_depth(h, f_out)
            for i in range(2):
                h = PackedConv(
                    self.output_conv_channel, 3, factors=f_out, dtype=self.dtype, name=f"head_{i}"
                )(h)
                h = _InstanceNorm(phases=p, name=f"head_norm_{i}")(h)
                h = nn.leaky_relu(h, 0.2)
            h = PackedConv(1, 3, factors=f_out, dtype=self.dtype, name="head_out")(h)
            h = depth_to_space(h, f_out)
            return jnp.tanh(h)
        for i in range(2):
            h = _conv(sd, self.output_conv_channel, 3, 1, f"head_{i}", self.dtype)(h)
            h = _InstanceNorm(name=f"head_norm_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        h = _conv(sd, 1, 3, 1, "head_out", self.dtype)(h)
        return jnp.tanh(h)


class _PackedStridedResUnit(nn.Module):
    """`_ResidualUnit(stride=2, subunits=2, act='prelu')` consuming an
    f-packed input with the SAME parameter tree: the stride-2 convs (first
    subunit + skip) run as `packed_conv_strided` — the stride-2 output grid
    IS the packing cell grid, so the packed full-res tensor never unpacks
    and the strided convs contract full 128-lane channels (the encoder's
    full-res segments measured 10% MFU unpacked, probe_bmgan_enc_segments)."""

    spatial_dims: int
    features: int
    factors: Tuple[int, int, int] = (2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    def _prelu(self, x: jax.Array, i: int) -> jax.Array:
        a = self.param(f"prelu_{i}", nn.initializers.constant(0.25), (1,), jnp.float32)
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)

    @nn.compact
    def __call__(self, xp: jax.Array) -> jax.Array:
        assert self.spatial_dims == 3
        h = PackedConv(
            self.features, 3, factors=self.factors, strided_output=True,
            dtype=self.dtype, name="conv",
        )(xp)
        h = checkpoint_name(h, CONV_SAVE_NAME)
        h = _InstanceNorm(name="norm")(h)
        h = self._prelu(h, 0)
        h = _conv(3, self.features, 3, 1, "conv_1", self.dtype)(h)
        h = checkpoint_name(h, CONV_SAVE_NAME)
        h = _InstanceNorm(name="norm_1")(h)
        h = self._prelu(h, 1)
        x = PackedConv(
            self.features, 3, factors=self.factors, strided_output=True,
            dtype=self.dtype, name="skip",
        )(xp)
        return x + h


class ResNetEncoder(nn.Module):
    """PET -> latent Gaussian (mu, log_var), each ``latent_dim``-dimensional."""

    spatial_dims: int = 3
    input_layer_channel: int = 32
    channels: Sequence[int] = (64, 128, 128, 128, 128, 128)
    latent_dim: int = 8
    s2d: bool = True  # run the full-res stem + first strided unit in the
    # space-to-depth domain ((2,2,2) -> full lanes); exact, same parameters
    s2d_depth: int = 2  # how many strided res units consume a packed input
    # (1 = res_0 only; 2 also re-packs the half-res 64-channel tensor at
    # auto_factor(64)=(2,1,1) so res_1's strided convs contract 128 lanes).
    # Exact, identical parameter tree either way; default measured on TPU
    # (BENCH_NOTES round-5 encoder A/B: depth 2 3.378 vs depth 1 3.246 vs
    # unpacked 3.258 vol/s/chip — depth 1 is ~neutral, depth 2 is the win).
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        sd = self.spatial_dims
        use_s2d = (
            self.s2d and sd == 3 and all(d % 2 == 0 for d in x.shape[1:4])
        )
        if use_s2d:
            f = (2, 2, 2)
            h = space_to_depth(x, f)
            h = PackedConv(
                self.input_layer_channel, 3, factors=f, dtype=self.dtype, name="stem"
            )(h)
            h = _InstanceNorm(phases=phase_count(f), name="stem_norm")(h)
            h = nn.relu(h)
            h = _PackedStridedResUnit(
                sd, self.channels[0], factors=f, dtype=self.dtype, name="res_0"
            )(h)
            rest, offset = self.channels[1:], 1
            f1 = auto_factor(self.channels[0])
            if (
                self.s2d_depth >= 2
                and len(self.channels) >= 2
                and f1 is not None
                # packed axes need d % f == 0 for the s2d; unpacked axes need
                # even d for the clean stride-2 — both are "d even" (f <= 2)
                and all(d % 2 == 0 for d in h.shape[1:4])
            ):
                h = space_to_depth(h, f1)
                h = _PackedStridedResUnit(
                    sd, self.channels[1], factors=f1, dtype=self.dtype, name="res_1"
                )(h)
                rest, offset = self.channels[2:], 2
        else:
            h = _conv(sd, self.input_layer_channel, 3, 1, "stem", self.dtype)(x)
            h = _InstanceNorm(name="stem_norm")(h)
            h = nn.relu(h)
            rest, offset = self.channels, 0
        for i, c in enumerate(rest):
            # reference: ResidualUnit(3, cur, c, strides=2, padding=1) with
            # MONAI defaults — subunits=2, PReLU act (bmgan_model.py:118)
            h = _ResidualUnit(
                sd, c, stride=2, subunits=2, act="prelu", dtype=self.dtype, name=f"res_{i + offset}"
            )(h)
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
