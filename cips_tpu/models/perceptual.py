"""Perceptual (LPIPS) loss for 3-D volumes, 2.5-D slice-wise — reference-faithful.

Rebuild of MONAI-generative ``PerceptualLoss`` as used by every synthesis
trainer in the reference:
  * unet:   PerceptualLoss(spatial_dims=3, network_type="squeeze")
            (unet/scripts/train_unet.py:18,76; unet/config/training.json:48-50)
  * causal: same squeeze config, weight 0.02
            (causal_synthesis/scripts/train_unify_causal_gen.py:126,240)
  * BMGAN:  PerceptualLoss(spatial_dims=3) -> MONAI default network_type
            "alex", weight 8 (bl_methods/BMGAN/train_bmgan.py:73,152)

Faithful semantics (MONAI generative losses/perceptual.py + richzhang LPIPS):
  * backbone features from torchvision SqueezeNet-1.1 / AlexNet tap points
    (7 taps for squeeze, 5 for alex);
  * the LPIPS scaling layer ((x - shift) / scale, broadcasting 1-channel
    input to the 3 RGB channels);
  * per-tap channel-unit-normalisation, squared difference, 1x1 "lin"
    calibration conv to a scalar map, spatial average, SUM over taps;
  * 3-D volumes are evaluated 2.5-D ("fake 3d"): slices along each of the
    three axes, a ``fake_3d_ratio`` (default 0.5) subset per axis, mean over
    slices, and the three axis losses SUMMED.

Slice subset: MONAI samples it with torch.randperm every call. By default
this implementation takes the deterministic every-k-th-slice subset with
k = round(1 / fake_3d_ratio) (pure function, no rng threading; same
expectation over a homogeneous stack). Passing ``rng`` to ``__call__``
restores MONAI's random-subset semantics exactly (randperm over the folded
batch x slice axis) while staying jit-compatible.

Pretrained weights cannot be downloaded in this environment (zero egress).
The architecture + parameter naming exactly mirror the torch originals, so
``scripts/convert_lpips_weights.py`` converts a torchvision backbone
state_dict + LPIPS lin weights into an .npz that `params_from_npz` loads;
`tests/test_perceptual_parity.py` proves the converted pipeline matches a
torch LPIPS implementation bit-for-bit-ish on random weights. Without an
.npz the extractor is a fixed, seeded random init (a documented fallback --
random conv features are a well-behaved perceptual family) and the lin
layers initialise to the uniform average 1/C.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# LPIPS ScalingLayer constants (lpips/lpips.py ScalingLayer)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

SQUEEZE_TAP_CHANNELS = (64, 128, 256, 384, 384, 512, 512)
ALEX_TAP_CHANNELS = (64, 192, 384, 256, 256)


def _conv(features: int, kernel: int, stride: int = 1, pad: int = 0, name: str = "", dtype=jnp.float32):
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad)] * 2,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def _max_pool(x: jax.Array, ceil: bool = False) -> jax.Array:
    """torch MaxPool2d(kernel_size=3, stride=2, ceil_mode=ceil)."""
    pads = []
    for size in x.shape[1:3]:
        if ceil:
            out = -((size - 3) // -2) + 1
            pads.append((0, max(0, (out - 1) * 2 + 3 - size)))
        else:
            pads.append((0, 0))
    return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2), padding=pads)


class _Fire(nn.Module):
    """torchvision SqueezeNet Fire: squeeze 1x1 -> (expand1x1 | expand3x3)."""

    squeeze: int
    expand: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = nn.relu(_conv(self.squeeze, 1, name="squeeze", dtype=self.dtype)(x))
        a = nn.relu(_conv(self.expand, 1, name="expand1x1", dtype=self.dtype)(s))
        b = nn.relu(_conv(self.expand, 3, pad=1, name="expand3x3", dtype=self.dtype)(s))
        return jnp.concatenate([a, b], axis=-1)


class SqueezeFeatures(nn.Module):
    """torchvision SqueezeNet-1.1 `.features` with the 7 LPIPS tap points.

    Layer indices follow torchvision; parameter names mirror the torch
    state_dict (features.0 -> conv0, features.3 -> fire3, ...) so the
    weight converter is a pure rename."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Sequence[jax.Array]:
        taps = []
        h = nn.relu(_conv(64, 3, stride=2, name="conv0", dtype=self.dtype)(x))
        taps.append(h)  # relu1
        h = _max_pool(h, ceil=True)
        h = _Fire(16, 64, dtype=self.dtype, name="fire3")(h)
        h = _Fire(16, 64, dtype=self.dtype, name="fire4")(h)
        taps.append(h)  # relu2 (128)
        h = _max_pool(h, ceil=True)
        h = _Fire(32, 128, dtype=self.dtype, name="fire6")(h)
        h = _Fire(32, 128, dtype=self.dtype, name="fire7")(h)
        taps.append(h)  # relu3 (256)
        h = _max_pool(h, ceil=True)
        h = _Fire(48, 192, dtype=self.dtype, name="fire9")(h)
        taps.append(h)  # relu4 (384)
        h = _Fire(48, 192, dtype=self.dtype, name="fire10")(h)
        taps.append(h)  # relu5 (384)
        h = _Fire(64, 256, dtype=self.dtype, name="fire11")(h)
        taps.append(h)  # relu6 (512)
        h = _Fire(64, 256, dtype=self.dtype, name="fire12")(h)
        taps.append(h)  # relu7 (512)
        return taps


class AlexFeatures(nn.Module):
    """torchvision AlexNet `.features` with the 5 LPIPS tap points."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Sequence[jax.Array]:
        taps = []
        h = nn.relu(_conv(64, 11, stride=4, pad=2, name="conv0", dtype=self.dtype)(x))
        taps.append(h)  # relu1
        h = _max_pool(h)
        h = nn.relu(_conv(192, 5, pad=2, name="conv3", dtype=self.dtype)(h))
        taps.append(h)  # relu2
        h = _max_pool(h)
        h = nn.relu(_conv(384, 3, pad=1, name="conv6", dtype=self.dtype)(h))
        taps.append(h)  # relu3
        h = nn.relu(_conv(256, 3, pad=1, name="conv8", dtype=self.dtype)(h))
        taps.append(h)  # relu4
        h = nn.relu(_conv(256, 3, pad=1, name="conv10", dtype=self.dtype)(h))
        taps.append(h)  # relu5
        return taps


def _unit_normalize(f: jax.Array, eps: float = 1e-10) -> jax.Array:
    # lpips.normalize_tensor: x / (||x||_channels + eps)
    f = f.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True))
    return f / (norm + eps)


class LPIPS(nn.Module):
    """2-D LPIPS distance with linear calibration layers.

    Returns the per-sample distance (B,). Input is (B, H, W, C) with C == 1
    (broadcast to RGB by the scaling layer, matching torch broadcasting of
    the (1,3,1,1) shift/scale against a 1-channel tensor) or C == 3, or a
    3-D grayscale (B, H, W) — the unit channel then only ever exists inside
    the fused scaling broadcast, never as a stored (…, 1)-minor tensor
    (which TPU layouts pad to the 128-lane tile).
    """

    network_type: str = "squeeze"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        if self.network_type == "squeeze":
            net = SqueezeFeatures(dtype=self.dtype, name="net")
            tap_channels = SQUEEZE_TAP_CHANNELS
        elif self.network_type == "alex":
            net = AlexFeatures(dtype=self.dtype, name="net")
            tap_channels = ALEX_TAP_CHANNELS
        else:
            raise ValueError(f"unsupported network_type {self.network_type!r}")

        shift = jnp.asarray(_SHIFT, jnp.float32)
        scale = jnp.asarray(_SCALE, jnp.float32)

        def scaled(x):
            if x.ndim == 3:  # grayscale (B, H, W): channel born inside the
                x = x[..., None]  # fused broadcast-subtract, never a stored
            return ((x.astype(jnp.float32) - shift) / scale).astype(self.dtype)

        fa = net(scaled(a))
        fb = net(scaled(b))
        total = jnp.zeros((a.shape[0],), jnp.float32)
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            # NetLinLayer: 1x1 conv C -> 1, no bias. Init = uniform average so
            # the random-feature fallback is a plain mean; pretrained weights
            # overwrite via params_from_npz. Created unconditionally so the
            # param tree never depends on the input shape.
            lin = self.param(
                f"lin{i}",
                lambda key, shape: jnp.full(shape, 1.0 / shape[0], jnp.float32),
                (tap_channels[i], 1),
            )
            if 0 in xa.shape:
                # Inputs smaller than the backbone's receptive field (tiny
                # test crops) make deep taps spatially empty; their mean is
                # NaN. Statically skip them — real volumes (>=48 per axis)
                # never hit this, so the production HLO is unchanged.
                continue
            d = jnp.square(_unit_normalize(xa) - _unit_normalize(xb))  # (B,H,W,C) fp32
            total = total + jnp.mean(d @ lin, axis=(1, 2, 3))  # spatial average
        return total


class PerceptualLoss(nn.Module):
    """MONAI-generative PerceptualLoss, TPU-native.

    3-D volumes (N, D, H, W, 1) are evaluated 2.5-D: per axis, every k-th
    slice (k = round(1/fake_3d_ratio)) is folded into the batch, the 2-D
    LPIPS mean over slices is the axis loss, and the three axis losses are
    summed (MONAI perceptual.py forward: loss_sagittal + loss_coronal +
    loss_axial). 2-D inputs go straight through LPIPS.
    """

    spatial_dims: int = 3
    network_type: str = "squeeze"
    is_fake_3d: bool = True
    fake_3d_ratio: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pred: jax.Array, target: jax.Array, rng: jax.Array | None = None) -> jax.Array:
        """``rng``: optional PRNG key enabling MONAI's per-call RANDOM slice
        subset (randperm over the folded batchxslice axis, size
        ``int(m * fake_3d_ratio)``) — jit-compatible (static sizes, gather
        indices). Without it the subset is the deterministic every-k-th
        slice (same expectation over a homogeneous stack, pure function)."""
        lpips = LPIPS(network_type=self.network_type, dtype=self.dtype, name="lpips")
        if self.spatial_dims == 2:
            return jnp.mean(lpips(pred, target))
        if not self.is_fake_3d:
            raise NotImplementedError(
                "true-3D perceptual networks (medicalnet/resnet50) are not "
                "part of the reference workloads"
            )

        n, d, h, w, c = pred.shape
        total = jnp.float32(0.0)
        # A unit channel is squeezed away BEFORE the axis transposes: a
        # transposed copy with the size-1 channel minor pads it to the
        # 128-lane tile (64-128x HBM expansion — the largest allocation in
        # the causal batch-4 step was a 576 MB copy of the 9 MB PET batch).
        # Squeezed, every transposed copy has a real spatial axis minor and
        # LPIPS takes the grayscale 3-D view directly.
        squeeze = c == 1
        p5 = pred[..., 0] if squeeze else pred
        t5 = target[..., 0] if squeeze else target

        def as_lpips(x, sh, sw):
            return x.reshape((-1, sh, sw) if squeeze else (-1, sh, sw, c))

        if rng is not None:
            keys = jax.random.split(rng, 3)
            base = (0, 1, 2, 3) if squeeze else (0, 1, 2, 3, 4)
            orders = (base, (0, 2, 1) + base[3:], (0, 3, 1, 2) + base[4:])
            for key, order in zip(keys, orders):
                pa = p5.transpose(order)
                ta = t5.transpose(order)
                sh, sw = pa.shape[2], pa.shape[3]
                pa = as_lpips(pa, sh, sw)
                ta = as_lpips(ta, sh, sw)
                m = pa.shape[0]
                keep = max(1, int(m * self.fake_3d_ratio))
                idx = jax.random.choice(key, m, (keep,), replace=False)
                total = total + jnp.mean(lpips(jnp.take(pa, idx, 0), jnp.take(ta, idx, 0)))
            return total

        s = max(1, round(1.0 / self.fake_3d_ratio))
        # one batched 2-D LPIPS call per axis; slices fold into batch
        t2 = (0, 2, 1, 3) if squeeze else (0, 2, 1, 3, 4)
        t3 = (0, 3, 1, 2) if squeeze else (0, 3, 1, 2, 4)
        views = (
            (p5[:, ::s], t5[:, ::s], (h, w)),
            (p5[:, :, ::s].transpose(t2), t5[:, :, ::s].transpose(t2), (d, w)),
            (p5[:, :, :, ::s].transpose(t3), t5[:, :, :, ::s].transpose(t3), (d, h)),
        )
        for pa, ta, (sh, sw) in views:
            total = total + jnp.mean(lpips(as_lpips(pa, sh, sw), as_lpips(ta, sh, sw)))
        return total


def params_from_npz(path) -> dict:
    """Load a converted LPIPS weight .npz (scripts/convert_lpips_weights.py)
    into the {"params": ...} tree `PerceptualLoss.apply` expects.

    Keys in the npz are flat "/"-joined flax paths, e.g.
    ``lpips/net/fire3/squeeze/kernel`` or ``lpips/lin0``.
    """
    flat = dict(np.load(path))
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return {"params": tree}
