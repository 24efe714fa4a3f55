"""Core on-device volume ops: pad, crop, normalise.

Device-side, jit-friendly equivalents of the reference's per-sample CPU
MONAI transform chain (`unet/utils/dataset.py:70-103`): SpatialPad ->
CenterSpatialCrop to the working shape and per-volume max normalisation
`img / img.max()` applied separately per modality (dataset.py:97-100).
All ops are static-shape (crop/pad sizes are Python ints) so XLA compiles
one program per working shape; batched inputs are handled natively.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def pad_crop_to(x: jax.Array, target: Sequence[int], spatial_axes: Sequence[int]) -> jax.Array:
    """Symmetrically pad-then-center-crop ``spatial_axes`` of ``x`` to ``target``.

    Matches MONAI SpatialPad (symmetric, extra voxel at the end) followed by
    CenterSpatialCrop (extra voxel dropped from the end) as composed in
    dataset.py:81-83.
    """
    assert len(target) == len(spatial_axes)
    pads = [(0, 0)] * x.ndim
    for axis, tgt in zip(spatial_axes, target):
        cur = x.shape[axis]
        if cur < tgt:
            total = tgt - cur
            lo = total // 2
            pads[axis] = (lo, total - lo)
    x = jnp.pad(x, pads)
    slices = [slice(None)] * x.ndim
    for axis, tgt in zip(spatial_axes, target):
        cur = x.shape[axis]
        if cur > tgt:
            start = (cur - tgt) // 2
            slices[axis] = slice(start, start + tgt)
    return x[tuple(slices)]


def center_crop(x: jax.Array, target: Sequence[int], spatial_axes: Sequence[int]) -> jax.Array:
    return pad_crop_to(x, target, spatial_axes)


def max_normalize(x: jax.Array, axes: Sequence[int] | None = None, eps: float = 1e-12) -> jax.Array:
    """Per-volume max normalisation `x / max(x)` (dataset.py:97-100).

    ``axes``: axes over which the max is taken (default: all). A zero max
    (empty volume) yields zeros rather than NaN.
    """
    if axes is None:
        m = jnp.max(x)
    else:
        m = jnp.max(x, axis=tuple(axes), keepdims=True)
    return x / jnp.maximum(m, eps)


def minmax_normalize(x: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Covariate min-max normalisation (dataset.py:130-134)."""
    return (x - lo) / (hi - lo)


def random_crop(
    x: jax.Array,
    rng: jax.Array,
    size: Sequence[int],
    spatial_axes: Sequence[int],
) -> jax.Array:
    """Random spatial crop with random center (MONAI RandSpatialCrop,
    dataset.py:85-87), static output shape."""
    starts = []
    keys = jax.random.split(rng, len(spatial_axes))
    for key, axis, s in zip(keys, spatial_axes, size):
        max_start = x.shape[axis] - s
        starts.append(jax.random.randint(key, (), 0, max_start + 1))
    full_starts = [jnp.array(0)] * x.ndim
    sizes = list(x.shape)
    for axis, s, st in zip(spatial_axes, size, starts):
        full_starts[axis] = st
        sizes[axis] = s
    return jax.lax.dynamic_slice(x, full_starts, sizes)
