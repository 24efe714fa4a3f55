"""Resampling: trilinear resize, affine warps, spacing changes.

Device-side replacements for the reference's offline resamplers:
  * `ants.resample_image` to a target mm spacing (preprocess/reg_to_T1.py:15-23)
  * MONAI `Resize` (unet/utils/dataset.py:90)
  * the 1.5x upsample + axis swap used to push PET into segmentation space
    (proprocess/apply_surfurseg_to_PET.py:10-26)

All samplers are differentiable (trilinear) so the same code path drives the
rigid-registration optimiser in `cips_tpu/ops/registration.py`.
Volumes are (D, H, W) or (..., D, H, W); coordinates are voxel-space.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def resize_trilinear(x: jax.Array, shape: Sequence[int]) -> jax.Array:
    """Trilinear resize of the trailing len(shape) axes."""
    out_shape = x.shape[: x.ndim - len(shape)] + tuple(shape)
    return jax.image.resize(x, out_shape, method="linear")


def resize_nearest(x: jax.Array, shape: Sequence[int]) -> jax.Array:
    out_shape = x.shape[: x.ndim - len(shape)] + tuple(shape)
    return jax.image.resize(x, out_shape, method="nearest")


def resample_spacing(
    x: jax.Array, spacing: Sequence[float], new_spacing: Sequence[float], nearest: bool = False
) -> jax.Array:
    """Resample a (D, H, W) volume from ``spacing`` mm to ``new_spacing`` mm."""
    shape = tuple(
        max(1, int(round(s * sp / nsp))) for s, sp, nsp in zip(x.shape, spacing, new_spacing)
    )
    return resize_nearest(x, shape) if nearest else resize_trilinear(x, shape)


def trilinear_sample(vol: jax.Array, coords: jax.Array, cval: float = 0.0) -> jax.Array:
    """Sample (D, H, W) volume at fractional voxel coords (3, ...) trilinearly.

    Out-of-bounds samples fade to ``cval``. Fully vectorised gather — XLA
    lowers this to dynamic-gathers that pipeline well on TPU.
    """
    d, h, w = vol.shape
    cz, cy, cx = coords[0], coords[1], coords[2]

    z0 = jnp.floor(cz)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fz, fy, fx = cz - z0, cy - y0, cx - x0
    z0 = z0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def gather(zi, yi, xi):
        zc = jnp.clip(zi, 0, d - 1)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = vol[zc, yc, xc]
        inb = (
            (zi >= 0) & (zi <= d - 1) & (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        )
        return jnp.where(inb, vals, cval)

    acc = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                wz = fz if dz else (1.0 - fz)
                wy = fy if dy else (1.0 - fy)
                wx = fx if dx else (1.0 - fx)
                acc = acc + wz * wy * wx * gather(z0 + dz, y0 + dy, x0 + dx)
    return acc


def nearest_sample(vol: jax.Array, coords: jax.Array, cval: float = 0.0) -> jax.Array:
    """Nearest-neighbour sampling (for label/mask volumes,
    matching ants.apply_transforms interpolator='nearestNeighbor',
    proprocess/reg_processed_mask_and_brain.py:30-34)."""
    d, h, w = vol.shape
    idx = jnp.round(coords).astype(jnp.int32)
    zc = jnp.clip(idx[0], 0, d - 1)
    yc = jnp.clip(idx[1], 0, h - 1)
    xc = jnp.clip(idx[2], 0, w - 1)
    vals = vol[zc, yc, xc]
    inb = (
        (idx[0] >= 0)
        & (idx[0] <= d - 1)
        & (idx[1] >= 0)
        & (idx[1] <= h - 1)
        & (idx[2] >= 0)
        & (idx[2] <= w - 1)
    )
    return jnp.where(inb, vals, cval)


def identity_grid(shape: Sequence[int]) -> jax.Array:
    """(3, D, H, W) voxel-coordinate grid."""
    d, h, w = shape
    zz = jax.lax.broadcasted_iota(jnp.float32, (d, h, w), 0)
    yy = jax.lax.broadcasted_iota(jnp.float32, (d, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (d, h, w), 2)
    return jnp.stack([zz, yy, xx])


def affine_warp(
    vol: jax.Array,
    matrix: jax.Array,
    out_shape: Sequence[int] | None = None,
    nearest: bool = False,
    cval: float = 0.0,
) -> jax.Array:
    """Warp ``vol`` by a 3x4 (or 4x4) voxel-space affine: out(p) = vol(A p + t).

    The matrix maps *output* voxel coordinates to input coordinates
    (pull-back), the standard resampling convention.
    """
    out_shape = tuple(out_shape) if out_shape is not None else vol.shape
    grid = identity_grid(out_shape).reshape(3, -1)
    a = matrix[:3, :3]
    t = matrix[:3, 3]
    coords = a @ grid + t[:, None]
    sampler = nearest_sample if nearest else trilinear_sample
    return sampler(vol, coords.reshape(3, *out_shape), cval=cval)


def rigid_matrix(params: jax.Array, center: jax.Array) -> jax.Array:
    """6-DoF rigid transform -> 3x4 voxel-space matrix about ``center``.

    params = (rz, ry, rx, tz, ty, tx): Euler angles (radians) and
    translations (voxels). Differentiable w.r.t. params.
    """
    rz, ry, rx, tz, ty, tx = (params[i] for i in range(6))
    cz_, sz_ = jnp.cos(rz), jnp.sin(rz)
    cy_, sy_ = jnp.cos(ry), jnp.sin(ry)
    cx_, sx_ = jnp.cos(rx), jnp.sin(rx)
    # rotation about axis 0 (D), axis 1 (H), axis 2 (W)
    r0 = jnp.array([[1.0, 0.0, 0.0], [0.0, cz_, -sz_], [0.0, sz_, cz_]])
    r1 = jnp.array([[cy_, 0.0, sy_], [0.0, 1.0, 0.0], [-sy_, 0.0, cy_]])
    r2 = jnp.array([[cx_, -sx_, 0.0], [sx_, cx_, 0.0], [0.0, 0.0, 1.0]])
    rot = r0 @ r1 @ r2
    trans = jnp.stack([tz, ty, tx])
    offset = center - rot @ center + trans
    return jnp.concatenate([rot, offset[:, None]], axis=1)
