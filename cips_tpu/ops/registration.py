"""Rigid registration + N4-style bias correction — the ANTs replacement.

The reference shells out to ANTs (C++/ITK) for its offline chain
(preprocess/reg_to_T1.py: `N4` bias correction :7-8, rigid `reg` :11-13,
`resample` :15-23; PET->subject-T1 rigid `reg_to_t1` :62-99;
proprocess/reg_processed_mask_and_brain.py `joint_reg` :8-35 applies one
transform to brain + mask). Here registration is a differentiable program:
a 6-DoF transform drives a trilinear warp (`ops.resample`), a similarity
loss (negative NCC or Mattes-style soft-histogram MI) is minimised with
Adam over a multi-resolution pyramid — every level is one jitted
`lax.fori_loop`, so the whole optimisation is a single XLA program per
pyramid level.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Literal, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cips_tpu.ops.resample import affine_warp, resize_trilinear, rigid_matrix


def ncc_loss(
    a: jax.Array, b: jax.Array, eps: float = 1e-8, mask: jax.Array | None = None
) -> jax.Array:
    """Negative normalised cross-correlation (global, optionally masked).

    ``mask`` (same shape, {0,1} or weights) restricts the statistic to
    foreground voxels so empty background does not dominate the metric."""
    if mask is None:
        a = a - a.mean()
        b = b - b.mean()
        denom = jnp.sqrt((a * a).sum() * (b * b).sum()) + eps
        return -(a * b).sum() / denom
    w = mask.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    a = a - (a * w).sum() / n
    b = b - (b * w).sum() / n
    denom = jnp.sqrt((a * a * w).sum() * (b * b * w).sum()) + eps
    return -(a * b * w).sum() / denom


def mutual_information_loss(
    a: jax.Array,
    b: jax.Array,
    nbins: int = 32,
    sigma: float = 0.5,
    eps: float = 1e-10,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Negative MI via differentiable Parzen soft histograms (Mattes-style,
    the metric ANTs' rigid 'reg' uses). ``mask`` weights each voxel's
    contribution to the joint histogram."""
    # Normalise the intensity range over masked voxels only — an unmasked
    # bright background artifact (the case the mask exists for) would
    # otherwise compress the foreground into a few histogram bins.
    def _minmax(x):
        if mask is None:
            return x.min(), x.max()
        m = mask.astype(bool)
        return (
            jnp.where(m, x, jnp.inf).min(),
            jnp.where(m, x, -jnp.inf).max(),
        )

    a_lo, a_hi = _minmax(a)
    b_lo, b_hi = _minmax(b)
    a = jnp.clip((a - a_lo) / jnp.maximum(a_hi - a_lo, eps), 0.0, 1.0)
    b = jnp.clip((b - b_lo) / jnp.maximum(b_hi - b_lo, eps), 0.0, 1.0)
    centers = (jnp.arange(nbins, dtype=jnp.float32) + 0.5) / nbins
    bw = sigma / nbins

    def soft_assign(x):
        d = (x.reshape(-1, 1) - centers[None, :]) / bw
        w = jnp.exp(-0.5 * d * d)
        return w / jnp.maximum(w.sum(axis=1, keepdims=True), eps)

    wa = soft_assign(a)  # (N, bins)
    wb = soft_assign(b)
    if mask is not None:
        wa = wa * mask.astype(jnp.float32).reshape(-1, 1)
    joint = wa.T @ wb  # (bins, bins)
    joint = joint / jnp.maximum(joint.sum(), eps)
    pa = joint.sum(axis=1)
    pb = joint.sum(axis=0)
    mi = jnp.sum(joint * (jnp.log(joint + eps) - jnp.log(pa[:, None] + eps) - jnp.log(pb[None, :] + eps)))
    return -mi


@dataclass
class RegistrationResult:
    params: jax.Array  # (6,) rz, ry, rx, tz, ty, tx (voxel units at full res)
    matrix: jax.Array  # (3, 4) pull-back voxel affine
    loss: float


def _register_level(moving, fixed, params0, metric: str, iters: int, lr: float, mask=None, mat_fn=None):
    center = (jnp.asarray(fixed.shape, jnp.float32) - 1.0) / 2.0
    loss_fn = ncc_loss if metric == "ncc" else mutual_information_loss
    if mat_fn is None:
        mat_fn = lambda p: rigid_matrix(p, center)  # noqa: E731 — voxel-space default

    def objective(p):
        mat = mat_fn(p)
        warped = affine_warp(moving, mat, out_shape=fixed.shape)
        return loss_fn(warped, fixed, mask=mask)

    tx = optax.adam(lr)
    opt_state = tx.init(params0)
    grad_fn = jax.value_and_grad(objective)

    def body(_, carry):
        p, s = carry
        loss, g = grad_fn(p)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s

    params, _ = jax.lax.fori_loop(0, iters, body, (params0, opt_state))
    return params, objective(params)


def _rotation_seeds(n: int) -> jnp.ndarray:
    """(n, 6) multi-start initialisations: identity first, then +-30 and
    +-60 degree single-axis rotations — the capture-range extender for
    misalignments beyond gradient descent's basin (~15 degrees)."""
    seeds = [jnp.zeros((6,), jnp.float32)]
    for mag in (jnp.pi / 6, jnp.pi / 3):
        for axis in range(3):
            for sign in (1.0, -1.0):
                seeds.append(jnp.zeros((6,), jnp.float32).at[axis].set(sign * mag))
    return jnp.stack(seeds[: max(1, n)])


def register_rigid(
    moving: jax.Array,
    fixed: jax.Array,
    metric: Literal["ncc", "mi"] = "ncc",
    pyramid: Sequence[int] = (4, 2, 1),
    iters_per_level: int = 100,
    lr: float = 0.05,
    mask: jax.Array | None = None,
    n_starts: int = 1,
) -> RegistrationResult:
    """Coarse-to-fine 6-DoF registration of ``moving`` onto ``fixed``.

    Rotations are optimised in radians; translations in voxels of the
    current level (rescaled between levels). ``lr`` anneals with level.
    Returns the pull-back matrix usable with `ops.resample.affine_warp`
    (and, with `nearest=True`, for label maps — the reference's joint
    brain+mask transform, reg_processed_mask_and_brain.py:30-34).

    ``mask`` (fixed-image foreground) restricts the similarity metric so
    background does not dominate. ``n_starts`` > 1 runs that many rotation
    seeds (identity, then +-30/60 degree single-axis) through the coarsest
    level in one vmapped program and continues with the best — extends the
    capture range past the single-basin ~15 degrees, matching ANTs' rigid
    stage behaviour on large misalignments.
    """
    moving = moving.astype(jnp.float32)
    fixed = fixed.astype(jnp.float32)
    params = jnp.zeros((6,), jnp.float32)
    level_fn = jax.jit(functools.partial(_register_level, metric=metric, iters=iters_per_level))

    def level_mask(shape_f):
        if mask is None:
            return None
        return (resize_trilinear(mask.astype(jnp.float32), shape_f) > 0.5).astype(jnp.float32)

    prev_factor = None
    loss = jnp.float32(0.0)
    for i, factor in enumerate(pyramid):
        shape_m = tuple(max(4, s // factor) for s in moving.shape)
        shape_f = tuple(max(4, s // factor) for s in fixed.shape)
        mv = resize_trilinear(moving, shape_m)
        fx = resize_trilinear(fixed, shape_f)
        mk = level_mask(shape_f)
        if i == 0 and n_starts > 1:
            seeds = _rotation_seeds(n_starts)
            multi = jax.jit(
                jax.vmap(
                    functools.partial(
                        _register_level, metric=metric, iters=iters_per_level, lr=lr, mask=mk
                    ),
                    in_axes=(None, None, 0),
                )
            )
            cands, losses = multi(mv, fx, seeds)
            best = jnp.argmin(losses)
            params, loss = cands[best], losses[best]
            prev_factor = factor
            continue
        if prev_factor is not None:
            scale = prev_factor / factor
            params = params.at[3:].multiply(scale)
        params, loss = level_fn(mv, fx, params, lr=lr / (i + 1), mask=mk)
        prev_factor = factor

    # rescale translations to full resolution
    if pyramid[-1] != 1:
        params = params.at[3:].multiply(float(pyramid[-1]))
    center = (jnp.asarray(fixed.shape, jnp.float32) - 1.0) / 2.0
    matrix = rigid_matrix(params, center)
    return RegistrationResult(params=params, matrix=matrix, loss=float(loss))


def apply_transform(
    img: jax.Array, matrix: jax.Array, out_shape=None, nearest: bool = False
) -> jax.Array:
    """Apply a registration result to an image or label volume."""
    return affine_warp(img, matrix, out_shape=out_shape, nearest=nearest)


# ---------------------------------------------------------------------------
# physical-space registration (real scanner geometry)
# ---------------------------------------------------------------------------

# arrays are (z, y, x) while NIfTI affines map (i=x, j=y, k=z) voxel indices
# to physical mm — this permutation converts an xyz affine to zyx index order
_PERM_ZYX = np.array(
    [[0, 0, 1, 0], [0, 1, 0, 0], [1, 0, 0, 0], [0, 0, 0, 1]], dtype=np.float64
)


def _zyx_affine(affine_xyz: np.ndarray) -> np.ndarray:
    """4x4 NIfTI (xyz-index -> physical xyz) -> (zyx-index -> physical zyx)."""
    return _PERM_ZYX @ np.asarray(affine_xyz, np.float64) @ _PERM_ZYX


def _homog(m34: jax.Array) -> jax.Array:
    return jnp.concatenate([m34, jnp.asarray([[0.0, 0.0, 0.0, 1.0]], m34.dtype)], axis=0)


def _physical_pullback(p, am_inv_zyx, af_zyx, center_phys_zyx):
    """(6,) physical rigid params -> (3,4) voxel pull-back matrix.

    The sampled coordinate chain is  v_moving = A_m^-1 · R(p) · A_f · v_fixed
    with R a rigid transform about the fixed volume's physical center —
    rotations in radians, translations in mm, exactly ANTs' rigid stage
    parameterisation (reg_to_T1.py:62-99 uses type_of_transform='Rigid')."""
    r = _homog(rigid_matrix(p, center_phys_zyx))
    m = am_inv_zyx @ r @ af_zyx
    return m[:3]


def register_rigid_physical(
    moving: jax.Array,
    fixed: jax.Array,
    moving_affine: np.ndarray,
    fixed_affine: np.ndarray,
    metric: Literal["ncc", "mi"] = "ncc",
    pyramid: Sequence[int] = (4, 2, 1),
    iters_per_level: int = 100,
    lr: float = 0.05,
    mask: jax.Array | None = None,
    n_starts: int = 1,
) -> RegistrationResult:
    """6-DoF registration in PHYSICAL space using the NIfTI affines.

    Real ADNI geometry — anisotropic spacings (e.g. 2mm PET slices vs 1mm
    T1), oblique direction cosines, shifted FOV origins — makes a rigid
    transform in voxel-index space unable to represent the true physical
    alignment. Here the scanner affines provide the initial alignment
    (params = 0 composes A_m^-1 · A_f, i.e. header-based resampling) and
    the optimiser refines a rigid motion in mm/radians about the fixed
    volume's physical center, mirroring ANTs' rigid stage
    (`reg_to_T1.py:62-99`). Returns a RegistrationResult whose ``matrix``
    pulls the ORIGINAL moving grid back onto the fixed grid (use with
    `apply_transform(moving, result.matrix, out_shape=fixed.shape)`);
    ``params`` are (rz, ry, rx) radians + (tz, ty, tx) mm.
    """
    moving = moving.astype(jnp.float32)
    fixed = fixed.astype(jnp.float32)
    af_full = _zyx_affine(fixed_affine)
    am_full = _zyx_affine(moving_affine)
    center_vox = (np.asarray(fixed.shape, np.float64) - 1.0) / 2.0
    center_phys = jnp.asarray(af_full @ np.append(center_vox, 1.0), jnp.float32)[:3]

    def level_affines(shape_m, shape_f):
        s_m = np.append(np.asarray(moving.shape, np.float64) / np.asarray(shape_m, np.float64), 1.0)
        s_f = np.append(np.asarray(fixed.shape, np.float64) / np.asarray(shape_f, np.float64), 1.0)
        af_l = af_full @ np.diag(s_f)
        am_inv_l = np.linalg.inv(am_full @ np.diag(s_m))
        return jnp.asarray(am_inv_l, jnp.float32), jnp.asarray(af_l, jnp.float32)

    def level_mask(shape_f):
        if mask is None:
            return None
        return (resize_trilinear(mask.astype(jnp.float32), shape_f) > 0.5).astype(jnp.float32)

    params = jnp.zeros((6,), jnp.float32)
    loss = jnp.float32(0.0)
    for i, factor in enumerate(pyramid):
        shape_m = tuple(max(4, s // factor) for s in moving.shape)
        shape_f = tuple(max(4, s // factor) for s in fixed.shape)
        mv = resize_trilinear(moving, shape_m)
        fx = resize_trilinear(fixed, shape_f)
        mk = level_mask(shape_f)
        am_inv_l, af_l = level_affines(shape_m, shape_f)
        mat_fn = functools.partial(
            _physical_pullback, am_inv_zyx=am_inv_l, af_zyx=af_l, center_phys_zyx=center_phys
        )
        level = functools.partial(
            _register_level, metric=metric, iters=iters_per_level, mask=mk, mat_fn=mat_fn
        )
        if i == 0 and n_starts > 1:
            seeds = _rotation_seeds(n_starts)
            cands, losses = jax.jit(
                jax.vmap(functools.partial(level, lr=lr), in_axes=(None, None, 0))
            )(mv, fx, seeds)
            best = jnp.argmin(losses)
            params, loss = cands[best], losses[best]
            continue
        # physical params (mm / radians) carry across levels unchanged
        params, loss = jax.jit(functools.partial(level, lr=lr / (i + 1)))(mv, fx, params)

    am_inv = jnp.asarray(np.linalg.inv(am_full), jnp.float32)
    matrix = _physical_pullback(params, am_inv, jnp.asarray(af_full, jnp.float32), center_phys)
    return RegistrationResult(params=params, matrix=matrix, loss=float(loss))


def n4_bias_correct(
    img: jax.Array, grid: Tuple[int, int, int] = (4, 4, 4), iters: int = 2, eps: float = 1e-6
) -> jax.Array:
    """Lightweight N4-style bias-field correction (reg_to_T1.py:7-8).

    Models the multiplicative bias field as a low-resolution log-domain
    field (trilinearly upsampled control grid) estimated by smoothing the
    log image residual — a bandwidth-friendly approximation of N4's B-spline
    fit, adequate for the skull-stripped ADNI inputs this pipeline feeds.
    """
    img = img.astype(jnp.float32)
    pos = img > 0
    log_img = jnp.log(jnp.where(pos, img, 1.0))
    field = jnp.zeros_like(log_img)
    for _ in range(iters):
        residual = jnp.where(pos, log_img - field, 0.0)
        coarse = resize_trilinear(residual, grid)
        smooth = resize_trilinear(coarse, img.shape)
        mean_r = residual.sum() / jnp.maximum(pos.sum(), 1.0)
        field = field + (smooth - mean_r)
    corrected = jnp.where(pos, jnp.exp(log_img - field), 0.0)
    # preserve the original mean intensity
    scale = img.sum() / jnp.maximum(corrected.sum(), eps)
    return corrected * scale
