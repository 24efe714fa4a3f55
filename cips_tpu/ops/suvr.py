"""SUVR — standardised uptake value ratio on segmentation label maps.

Re-implements the clinical-validation math of the reference's postprocess
chain (`proprocess/apply_surfurseg_to_PET.py`, `proprocess/appy_iBEAT.py`):
  * `resize_and_pad_pet_to_seg` — 1.5x trilinear upsample, pad to the
    segmentation's cube, axis swap + flips into seg orientation
    (apply_surfurseg_to_PET.py:10-26);
  * `compute_suvr` = mean(PET * ROI) / mean(PET * REF) over label sets
    (:28-63: means are taken over the mask support);
  * label sets: FastSurfer aseg ROI=[3, 42] (L/R cerebral cortex),
    REF=[7, 8, 46, 47] (cerebellum) (:123-127); iBEAT ROI=36-45 ∪ 48-113 ∪
    116-131, REF=[10, 11] (appy_iBEAT.py:111-112).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from cips_tpu.ops.resample import resize_trilinear
from cips_tpu.ops.volume import pad_crop_to

FASTSURFER_ROI = (3, 42)
FASTSURFER_REF = (7, 8, 46, 47)
IBEAT_ROI = tuple(range(36, 46)) + tuple(range(48, 114)) + tuple(range(116, 132))
IBEAT_REF = (10, 11)


def label_mask(seg: jax.Array, labels: Sequence[int]) -> jax.Array:
    """Binary mask of voxels whose label is in ``labels``."""
    labels_arr = jnp.asarray(labels, seg.dtype)
    return jnp.isin(seg, labels_arr)


def compute_suvr(
    pet: jax.Array, seg: jax.Array, roi_labels: Sequence[int], ref_labels: Sequence[int]
) -> jax.Array:
    """mean(PET over ROI voxels) / mean(PET over REF voxels)."""
    pet = pet.astype(jnp.float32)
    roi = label_mask(seg, roi_labels).astype(jnp.float32)
    ref = label_mask(seg, ref_labels).astype(jnp.float32)
    roi_mean = (pet * roi).sum() / jnp.maximum(roi.sum(), 1.0)
    ref_mean = (pet * ref).sum() / jnp.maximum(ref.sum(), 1.0)
    return roi_mean / jnp.maximum(ref_mean, 1e-12)


def resize_and_pad_pet_to_seg(
    pet: jax.Array,
    seg_shape: Tuple[int, int, int] = (256, 256, 256),
    scale: float = 1.5,
    reorient: bool = True,
) -> jax.Array:
    """Push a (z, y, x) PET into FastSurfer conformed space
    (apply_surfurseg_to_PET.py:10-26): trilinear x``scale`` upsample, pad to
    ``seg_shape``, then swap to seg axis order with the flips the reference
    applies.

    The reference operates on ants arrays in (x, y, z) index order and does
    ``np.swapaxes(a, 1, 2)[:, ::-1, ::-1]`` AFTER padding to the 256 cube
    (apply_surfurseg_to_PET.py:18-22). Re-expressed in this package's
    (z, y, x) convention that is ``swapaxes(a, 0, 1)[::-1, ::-1, :]``;
    pad order is preserved (pad-then-reorient) so the asymmetric extra voxel
    of an odd pad lands on the same side as the reference."""
    scaled = tuple(int(s * scale) for s in pet.shape)
    pet = resize_trilinear(pet, scaled)
    pet = pad_crop_to(pet, seg_shape, spatial_axes=(0, 1, 2))
    if reorient:
        pet = jnp.swapaxes(pet, 0, 1)[::-1, ::-1, :]
    return pet


def suvr_abs_error(suvr_gt: jax.Array, suvr_synth: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """mean ± std of |SUVR_gt - SUVR_synth| over matched sessions
    (proprocess/compute_suvr_error.py:21-32)."""
    err = jnp.abs(jnp.asarray(suvr_gt) - jnp.asarray(suvr_synth))
    return err.mean(), err.std()
