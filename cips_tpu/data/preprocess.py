"""Offline preprocessing pipeline: registration chain, masking, downsampling.

Device-accelerated re-implementation of the reference's ANTs-driven offline
chain (SURVEY.md §2.8), operating on {root}/{Subject}/{date}/ NIfTI trees:
  * `register_pet_to_t1` == preprocess/reg_to_T1.py `reg_to_t1` (:62-99):
    rigid PET->subject-T1, writes the resampled PET; idempotent (skips
    sessions whose output exists, reg_to_T1.py:84-86);
  * `create_t1_downsample` == reg_to_T1.py:25-60 / pair_reg.py:48: N4 bias
    correction, resample to a target mm spacing, center pad/crop to the
    working shape;
  * `mask_pet_by_t1` == preprocess/masked_PET_by_T1.py:26-43: zero PET
    outside the subject's skull-stripped baseline T1 support;
  * `joint_register` == proprocess/reg_processed_mask_and_brain.py:8-35:
    one rigid transform applied to a brain (trilinear) and its label mask
    (nearest).

All compute runs through the jitted ops in cips_tpu/ops — the registration
optimiser, resampler and mask math execute on the accelerator.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from cips_tpu.data import nifti
from cips_tpu.data.dataset import pad_crop_np
from cips_tpu.data.manifest import scan_session_dirs
from cips_tpu.ops.registration import apply_transform, n4_bias_correct, register_rigid
from cips_tpu.ops.resample import resample_spacing


def _first_file(folder: str) -> Optional[str]:
    if not os.path.isdir(folder):
        return None
    for e in sorted(os.listdir(folder)):
        p = os.path.join(folder, e)
        if os.path.isfile(p):
            return p
    return None


def register_pet_to_t1(
    pet_root: str,
    t1_root: str,
    out_root: str,
    metric: str = "ncc",
    overwrite: bool = False,
    verbose: bool = True,
) -> int:
    """Rigid-register every PET session onto the subject's nearest T1 space.

    Returns the number of sessions processed. Output tree mirrors the input:
    {out_root}/{Subject}/{pet_date}/pet_reg.nii.gz.
    """
    from cips_tpu.data.manifest import days_between

    n_done = 0
    pet_sessions = scan_session_dirs(pet_root)
    t1_sessions = scan_session_dirs(t1_root)
    for subject, pet_dates in pet_sessions.items():
        t1_dates = t1_sessions.get(subject)
        if not t1_dates:
            continue
        for pet_date in pet_dates:
            out_dir = os.path.join(out_root, subject, pet_date)
            out_path = os.path.join(out_dir, "pet_reg.nii.gz")
            if os.path.exists(out_path) and not overwrite:
                continue
            t1_date = min(t1_dates, key=lambda d: days_between(d, pet_date))
            pet_path = _first_file(os.path.join(pet_root, subject, pet_date))
            t1_path = _first_file(os.path.join(t1_root, subject, t1_date))
            if pet_path is None or t1_path is None:
                continue
            pet_img = nifti.read(pet_path)
            t1_img = nifti.read(t1_path)
            # real scanner geometry (anisotropic / oblique / shifted FOV)
            # demands PHYSICAL-space rigid with header initialisation, like
            # ANTs (reg_to_T1.py:62-99); identical unit affines fall back to
            # plain voxel-space registration
            trivial = np.allclose(pet_img.affine, np.eye(4)) and np.allclose(
                t1_img.affine, np.eye(4)
            )
            if trivial:
                result = register_rigid(
                    jnp.asarray(pet_img.data, jnp.float32),
                    jnp.asarray(t1_img.data, jnp.float32),
                    metric=metric,
                )
            else:
                from cips_tpu.ops.registration import register_rigid_physical

                result = register_rigid_physical(
                    jnp.asarray(pet_img.data, jnp.float32),
                    jnp.asarray(t1_img.data, jnp.float32),
                    pet_img.affine,
                    t1_img.affine,
                    metric=metric,
                )
            warped = apply_transform(
                jnp.asarray(pet_img.data, jnp.float32), result.matrix, out_shape=t1_img.data.shape
            )
            nifti.write(
                out_path,
                nifti.NiftiImage(
                    data=np.asarray(warped, np.float32),
                    affine=t1_img.affine,
                    spacing=t1_img.spacing,
                ),
            )
            n_done += 1
            if verbose:
                print(f"[reg] {subject}/{pet_date} -> T1 {t1_date} loss={result.loss:.4f}")
    return n_done


def create_t1_downsample(
    t1_root: str,
    out_root: str,
    new_spacing: Tuple[float, float, float] = (1.5, 1.5, 1.5),
    crop_size: Tuple[int, int, int] = (96, 128, 96),
    bias_correct: bool = True,
    overwrite: bool = False,
    template_path: Optional[str] = None,
    metric: str = "ncc",
) -> int:
    """N4 + resample-to-mm + center pad/crop for every T1 session
    (reg_to_T1.py:25-60; crop to the working shape as pair_reg.py:48).

    ``template_path`` enables the reference's ``reg_to_mni_first`` branch
    (reg_to_T1.py:27,51-52): rigid-register each T1 onto the MNI/ICBM-152
    template first and continue from the template grid/spacing. (The
    reference's (160,224,160) template mask is computed but never applied
    there — dead code — so none is applied here either.)
    """
    template = nifti.read(template_path) if template_path else None
    n_done = 0
    for subject, dates in scan_session_dirs(t1_root).items():
        for date in dates:
            out_dir = os.path.join(out_root, subject, date)
            out_path = os.path.join(out_dir, "t1_ds.nii.gz")
            if os.path.exists(out_path) and not overwrite:
                continue
            t1_path = _first_file(os.path.join(t1_root, subject, date))
            if t1_path is None:
                continue
            img = nifti.read(t1_path)
            vol = jnp.asarray(img.data, jnp.float32)
            spacing = img.spacing
            if template is not None:
                fixed = jnp.asarray(template.data, jnp.float32)
                result = register_rigid(vol, fixed, metric=metric)
                vol = apply_transform(vol, result.matrix, out_shape=template.data.shape)
                spacing = template.spacing
            if bias_correct:
                vol = n4_bias_correct(vol)
            vol = resample_spacing(vol, spacing[::-1], new_spacing[::-1])
            arr = pad_crop_np(np.asarray(vol, np.float32), crop_size)
            nifti.write(
                out_path, nifti.NiftiImage(data=arr, spacing=new_spacing)
            )
            n_done += 1
    return n_done


def mask_pet_by_t1(
    pet_root: str,
    t1_root: str,
    out_root: str,
    overwrite: bool = False,
) -> int:
    """PET := PET * (baseline skull-stripped T1 > 0)
    (masked_PET_by_T1.py:26-43: the subject's FIRST T1 date is the mask)."""
    n_done = 0
    t1_sessions = scan_session_dirs(t1_root)
    for subject, pet_dates in scan_session_dirs(pet_root).items():
        t1_dates = t1_sessions.get(subject)
        if not t1_dates:
            continue
        t1_path = _first_file(os.path.join(t1_root, subject, t1_dates[0]))
        if t1_path is None:
            continue
        t1 = nifti.read_array(t1_path).astype(np.float32)
        for pet_date in pet_dates:
            out_dir = os.path.join(out_root, subject, pet_date)
            out_path = os.path.join(out_dir, "pet_masked.nii.gz")
            if os.path.exists(out_path) and not overwrite:
                continue
            pet_path = _first_file(os.path.join(pet_root, subject, pet_date))
            if pet_path is None:
                continue
            pet_img = nifti.read(pet_path)
            pet = pet_img.data.astype(np.float32)
            if pet.shape != t1.shape:
                continue
            nifti.write(
                out_path,
                nifti.NiftiImage(
                    data=pet * (t1 > 0), affine=pet_img.affine, spacing=pet_img.spacing
                ),
            )
            n_done += 1
    return n_done


def joint_register(
    brain: np.ndarray,
    mask: np.ndarray,
    target_t1: np.ndarray,
    metric: str = "ncc",
) -> Tuple[np.ndarray, np.ndarray]:
    """Register a processed brain to a target T1 and carry its segmentation
    mask along with nearest-neighbour interpolation
    (reg_processed_mask_and_brain.py:8-35)."""
    res = register_rigid(jnp.asarray(brain, jnp.float32), jnp.asarray(target_t1, jnp.float32), metric=metric)
    warped_brain = apply_transform(
        jnp.asarray(brain, jnp.float32), res.matrix, out_shape=target_t1.shape
    )
    warped_mask = apply_transform(
        jnp.asarray(mask, jnp.float32), res.matrix, out_shape=target_t1.shape, nearest=True
    )
    return np.asarray(warped_brain, np.float32), np.asarray(warped_mask, mask.dtype)
