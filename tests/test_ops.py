"""Op tests vs numpy/scipy references: volume, resample, metrics, masking, SUVR, registration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage as ndi

from cips_tpu.ops.masking import get_mask, mask_by_t1, otsu_threshold
from cips_tpu.ops.metrics import mae, mean_intensity_match, ms_ssim, psnr, ssim
from cips_tpu.ops.resample import (
    affine_warp,
    resample_spacing,
    resize_trilinear,
    rigid_matrix,
    trilinear_sample,
)
from cips_tpu.ops.registration import n4_bias_correct, ncc_loss, register_rigid
from cips_tpu.ops.suvr import compute_suvr, label_mask, suvr_abs_error
from cips_tpu.ops.volume import max_normalize, minmax_normalize, pad_crop_to, random_crop


def test_pad_crop_matches_numpy_reference():
    from cips_tpu.data.dataset import pad_crop_np

    x = np.random.default_rng(0).random((5, 9, 7)).astype(np.float32)
    want = pad_crop_np(x, (8, 6, 7))
    got = np.asarray(pad_crop_to(jnp.asarray(x), (8, 6, 7), spatial_axes=(0, 1, 2)))
    np.testing.assert_allclose(got, want)


def test_normalize_ops():
    x = jnp.asarray([[2.0, 4.0]])
    np.testing.assert_allclose(np.asarray(max_normalize(x)), [[0.5, 1.0]])
    np.testing.assert_allclose(float(minmax_normalize(jnp.float32(5.0), 0.0, 10.0)), 0.5)
    # zero max yields zeros, not NaN
    assert not np.isnan(np.asarray(max_normalize(jnp.zeros((4,))))).any()


def test_random_crop_static_shape():
    x = jnp.arange(4 * 6 * 8, dtype=jnp.float32).reshape(4, 6, 8)
    y = random_crop(x, jax.random.key(0), (2, 3, 4), spatial_axes=(0, 1, 2))
    assert y.shape == (2, 3, 4)


def test_trilinear_sample_matches_scipy():
    rng = np.random.default_rng(1)
    vol = rng.random((6, 7, 8)).astype(np.float32)
    coords = rng.uniform(0.0, 5.0, size=(3, 50)).astype(np.float32)
    got = np.asarray(trilinear_sample(jnp.asarray(vol), jnp.asarray(coords)))
    want = ndi.map_coordinates(vol, coords, order=1, mode="constant")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_affine_warp_identity_and_translation():
    vol = jnp.arange(4 * 4 * 4, dtype=jnp.float32).reshape(4, 4, 4)
    ident = jnp.eye(3, 4)
    np.testing.assert_allclose(np.asarray(affine_warp(vol, ident)), np.asarray(vol), atol=1e-5)
    # +1 voxel shift on axis 0 (pull-back): out[z] = vol[z+1]
    shift = jnp.eye(3, 4).at[0, 3].set(1.0)
    out = np.asarray(affine_warp(vol, shift))
    np.testing.assert_allclose(out[:3], np.asarray(vol)[1:], atol=1e-5)


def test_resample_spacing_shape():
    vol = jnp.ones((10, 10, 10))
    out = resample_spacing(vol, (1.0, 1.0, 1.0), (2.0, 2.0, 2.0))
    assert out.shape == (5, 5, 5)


def test_metrics_basics():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.random((24, 24, 24)), jnp.float32)
    assert float(mae(a, a)) == 0.0
    assert float(ssim(a, a, kernel_size=5, sigma=0.5)) == pytest.approx(1.0, abs=1e-5)
    assert float(psnr(a, a)) > 80
    b = jnp.clip(a + 0.1, 0, 1)
    assert float(ssim(a, b, kernel_size=5, sigma=0.5)) < 1.0
    # ms_ssim needs enough scales: use a bigger but cheap volume
    big = jnp.asarray(rng.random((96, 96, 96)), jnp.float32)
    val = float(ms_ssim(big, big, kernel_size=5, sigma=0.5))
    assert val == pytest.approx(1.0, abs=1e-4)

    sys = jnp.full((4, 4, 4), 2.0)
    real = jnp.full((4, 4, 4), 0.5)
    np.testing.assert_allclose(np.asarray(mean_intensity_match(sys, real)), 0.5)


def test_masking_and_otsu():
    vol = np.zeros((16, 16, 16), np.float32)
    vol[4:12, 4:12, 4:12] = 1.0
    thr = float(otsu_threshold(jnp.asarray(vol)))
    assert 0.0 < thr < 1.0
    mask = np.asarray(get_mask(jnp.asarray(vol)))
    inner = mask[5:11, 5:11, 5:11]
    assert inner.all()
    assert not mask[0, 0, 0]

    t1 = jnp.asarray(vol)
    pet = jnp.ones_like(t1) * 3.0
    masked = np.asarray(mask_by_t1(pet, t1))
    assert masked[8, 8, 8] == 3.0 and masked[0, 0, 0] == 0.0


def test_suvr_on_synthetic_labels():
    seg = np.zeros((8, 8, 8), np.int32)
    seg[:4] = 3  # ROI label
    seg[4:] = 7  # REF label
    pet = np.ones((8, 8, 8), np.float32)
    pet[:4] = 2.0
    suvr = float(compute_suvr(jnp.asarray(pet), jnp.asarray(seg), (3, 42), (7, 8, 46, 47)))
    assert suvr == pytest.approx(2.0)
    m, s = suvr_abs_error(jnp.asarray([1.0, 2.0]), jnp.asarray([1.5, 2.5]))
    assert float(m) == pytest.approx(0.5) and float(s) == pytest.approx(0.0)


def test_resize_and_pad_pet_to_seg_matches_reference_reorient():
    """Numerical parity with the reference's pad+reorient
    (apply_surfurseg_to_PET.py:18-22): on ants (x, y, z)-order arrays the
    reference pads to the cube with MONAI SpatialPad, then applies
    np.swapaxes(a, 1, 2)[:, ::-1, ::-1]. Our arrays are (z, y, x), so the
    output must equal the reference result transposed back."""
    from cips_tpu.ops.suvr import resize_and_pad_pet_to_seg

    rng = np.random.default_rng(7)
    a_xyz = rng.random((5, 6, 7)).astype(np.float32)  # odd dims -> asymmetric pad

    # reference pipeline (scale 1.0 isolates pad+reorient from interpolation)
    def monai_pad(a, tgt):
        pads = []
        for cur, t in zip(a.shape, tgt):
            d = max(t - cur, 0)
            pads.append((d // 2, d - d // 2))
        return np.pad(a, pads)

    ref = monai_pad(a_xyz, (9, 9, 9))
    ref = np.swapaxes(ref, 1, 2)[:, ::-1, ::-1]

    ours_zyx = np.asarray(
        resize_and_pad_pet_to_seg(
            jnp.asarray(a_xyz.transpose(2, 1, 0)), seg_shape=(9, 9, 9), scale=1.0
        )
    )
    np.testing.assert_allclose(ours_zyx, ref.transpose(2, 1, 0), atol=1e-5)


def test_rigid_registration_recovers_translation():
    rng = np.random.default_rng(3)
    base = ndi.gaussian_filter(rng.random((24, 24, 24)).astype(np.float32), 2.0)
    # moving = fixed shifted by +2 voxels on axis 0: fixed(p) = moving(p + 2)
    matrix = jnp.eye(3, 4).at[0, 3].set(2.0)
    fixed = affine_warp(jnp.asarray(base), matrix)
    res = register_rigid(jnp.asarray(base), fixed, metric="ncc", pyramid=(2, 1), iters_per_level=60, lr=0.1)
    assert res.params[3] == pytest.approx(2.0, abs=0.3)
    assert abs(float(res.params[0])) < 0.05  # no spurious rotation
    assert res.loss < -0.95  # strong correlation after registration


def test_n4_bias_correct_flattens_field():
    rng = np.random.default_rng(4)
    clean = np.ones((16, 16, 16), np.float32)
    zz = np.linspace(-1, 1, 16)[:, None, None]
    biased = clean * np.exp(0.5 * zz).astype(np.float32)
    corrected = np.asarray(n4_bias_correct(jnp.asarray(biased), grid=(4, 4, 4), iters=3))
    # corrected field should vary less across z than the biased input
    assert corrected.std() < biased.std() * 0.5


def test_rigid_registration_recovers_small_rotation():
    rng = np.random.default_rng(6)
    base = ndi.gaussian_filter(rng.random((24, 24, 24)).astype(np.float32), 2.0)
    angle = 0.1  # ~5.7 degrees about axis 0
    center = (np.asarray(base.shape, np.float32) - 1) / 2
    from cips_tpu.ops.resample import rigid_matrix as _rm

    true_mat = _rm(jnp.asarray([angle, 0, 0, 0, 0, 0], jnp.float32), jnp.asarray(center))
    fixed = affine_warp(jnp.asarray(base), true_mat)
    res = register_rigid(
        jnp.asarray(base), fixed, metric="ncc", pyramid=(2, 1), iters_per_level=80, lr=0.08
    )
    assert res.params[0] == pytest.approx(angle, abs=0.03)
    assert res.loss < -0.9


def test_registration_mi_metric_runs():
    rng = np.random.default_rng(7)
    base = ndi.gaussian_filter(rng.random((16, 16, 16)).astype(np.float32), 1.5)
    matrix = jnp.eye(3, 4).at[2, 3].set(1.5)
    fixed = affine_warp(jnp.asarray(base), matrix)
    res = register_rigid(
        jnp.asarray(base), fixed, metric="mi", pyramid=(1,), iters_per_level=50, lr=0.1
    )
    assert res.params[5] == pytest.approx(1.5, abs=0.5)


def test_ms_ssim_small_volume_no_nan():
    rng = np.random.default_rng(9)
    a = jnp.asarray(rng.random((32, 32, 32)), jnp.float32)
    v = float(ms_ssim(a, a))  # default kernel 11 would exceed 5-scale size
    assert np.isfinite(v) and v == pytest.approx(1.0, abs=1e-4)


def test_mi_registration_cross_modality():
    """PET<->T1-style registration: intensities nonlinearly related, so NCC is
    the wrong metric and MI must still recover the shift (the reason ANTs'
    rigid `reg` uses MI — preprocess/reg_to_T1.py:11-13)."""
    rng = np.random.default_rng(11)
    base = ndi.gaussian_filter(rng.random((20, 20, 20)).astype(np.float32), 2.0)
    base = (base - base.min()) / (base.max() - base.min())
    # "other modality": inverted + squashed intensities of the same anatomy
    other = 1.0 / (1.0 + np.exp(4.0 * (base - 0.5)))
    matrix = jnp.eye(3, 4).at[1, 3].set(2.0)
    fixed = affine_warp(jnp.asarray(other), matrix)
    res = register_rigid(
        jnp.asarray(base), fixed, metric="mi", pyramid=(1,), iters_per_level=120, lr=0.1
    )
    assert res.params[4] == pytest.approx(2.0, abs=0.6)


def test_rigid_registration_large_rotation_multistart():
    """30-degree misalignment: outside the single-basin capture range, the
    multi-start coarsest level (identity + axis-rotation seeds) recovers it
    (ANTs rigid-stage behaviour on large rotations, reg_to_T1.py:11-13)."""
    from cips_tpu.ops.resample import rigid_matrix as _rm

    rng = np.random.default_rng(8)
    base = ndi.gaussian_filter(rng.random((24, 24, 24)).astype(np.float32), 2.0)
    angle = np.pi / 6  # 30 degrees about axis 1
    center = (np.asarray(base.shape, np.float32) - 1) / 2
    true_mat = _rm(jnp.asarray([0, angle, 0, 0, 0, 0], jnp.float32), jnp.asarray(center))
    fixed = affine_warp(jnp.asarray(base), true_mat)
    res = register_rigid(
        jnp.asarray(base), fixed, metric="ncc", pyramid=(2, 1),
        iters_per_level=80, lr=0.08, n_starts=13,
    )
    assert res.params[1] == pytest.approx(angle, abs=0.05)
    assert res.loss < -0.9


def test_rigid_registration_masked_metric_ignores_background():
    """A bright corrupted background band would hijack the global NCC; the
    foreground mask keeps the metric on the anatomy and the shift is
    recovered."""
    rng = np.random.default_rng(9)
    base = ndi.gaussian_filter(rng.random((24, 24, 24)).astype(np.float32), 2.0)
    matrix = jnp.eye(3, 4).at[0, 3].set(2.0)
    fixed = np.array(affine_warp(jnp.asarray(base), matrix))
    moving = base.copy()
    # corrupt a background band differently in each image (structured clutter)
    fixed[:, :3, :] = 3.0
    moving[:, :3, :] = np.linspace(0, 4, 24, dtype=np.float32)[None, :, None][:, :3]
    mask = np.ones_like(fixed)
    mask[:, :4, :] = 0.0
    res = register_rigid(
        jnp.asarray(moving), jnp.asarray(fixed), metric="ncc", pyramid=(2, 1),
        iters_per_level=60, lr=0.1, mask=jnp.asarray(mask),
    )
    assert res.params[3] == pytest.approx(2.0, abs=0.4)


def test_rigid_registration_cross_modality_mi():
    """Cross-modality (intensity-inverted) target with a 15-degree rotation
    and noise: the Parzen-MI metric with multi-start recovers the pose where
    NCC's sign assumption breaks (PET->T1, reg_to_T1.py:62-99)."""
    from cips_tpu.ops.resample import rigid_matrix as _rm

    rng = np.random.default_rng(10)
    base = ndi.gaussian_filter(rng.random((24, 24, 24)).astype(np.float32), 2.0)
    base = (base - base.min()) / (base.max() - base.min())
    angle = np.pi / 12  # 15 degrees
    center = (np.asarray(base.shape, np.float32) - 1) / 2
    true_mat = _rm(jnp.asarray([angle, 0, 0, 0, 0, 0], jnp.float32), jnp.asarray(center))
    fixed = np.array(affine_warp(jnp.asarray(1.0 - base), true_mat))  # inverted modality
    fixed += rng.normal(0, 0.02, fixed.shape).astype(np.float32)
    res = register_rigid(
        jnp.asarray(base), jnp.asarray(fixed), metric="mi", pyramid=(2, 1),
        iters_per_level=80, lr=0.08, n_starts=7,
    )
    assert res.params[0] == pytest.approx(angle, abs=0.06)
