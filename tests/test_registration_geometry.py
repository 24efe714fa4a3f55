"""Real-geometry registration validation + NIfTI header zoo.

ADNI-realistic synthetic cases for the rigid chain the reference runs with
ANTs (`preprocess/reg_to_T1.py:62-99`): anisotropic spacings (2-3mm PET
slices vs ~1mm T1), oblique direction cosines, shifted FOV origins, a
multiplicative bias field, noise, and a true inter-scan rigid motion.
`register_rigid_physical` must recover the alignment where voxel-space
rigid cannot (the transform is only rigid in PHYSICAL coordinates).

The header zoo exercises the pure-numpy NIfTI reader on the header
variants real ADNI exports carry: qform-only oblique geometry, big-endian
files, int16 with scl_slope scaling.
"""

import gzip
import struct

import numpy as np
import pytest

import jax.numpy as jnp

from cips_tpu.data import nifti
from cips_tpu.ops.registration import (
    apply_transform,
    register_rigid_physical,
)


# ---------------------------------------------------------------------------
# physical phantom
# ---------------------------------------------------------------------------


def _phantom(coords_zyx: np.ndarray) -> np.ndarray:
    """Brain-like structure in physical mm: ellipsoid shell + inner blobs."""
    z, y, x = coords_zyx[..., 0], coords_zyx[..., 1], coords_zyx[..., 2]
    r2 = (z / 22.0) ** 2 + (y / 28.0) ** 2 + (x / 24.0) ** 2
    shell = np.exp(-((r2 - 0.75) ** 2) / 0.02)
    val = 0.6 * np.exp(-np.maximum(r2 - 0.75, 0.0) / 0.05)  # interior
    for (cz, cy, cx), s, a in (
        ((0.0, 8.0, -6.0), 7.0, 0.9),
        ((5.0, -10.0, 4.0), 5.0, 0.7),
        ((-8.0, 2.0, 9.0), 4.0, 1.0),
    ):
        d2 = (z - cz) ** 2 + (y - cy) ** 2 + (x - cx) ** 2
        val = val + a * np.exp(-d2 / (2 * s * s))
    return (val + 0.8 * shell).astype(np.float32)


def _rot_xyz(rx, ry, rz):
    cx, sx, cy, sy, cz, sz = np.cos(rx), np.sin(rx), np.cos(ry), np.sin(ry), np.cos(rz), np.sin(rz)
    mx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    my = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    mz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return mz @ my @ mx


def _affine(spacing_xyz, rot=np.eye(3), origin=(0.0, 0.0, 0.0)):
    a = np.eye(4)
    a[:3, :3] = rot @ np.diag(spacing_xyz)
    a[:3, 3] = origin
    return a


def _grid_physical(shape_zyx, affine_xyz):
    """Physical zyx coordinates of every voxel of a (z,y,x) grid."""
    zz, yy, xx = np.meshgrid(*[np.arange(s, dtype=np.float64) for s in shape_zyx], indexing="ij")
    vox_xyz = np.stack([xx, yy, zz, np.ones_like(xx)], axis=-1)
    phys = vox_xyz @ affine_xyz.T  # (..., 4) xyz physical
    return np.stack([phys[..., 2], phys[..., 1], phys[..., 0]], axis=-1)


def _masked_corr(a, b, mask):
    a, b = np.asarray(a)[mask], np.asarray(b)[mask]
    a = a - a.mean()
    b = b - b.mean()
    return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum() + 1e-9))


def _make_case(motion_deg=4.0, motion_mm=(3.0, -2.0, 2.5), bias=True, seed=0):
    rng = np.random.default_rng(seed)
    # T1: near-isotropic, slightly oblique, centered FOV
    t1_shape = (56, 64, 56)
    t1_rot = _rot_xyz(np.deg2rad(2.0), np.deg2rad(-1.5), np.deg2rad(1.0))
    t1_aff = _affine((1.0, 1.0, 1.2), t1_rot,
                     origin=-t1_rot @ np.diag((1.0, 1.0, 1.2)) @ np.array([27.5, 31.5, 27.0]))
    t1 = _phantom(_grid_physical(t1_shape, t1_aff))
    if bias:
        # smooth multiplicative bias field (the artifact N4 exists for)
        zz, yy, xx = np.meshgrid(*[np.linspace(-1, 1, s) for s in t1_shape], indexing="ij")
        t1 = t1 * np.exp(0.25 * (0.8 * xx + 0.5 * yy - 0.4 * zz)).astype(np.float32)
    t1 += rng.normal(0, 0.01, t1.shape).astype(np.float32)

    # PET: thick oblique slices, cropped FOV, shifted origin, true motion
    pet_shape = (26, 52, 52)
    pet_rot = _rot_xyz(np.deg2rad(-1.0), np.deg2rad(2.0), np.deg2rad(-2.5))
    pet_aff = _affine((1.2, 1.2, 2.4), pet_rot,
                      origin=-pet_rot @ np.diag((1.2, 1.2, 2.4)) @ np.array([25.5, 25.5, 12.5]))
    # true physical motion (tissue moved between scans)
    mrot = _rot_xyz(*np.deg2rad([motion_deg, -motion_deg / 2, motion_deg / 1.5]))
    motion = _affine((1.0, 1.0, 1.0), mrot, origin=np.asarray(motion_mm))
    pet_coords = _grid_physical(pet_shape, pet_aff)
    # zyx physical -> xyz -> motion -> zyx
    xyz = np.stack([pet_coords[..., 2], pet_coords[..., 1], pet_coords[..., 0],
                    np.ones_like(pet_coords[..., 0])], axis=-1)
    moved = xyz @ motion.T
    pet = _phantom(np.stack([moved[..., 2], moved[..., 1], moved[..., 0]], axis=-1))
    pet += rng.normal(0, 0.01, pet.shape).astype(np.float32)
    return t1.astype(np.float32), t1_aff, pet.astype(np.float32), pet_aff


def test_physical_registration_header_only_anisotropic():
    """Zero motion: header-based initial alignment alone must land the PET
    on the T1 grid (anisotropic + oblique + cropped FOV)."""
    t1, t1_aff, pet, pet_aff = _make_case(motion_deg=0.0, motion_mm=(0, 0, 0), bias=False)
    res = register_rigid_physical(
        jnp.asarray(pet), jnp.asarray(t1), pet_aff, t1_aff,
        pyramid=(2,), iters_per_level=0,
    )
    warped = apply_transform(jnp.asarray(pet), res.matrix, out_shape=t1.shape)
    mask = t1 > 0.2
    assert _masked_corr(warped, t1, mask) > 0.95


def test_physical_registration_recovers_adni_like_motion():
    """Real-geometry case: 4deg/3mm inter-scan motion on top of oblique
    anisotropic headers + bias field. The optimiser must beat the
    header-only alignment and reach high agreement."""
    t1, t1_aff, pet, pet_aff = _make_case()
    mask = t1 > 0.2

    header_only = register_rigid_physical(
        jnp.asarray(pet), jnp.asarray(t1), pet_aff, t1_aff, pyramid=(2,), iters_per_level=0
    )
    base = _masked_corr(
        apply_transform(jnp.asarray(pet), header_only.matrix, out_shape=t1.shape), t1, mask
    )

    res = register_rigid_physical(
        jnp.asarray(pet), jnp.asarray(t1), pet_aff, t1_aff,
        pyramid=(2, 1), iters_per_level=120,
    )
    warped = apply_transform(jnp.asarray(pet), res.matrix, out_shape=t1.shape)
    corr = _masked_corr(warped, t1, mask)
    assert corr > base + 0.01, (corr, base)
    assert corr > 0.93, (corr, base)
    # recovered motion magnitude in the right range (true: ~4 deg, ~4.4 mm)
    rot_mag = float(np.abs(np.asarray(res.params[:3])).max())
    assert 0.01 < rot_mag < 0.2


# ---------------------------------------------------------------------------
# NIfTI header zoo
# ---------------------------------------------------------------------------


def _base_header(endian, shape_xyz, datatype, bitpix, pixdim, scl=(1.0, 0.0)):
    hdr = bytearray(348)
    struct.pack_into(endian + "i", hdr, 0, 348)
    dim = [len(shape_xyz)] + list(shape_xyz) + [1] * (7 - len(shape_xyz))
    struct.pack_into(endian + "8h", hdr, 40, *dim)
    struct.pack_into(endian + "h", hdr, 70, datatype)
    struct.pack_into(endian + "h", hdr, 72, bitpix)
    struct.pack_into(endian + "8f", hdr, 76, *pixdim)
    struct.pack_into(endian + "f", hdr, 108, 352.0)
    struct.pack_into(endian + "f", hdr, 112, scl[0])
    struct.pack_into(endian + "f", hdr, 116, scl[1])
    hdr[344:348] = b"n+1\x00"
    return hdr


def test_header_zoo_qform_only_oblique(tmp_path):
    """qform-only geometry (common in raw ADNI exports): the affine must
    come from the quaternion + qoffset, with qfac handling."""
    rot = _rot_xyz(0.0, 0.0, np.deg2rad(30.0))  # rotation about z by 30 deg
    # quaternion for rot-z(30): (a, b, c, d) = (cos15, 0, 0, sin15)
    b, c, d = 0.0, 0.0, float(np.sin(np.deg2rad(15.0)))
    hdr = _base_header("<", (4, 5, 6), 16, 32, (1.0, 1.1, 1.2, 2.0, 1, 1, 1, 1))
    struct.pack_into("<h", hdr, 252, 1)  # qform_code
    struct.pack_into("<h", hdr, 254, 0)  # no sform
    struct.pack_into("<3f", hdr, 256, b, c, d)
    struct.pack_into("<3f", hdr, 268, 10.0, -20.0, 30.0)
    data = np.arange(4 * 5 * 6, dtype=np.float32)
    path = str(tmp_path / "qform.nii")
    with open(path, "wb") as f:
        f.write(bytes(hdr) + b"\x00" * 4 + data.tobytes())
    img = nifti.read(path)
    want_rr = rot @ np.diag([1.1, 1.2, 2.0])
    np.testing.assert_allclose(img.affine[:3, :3], want_rr, atol=1e-5)
    np.testing.assert_allclose(img.affine[:3, 3], [10.0, -20.0, 30.0], atol=1e-6)
    assert img.data.shape == (6, 5, 4)


def test_header_zoo_big_endian_int16_scaled(tmp_path):
    """Big-endian int16 with scl_slope/scl_inter intensity scaling."""
    hdr = _base_header(">", (3, 4, 5), 4, 16, (1.0, 1.0, 1.0, 1.0, 1, 1, 1, 1),
                       scl=(2.5, -10.0))
    data = np.arange(3 * 4 * 5, dtype=">i2")
    path = str(tmp_path / "be.nii.gz")
    with gzip.open(path, "wb") as f:
        f.write(bytes(hdr) + b"\x00" * 4 + data.tobytes())
    img = nifti.read(path)
    assert img.data.shape == (5, 4, 3)
    np.testing.assert_allclose(
        img.data.reshape(-1)[:4], np.arange(4) * 2.5 - 10.0, atol=1e-5
    )


def test_header_zoo_sform_oblique_roundtrip(tmp_path):
    """Oblique sform affines survive our writer/reader round trip."""
    rot = _rot_xyz(np.deg2rad(5), np.deg2rad(-3), np.deg2rad(7))
    aff = _affine((0.9, 1.0, 2.2), rot, origin=(-12.0, 4.0, 99.0))
    vol = np.random.default_rng(0).random((6, 8, 10)).astype(np.float32)
    path = str(tmp_path / "oblique.nii.gz")
    nifti.write(path, nifti.NiftiImage(data=vol, affine=aff, spacing=(0.9, 1.0, 2.2)))
    img = nifti.read(path)
    np.testing.assert_allclose(img.affine, aff, atol=1e-4)
    np.testing.assert_allclose(img.data, vol, atol=0)
