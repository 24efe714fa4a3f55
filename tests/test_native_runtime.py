"""Native C++ runtime vs pure-Python NIfTI path: decode parity + prefetcher."""

import numpy as np
import pytest

from cips_tpu.data import nifti
from cips_tpu.data.dataset import max_normalize_np, pad_crop_np
from cips_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")


def _write(path, vol, **kw):
    nifti.write(str(path), nifti.NiftiImage(data=vol, **kw))


def test_native_decode_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    for name, vol in [
        ("f32.nii.gz", rng.random((9, 11, 7)).astype(np.float32)),
        ("i16.nii", (rng.integers(0, 1000, (5, 6, 7))).astype(np.int16)),
    ]:
        p = tmp_path / name
        _write(p, vol)
        shape = (8, 8, 8)
        want = max_normalize_np(pad_crop_np(vol.astype(np.float32), shape))
        got = native.decode(str(p), shape, normalize=True)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
        # unnormalised path
        want_raw = pad_crop_np(vol.astype(np.float32), shape)
        got_raw = native.decode(str(p), shape, normalize=False)
        np.testing.assert_allclose(got_raw, want_raw, rtol=1e-6)


def test_native_shape_query(tmp_path):
    vol = np.zeros((4, 5, 6), np.float32)
    p = tmp_path / "s.nii.gz"
    _write(p, vol)
    assert native.nifti_shape(str(p)) == (4, 5, 6)


def test_native_prefetcher_round_trip(tmp_path):
    rng = np.random.default_rng(1)
    n = 5
    shape = (6, 6, 6)
    t1_paths, pet_paths, vols = [], [], []
    for i in range(n):
        t1 = rng.random(shape).astype(np.float32)
        pet = rng.random(shape).astype(np.float32)
        tp = tmp_path / f"t1_{i}.nii.gz"
        pp = tmp_path / f"pet_{i}.nii.gz"
        _write(tp, t1)
        _write(pp, pet)
        t1_paths.append(str(tp))
        pet_paths.append(str(pp))
        vols.append((max_normalize_np(t1), max_normalize_np(pet)))

    pf = native.NativePrefetcher(t1_paths, pet_paths, shape, n_threads=2, capacity=4)
    pf.submit(list(range(n)))
    seen = {}
    for _ in range(n):
        idx, sample = pf.next()
        assert idx >= 0
        seen[idx] = sample
    assert sorted(seen) == list(range(n))
    for i in range(n):
        np.testing.assert_allclose(seen[i][0], vols[i][0], rtol=1e-6)
        np.testing.assert_allclose(seen[i][1], vols[i][1], rtol=1e-6)
    assert pf.errors == 0
    pf.close()
