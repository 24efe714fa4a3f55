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


def test_native_prefetcher_drain_stress(tmp_path):
    """Epoch-tail race regression (nifti_loader.cpp in_flight tracking):
    next() must serve EVERY submitted index before returning -1, even with
    more threads than queue slots and repeated epochs. The pre-fix code
    returned -1 while workers were still decoding the tail."""
    rng = np.random.default_rng(2)
    n = 64
    shape = (4, 4, 4)
    t1_paths, pet_paths = [], []
    for i in range(n):
        tp = tmp_path / f"t1_{i}.nii.gz"
        pp = tmp_path / f"pet_{i}.nii.gz"
        _write(tp, rng.random(shape).astype(np.float32))
        _write(pp, rng.random(shape).astype(np.float32))
        t1_paths.append(str(tp))
        pet_paths.append(str(pp))

    pf = native.NativePrefetcher(t1_paths, pet_paths, shape, n_threads=6, capacity=2)
    for epoch in range(5):
        pf.submit(list(range(n)))
        seen = []
        while True:
            idx, sample = pf.next()
            if idx == -1:
                break
            assert sample is not None
            seen.append(idx)
            if len(seen) == n:
                break
        assert sorted(seen) == list(range(n)), f"epoch {epoch} dropped samples"
    assert pf.errors == 0
    pf.close()


def test_native_prefetcher_signals_decode_failure(tmp_path):
    """Unreadable files must surface as (index, None), never as silent
    zero-filled volumes (nifti_loader.cpp worker error path)."""
    rng = np.random.default_rng(3)
    shape = (4, 4, 4)
    good_t1 = tmp_path / "t1_good.nii.gz"
    good_pet = tmp_path / "pet_good.nii.gz"
    _write(good_t1, rng.random(shape).astype(np.float32))
    _write(good_pet, rng.random(shape).astype(np.float32))
    bad = tmp_path / "missing.nii.gz"  # never created

    pf = native.NativePrefetcher(
        [str(good_t1), str(bad)], [str(good_pet), str(good_pet)], shape, n_threads=2
    )
    pf.submit([0, 1])
    results = {}
    for _ in range(2):
        idx, sample = pf.next()
        assert idx >= 0
        results[idx] = sample
    assert results[0] is not None
    assert results[1] is None  # decode failure signalled, not zero-filled
    assert pf.errors == 1
    idx, _ = pf.next()
    assert idx == -1  # drained
    pf.close()


def test_streaming_loader_skips_failed_samples(tmp_path):
    """StreamingLoader serves every readable sample, warns on unreadable
    ones, and still flushes the final partial batch (dataset.py epoch loop)."""
    import warnings

    from cips_tpu.data.dataset import PairedVolumeDataset, StreamingLoader

    rng = np.random.default_rng(4)
    shape = (4, 4, 4)
    rows = []
    t1_dir = tmp_path / "t1"
    pet_dir = tmp_path / "pet"
    for i in range(5):
        subj, date = f"s{i}", "2011-01-01"
        for base in (t1_dir, pet_dir):
            d = base / subj / date
            d.mkdir(parents=True)
            _write(d / "img.nii.gz", rng.random(shape).astype(np.float32))
        rows.append({"Subject": subj, "T1_date": date, "PET_date": date})
    # corrupt the LAST sample's t1 so the failure lands on the epoch tail
    bad = t1_dir / "s4" / "2011-01-01" / "img.nii.gz"
    bad.write_bytes(b"not a nifti")

    csv_path = tmp_path / "pairs.csv"
    csv_path.write_text(
        "Subject,T1_date,PET_date\n"
        + "\n".join(f"{r['Subject']},{r['T1_date']},{r['PET_date']}" for r in rows)
        + "\n"
    )
    ds = PairedVolumeDataset(
        str(csv_path), crop_size=shape, pet_dir=str(pet_dir), t1_dir=str(t1_dir),
    )
    assert len(ds) == 5
    loader = StreamingLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    if loader._prefetcher is None:
        pytest.skip("native prefetcher unavailable")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        batches = list(loader.epoch(0))
    assert sum(b["t1"].shape[0] for b in batches) == 4  # 5 - 1 failed
    assert any("unreadable" in str(x.message) for x in w)
