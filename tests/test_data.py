import pytest


def test_pack_mci_round_trip(tmp_path):
    """pack_mci + MCIBatchLoader reproduce the per-sample decode exactly."""
    import csv as _csv

    import numpy as np

    from cips_tpu.data import nifti
    from cips_tpu.data.dataset import (
        MCIBatchLoader,
        MCIClassificationDataset,
        PackedMCIDataset,
        pack_mci,
    )

    rng = np.random.default_rng(0)
    subjects = [f"s{i}" for i in range(5)]
    date = "2012-01-01"
    for kind in ("pet", "t1"):
        for s in subjects:
            d = tmp_path / kind / s / date
            d.mkdir(parents=True)
            nifti.write(str(d / "img.nii.gz"), rng.random((6, 8, 6), np.float32))
    manifest = tmp_path / "info.csv"
    with open(manifest, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["Subject", "PET_date", "T1_date", "ABETA", "Age"])
        for i, s in enumerate(subjects):
            w.writerow([s, date, date, str(0.2 + 0.1 * i), str(0.5)])
    conv = tmp_path / "conv.csv"
    with open(conv, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["PTID", "MCI_converter", "conversion_date"])
        for i, s in enumerate(subjects):
            w.writerow([s, str(i % 2), "2015-01-01"])

    ds = MCIClassificationDataset(
        str(manifest), converter_csv=str(conv), pet_dir=str(tmp_path / "pet"),
        t1_dir=str(tmp_path / "t1"), crop_size=(6, 8, 6),
        need_values=["ABETA", "Age"], use_pet=True, use_t1=True,
    )
    assert len(ds) > 0
    out = pack_mci(ds, str(tmp_path / "packed"))
    packed = PackedMCIDataset(out)
    assert len(packed) == len(ds)

    loader = MCIBatchLoader(packed, 2, shuffle=False, drop_last=False)
    got = list(loader.epoch(0))
    flat_imgs = np.concatenate([b["imgs"] for b in got])
    flat_info = np.concatenate([b["info"] for b in got])[:, 0]
    flat_labels = np.concatenate([b["labels"] for b in got])
    for i in range(len(ds)):
        imgs, info, label, *_ = ds[i]
        np.testing.assert_allclose(flat_imgs[i], imgs, atol=1e-3)  # fp16 pack
        np.testing.assert_allclose(flat_info[i], info, atol=1e-6)
        assert flat_labels[i] == label


def test_batchloader_random_crop(tmp_path):
    """Random-crop loader path: joint t1/pet offset, post-crop max-norm."""
    import numpy as np

    from cips_tpu.data.dataset import BatchLoader, PackedDataset

    rng = np.random.default_rng(0)
    n, d, h, w = 4, 8, 8, 8
    vols = np.lib.format.open_memmap(
        str(tmp_path / "volumes.npy"), mode="w+", dtype=np.float16, shape=(n, 2, d, h, w)
    )
    vols[:] = rng.random((n, 2, d, h, w)).astype(np.float16)
    vols.flush()
    np.save(str(tmp_path / "covariates.npy"), np.zeros((n, 3), np.float32))
    import json as _json

    (tmp_path / "index.json").write_text(_json.dumps({"need_values": ["a", "b", "c"], "rows": []}))

    loader = BatchLoader(
        PackedDataset(str(tmp_path)), 2, seed=1, random_crop_size=(4, 6, 4)
    )
    batches = list(loader.epoch(0))
    assert batches and batches[0]["t1"].shape == (2, 4, 6, 4, 1)
    for b in batches:
        for key in ("t1", "pet"):
            assert np.isfinite(b[key]).all()
            assert b[key].max() == pytest.approx(1.0, abs=1e-3)  # re-normalised


def test_paired_dataset_random_crop(tmp_path):
    import csv as _csv

    import numpy as np

    from cips_tpu.data import nifti
    from cips_tpu.data.dataset import PairedVolumeDataset

    rng = np.random.default_rng(0)
    date = "2012-01-01"
    for kind in ("pet", "t1"):
        d = tmp_path / kind / "s0" / date
        d.mkdir(parents=True)
        nifti.write(str(d / "img.nii.gz"), rng.random((8, 10, 8), np.float32))
    manifest = tmp_path / "info.csv"
    with open(manifest, "w", newline="") as f:
        wr = _csv.writer(f)
        wr.writerow(["Subject", "PET_date", "T1_date"])
        wr.writerow(["s0", date, date])
    ds = PairedVolumeDataset(
        str(manifest), pet_dir=str(tmp_path / "pet"), t1_dir=str(tmp_path / "t1"),
        crop_size=(8, 10, 8), random_crop_size=(4, 6, 4), seed=3,
    )
    s = ds[0]
    assert s.t1.shape == (4, 6, 4) and s.pet.shape == (4, 6, 4)
    assert s.t1.max() == pytest.approx(1.0, abs=1e-5)
