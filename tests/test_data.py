

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
