"""Data layer tests: NIfTI round-trip, manifests, covariates, packing, loader."""

import os

import numpy as np
import pytest

from cips_tpu.data import nifti
from cips_tpu.data.covariates import (
    compute_min_and_max,
    covariate_vector,
    encode_value,
    load_min_and_max,
    merge_covariates,
    save_min_and_max,
)
from cips_tpu.data.dataset import (
    BatchLoader,
    MCIClassificationDataset,
    PackedDataset,
    PairedVolumeDataset,
    pack_pairs,
    pad_crop_np,
)
from cips_tpu.data.manifest import (
    PairRow,
    pair_sessions,
    read_manifest,
    subject_split,
    unpaired_pet_sessions,
    write_manifest,
)


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for ext in (".nii", ".nii.gz"):
        vol = rng.random((5, 7, 6)).astype(np.float32)
        p = str(tmp_path / f"x{ext}")
        nifti.write(p, nifti.NiftiImage(data=vol, spacing=(1.5, 1.0, 2.0)))
        back = nifti.read(p)
        np.testing.assert_allclose(back.data, vol, rtol=1e-6)
        assert back.spacing[:3] == (1.5, 1.0, 2.0)


def test_nifti_int_with_scaling(tmp_path):
    vol = (np.arange(24).reshape(2, 3, 4)).astype(np.int16)
    p = str(tmp_path / "i.nii.gz")
    nifti.write(p, vol)
    np.testing.assert_array_equal(nifti.read_array(p), vol)


def test_pad_crop_np():
    x = np.arange(4 * 6 * 8, dtype=np.float32).reshape(4, 6, 8)
    y = pad_crop_np(x, (6, 4, 4))
    assert y.shape == (6, 4, 4)
    # pad dim0 symmetric: one zero-plane front and back
    assert np.all(y[0] == 0) and np.all(y[-1] == 0)
    # crop dim1 centered
    np.testing.assert_array_equal(y[1, :, 0], x[0, 1:5, 2])


def test_pairing_split_and_manifest_io(tmp_path):
    pet = {"s1": ["2011-01-10", "2013-06-01"], "s2": ["2012-02-02"], "s3": ["2015-01-01"]}
    t1 = {"s1": ["2011-01-01", "2012-01-01"], "s2": ["2012-03-01"], "s3": ["2013-01-01"]}
    rows = pair_sessions(pet, t1, max_days=180)
    got = {(r.subject, r.pet_date, r.t1_date) for r in rows}
    assert ("s1", "2011-01-10", "2011-01-01") in got
    assert ("s2", "2012-02-02", "2012-03-01") in got
    # s1 second PET is >180d from both T1s; s3 is ~2y away
    assert len(rows) == 2
    missing = unpaired_pet_sessions(pet, t1, max_days=180)
    assert ("s3", "2015-01-01") in missing and ("s1", "2013-06-01") in missing

    train, test = subject_split(rows, train_frac=0.5, seed=100)
    train_subj = {r.subject for r in train}
    test_subj = {r.subject for r in test}
    assert not (train_subj & test_subj)

    p = str(tmp_path / "m.csv")
    write_manifest(p, rows)
    back = read_manifest(p)
    assert {(r.subject, r.pet_date) for r in back} == {(r.subject, r.pet_date) for r in rows}


def test_covariate_encode_merge_stats(tmp_path):
    assert encode_value("Sex", "Female") == 0.0
    assert encode_value("Sex", "Male") == 1.0
    assert encode_value("ABETA", "<200") == 0.0
    assert encode_value("ABETA", ">1700") == 2000.0
    assert encode_value("TAU", "312.4") == pytest.approx(312.4)
    assert encode_value("TAU", "") is None

    rows = [PairRow("s1", "2011-01-01", "2011-01-10"), PairRow("s2", "2012-01-01", "2012-01-06")]
    exams = {
        "s1": [
            {"EXAMDATE": "2010-01-10", "TAU": "100", "Age": "70", "Sex": "Female"},
            {"EXAMDATE": "2011-01-05", "TAU": "200", "Age": "71", "Sex": "Female"},
        ],
        "s2": [{"EXAMDATE": "2012-01-01", "TAU": "300", "Age": "80", "Sex": "Male"}],
    }
    merged = merge_covariates(rows, exams, ["TAU", "Age", "Sex"])
    assert len(merged) == 2
    m1 = merged[0]
    # nearest exam is 2011-01-05 (5 days), NOT the 2010 one — argmin bug fixed
    assert float(m1.values["TAU"]) == 200.0
    # age drift: 5 days
    assert float(m1.values["Age"]) == pytest.approx(71 + 5 / 365.0)

    stats = compute_min_and_max(merged, keys=("TAU", "Age"))
    assert stats["TAU"] == (200.0, 300.0)
    sp = str(tmp_path / "stats.json")
    save_min_and_max(sp, stats)
    assert load_min_and_max(sp)["TAU"] == (200.0, 300.0)

    vec = covariate_vector(m1, ["TAU", "Age", "Sex"], stats)
    assert vec.shape == (3,)
    assert vec[0] == 0.0  # min-max normalised to 0


def _make_tree(tmp_path, rows, shape=(10, 12, 10)):
    rng = np.random.default_rng(1)
    t1_dir = tmp_path / "t1"
    pet_dir = tmp_path / "pet"
    for r in rows:
        for base, date in ((t1_dir, r.t1_date), (pet_dir, r.pet_date)):
            d = base / r.subject / date
            d.mkdir(parents=True, exist_ok=True)
            nifti.write(str(d / "img.nii.gz"), rng.random(shape).astype(np.float32))
    return str(pet_dir), str(t1_dir)


def test_paired_dataset_pack_and_loader(tmp_path):
    rows = [
        PairRow("s1", "2011-01-01", "2011-01-10", {"TAU": "100", "Age": "70"}),
        PairRow("s2", "2012-01-01", "2012-01-06", {"TAU": "300", "Age": "80"}),
        PairRow("s3", "2013-01-01", "2013-01-06", {"TAU": "200", "Age": "75"}),
    ]
    csv_path = str(tmp_path / "pairs.csv")
    write_manifest(csv_path, rows)
    pet_dir, t1_dir = _make_tree(tmp_path, rows)

    ds = PairedVolumeDataset(
        csv_path,
        pet_dir=pet_dir,
        t1_dir=t1_dir,
        crop_size=(8, 8, 8),
        need_values=["TAU", "Age"],
        min_and_max={"TAU": (100, 300), "Age": (70, 80)},
    )
    assert len(ds) == 3
    s = ds[0]
    assert s.t1.shape == (8, 8, 8)
    assert s.pet.max() <= 1.0 + 1e-6
    assert s.info.shape == (2,)

    out = pack_pairs(ds, str(tmp_path / "packed"))
    packed = PackedDataset(out)
    assert len(packed) == 3
    loader = BatchLoader(packed, batch_size=2, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 1  # drop_last
    b = batches[0]
    assert b["t1"].shape == (2, 8, 8, 8, 1)
    assert b["info"].shape == (2, 1, 2)

    # host sharding partitions samples disjointly
    l0 = BatchLoader(packed, batch_size=1, shuffle=False, process_index=0, process_count=2)
    l1 = BatchLoader(packed, batch_size=1, shuffle=False, process_index=1, process_count=2)
    n0 = sum(1 for _ in l0.epoch(0))
    n1 = sum(1 for _ in l1.epoch(0))
    assert n0 + n1 == 3


def test_mci_dataset_excludes_post_conversion(tmp_path):
    rows = [
        PairRow("s1", "2011-01-01", "2011-01-10", {"ABETA": "500"}),
        PairRow("s1", "2014-01-01", "2014-01-10", {"ABETA": "500"}),
        PairRow("s2", "2012-01-01", "2012-01-06", {"ABETA": "900"}),
    ]
    csv_path = str(tmp_path / "pairs.csv")
    write_manifest(csv_path, rows)
    pet_dir, t1_dir = _make_tree(tmp_path, rows)
    conv_csv = tmp_path / "conv.csv"
    conv_csv.write_text(
        "Subject,MCI_converter,Converter_date\ns1,1,2013-01-01\ns2,0,\n", encoding="utf-8"
    )

    ds = MCIClassificationDataset(
        csv_path,
        str(conv_csv),
        pet_dir=pet_dir,
        t1_dir=t1_dir,
        crop_size=(8, 8, 8),
        need_values=["ABETA"],
        min_and_max={"ABETA": (0, 1000)},
    )
    # s1's 2014 scan is on/after conversion -> excluded
    assert len(ds) == 2
    imgs, info, label, subject, *_ = ds[0]
    assert imgs.shape == (8, 8, 8, 2)  # PET + T1 channels-last
    # ABETA inverted after min-max: 1 - 0.5
    assert info[0] == pytest.approx(0.5)
    assert label in (0, 1)


def test_streaming_loader(tmp_path):
    rows = [
        PairRow(f"s{i}", f"2011-01-0{i+1}", f"2011-01-1{i+1}", {"TAU": str(100 + i)})
        for i in range(3)
    ]
    csv_path = str(tmp_path / "pairs.csv")
    write_manifest(csv_path, rows)
    pet_dir, t1_dir = _make_tree(tmp_path, rows)
    from cips_tpu.data.dataset import PairedVolumeDataset, StreamingLoader

    ds = PairedVolumeDataset(
        csv_path, pet_dir=pet_dir, t1_dir=t1_dir, crop_size=(8, 8, 8),
        need_values=["TAU"], min_and_max={"TAU": (100, 102)},
    )
    loader = StreamingLoader(ds, batch_size=2, seed=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 1
    b = batches[0]
    assert b["t1"].shape == (2, 8, 8, 8, 1)
    assert b["info"].shape == (2, 1, 1)
    assert b["pet"].max() <= 1.0 + 1e-6
    # epoch 2 yields a (possibly) different sample subset but same shapes
    again = list(loader.epoch(1))
    assert len(again) == 1


def test_paired_latent_dataset(tmp_path):
    rows = [PairRow("s1", "2011-01-01", "2011-01-10")]
    csv_path = str(tmp_path / "pairs.csv")
    write_manifest(csv_path, rows)
    _, t1_dir = _make_tree(tmp_path, rows)
    lat_dir = tmp_path / "latents" / "s1" / "2011-01-10"
    lat_dir.mkdir(parents=True)
    lat = np.random.default_rng(0).random((4, 4, 4, 3)).astype(np.float32)
    np.save(lat_dir / "latent.npy", lat)

    from cips_tpu.data.dataset import PairedLatentDataset

    ds = PairedLatentDataset(
        csv_path, latent_dir=str(tmp_path / "latents"), t1_dir=t1_dir, crop_size=(8, 8, 8)
    )
    assert len(ds) == 1
    t1, latent, info, subject, t1_date, pet_date = ds[0]
    assert t1.shape == (8, 8, 8)
    np.testing.assert_array_equal(latent, lat)
    assert subject == "s1"


def test_dataset_resize_and_4d_squeeze(tmp_path):
    rows = [PairRow("s1", "2011-01-01", "2011-01-10")]
    csv_path = str(tmp_path / "pairs.csv")
    write_manifest(csv_path, rows)
    # 4-D volume with singleton frame axis
    rng = np.random.default_rng(5)
    for base, date in (("t1", "2011-01-01"), ("pet", "2011-01-10")):
        d = tmp_path / base / "s1" / date
        d.mkdir(parents=True)
        nifti.write(str(d / "img.nii.gz"), rng.random((1, 10, 12, 10)).astype(np.float32))
    assert nifti.read_array(str(tmp_path / "t1" / "s1" / "2011-01-01" / "img.nii.gz")).shape == (10, 12, 10)

    ds = PairedVolumeDataset(
        csv_path, pet_dir=str(tmp_path / "pet"), t1_dir=str(tmp_path / "t1"),
        crop_size=(8, 8, 8), resize_size=(4, 4, 4),
    )
    s = ds[0]
    assert s.t1.shape == (4, 4, 4)
    assert s.t1.max() <= 1.0 + 1e-6
