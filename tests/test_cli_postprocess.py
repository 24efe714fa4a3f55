"""End-to-end postprocess CLI: suvr -> suvr-error -> analyse -> summary."""

import os

import numpy as np
import pytest

from cips_tpu.data import nifti


@pytest.fixture()
def suvr_tree(tmp_path):
    """PET volumes + FastSurfer-style segmentations for two subjects."""
    rng = np.random.default_rng(0)
    shape = (16, 16, 16)
    seg = np.zeros(shape, np.int32)
    seg[:8] = 3  # left cerebral cortex (ROI)
    seg[8:] = 8  # cerebellum (REF)
    for subj, date, roi_val in (("s1", "2011-01-01", 2.0), ("s2", "2012-01-01", 3.0)):
        pet = np.ones(shape, np.float32)
        pet[:8] = roi_val
        d = tmp_path / "pet" / subj / date
        d.mkdir(parents=True)
        nifti.write(str(d / "rec.nii.gz"), pet)
        # ground-truth PET slightly different
        nifti.write(str(d / "ori.nii.gz"), pet * 1.1)
        sd = tmp_path / "seg" / subj / date
        sd.mkdir(parents=True)
        nifti.write(str(sd / "aseg.nii.gz"), seg)
    return tmp_path


def test_postprocess_suvr_chain(suvr_tree, tmp_path):
    from cips_tpu.cli import postprocess

    out_csv = str(suvr_tree / "suvr_synth.csv")
    postprocess.main([
        "suvr", "--pet_dir", str(suvr_tree / "pet"), "--seg_dir", str(suvr_tree / "seg"),
        "--pet_name", "rec.nii.gz", "--seg_kind", "fastsurfer", "--out_csv", out_csv,
    ])
    import csv

    rows = list(csv.DictReader(open(out_csv)))
    assert len(rows) == 2
    by_subj = {r["Subject"]: float(r["suvr"]) for r in rows}
    assert by_subj["s1"] == pytest.approx(2.0, rel=1e-5)
    assert by_subj["s2"] == pytest.approx(3.0, rel=1e-5)

    gt_csv = str(suvr_tree / "suvr_gt.csv")
    postprocess.main([
        "suvr", "--pet_dir", str(suvr_tree / "pet"), "--seg_dir", str(suvr_tree / "seg"),
        "--pet_name", "ori.nii.gz", "--seg_kind", "fastsurfer", "--out_csv", gt_csv,
    ])
    # SUVR is a ratio: global 1.1x scaling cancels -> error ~0
    postprocess.main(["suvr-error", "--gt_csv", gt_csv, "--synth_csv", out_csv])

    # longitudinal analysis + cohort summary
    dx_csv = suvr_tree / "dx.csv"
    dx_csv.write_text(
        "PTID,EXAMDATE,DX,PTGENDER,AGE\n"
        "s1,2010-06-01,CN,Female,71\ns1,2012-06-01,MCI,Female,73\n"
        "s2,2011-06-01,MCI,Male,68\ns2,2013-06-01,MCI,Male,70\n"
    )
    fig = str(tmp_path / "groups.jpg")
    postprocess.main([
        "analyse", "--suvr_csv", out_csv, "--dx_csv", str(dx_csv), "--out_fig", fig,
    ])
    assert os.path.exists(fig)

    manifest = suvr_tree / "pairs.csv"
    manifest.write_text(
        "Subject,T1_date,PET_date\ns1,2011-01-01,2011-01-01\ns2,2012-01-01,2012-01-01\n"
    )
    postprocess.main([
        "summary", "--manifest", str(manifest), "--adnimerge_csv", str(dx_csv),
    ])


def test_covariate_sets_per_tracer():
    from cips_tpu.cli.common import covariates_for

    assert covariates_for("AV45", True) == ["ABETA", "Age", "Sex", "APOE4", "PTEDUCAT"]
    assert covariates_for("AV1451", True) == ["TAU", "PTAU", "Age", "Sex", "APOE4", "PTEDUCAT"]
    assert covariates_for("AV45", False) == []
