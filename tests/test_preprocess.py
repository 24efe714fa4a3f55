

def test_t1_downsample_with_template(tmp_path):
    """--template enables the MNI-first branch (reg_to_T1.py:25-60): the T1
    is rigid-registered onto the template grid before mm-resampling, so a
    translated copy of the template lands (approximately) back on it."""
    import numpy as np

    from cips_tpu.data import nifti, preprocess

    rng = np.random.default_rng(0)
    base = np.zeros((24, 24, 24), np.float32)
    base[6:18, 8:16, 6:18] = 1.0
    base += rng.random(base.shape).astype(np.float32) * 0.05

    template_path = tmp_path / "template.nii.gz"
    nifti.write(str(template_path), base)

    moved = np.roll(base, shift=2, axis=0)  # 2-voxel z translation
    t1_root = tmp_path / "t1"
    d = t1_root / "subjA" / "2011-01-01"
    d.mkdir(parents=True)
    nifti.write(str(d / "img.nii.gz"), moved)

    out_root = tmp_path / "out"
    n = preprocess.create_t1_downsample(
        str(t1_root), str(out_root), new_spacing=(1.0, 1.0, 1.0),
        crop_size=(24, 24, 24), bias_correct=False,
        template_path=str(template_path),
    )
    assert n == 1
    out = nifti.read_array(str(out_root / "subjA" / "2011-01-01" / "t1_ds.nii.gz"))
    # registration should undo most of the 2-voxel shift
    err_reg = np.abs(out - base).mean()
    err_unreg = np.abs(moved - base).mean()
    assert err_reg < 0.5 * err_unreg, (err_reg, err_unreg)
