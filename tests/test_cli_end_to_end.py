"""End-to-end CLI test: pair -> stats -> pack -> train -> predict -> metrics.

Exercises the full surface of the flagship workload on a synthetic ADNI-like
tree at tiny shapes, driving the same CLI mains a user would.
"""

import json
import os

import numpy as np
import pytest

from cips_tpu.data import nifti

TINY_MODEL_CFG = {
    "atten_unet_def": {
        "spatial_dims": 3,
        "in_channels": 1,
        "out_channels": 1,
        "num_channels": [8, 8],
        "num_res_blocks": 1,
        "attention_levels": [False, True],
        "norm_num_groups": 8,
        "resblock_updown": True,
        "num_head_channels": [0, 4],
    },
    "discriminator": {"num_channels": 8, "num_layers_d": 1},
    "perceptual_network": {"spatial_dims": 3},
    "training": {"base_lr": 1e-3, "disc_lr": 1e-4, "perceptual_weight": 0, "adv_weight": 0.1},
}


@pytest.fixture(scope="module")
def adni_tree(tmp_path_factory):
    """Synthetic {root}/{Subject}/{date}/img.nii.gz trees + exam CSV."""
    root = tmp_path_factory.mktemp("adni")
    rng = np.random.default_rng(0)
    subjects = [f"s{i:03d}" for i in range(6)]
    t1_dir = root / "t1"
    pet_dir = root / "pet"
    for i, subj in enumerate(subjects):
        date_t1 = f"201{i % 3}-01-01"
        date_pet = f"201{i % 3}-01-15"
        for base, date in ((t1_dir, date_t1), (pet_dir, date_pet)):
            d = base / subj / date
            d.mkdir(parents=True)
            nifti.write(str(d / "img.nii.gz"), rng.random((10, 18, 10)).astype(np.float32))
    # ADNIMERGE-style covariate table
    merge_csv = root / "adnimerge.csv"
    lines = ["PTID,EXAMDATE,ABETA,Age,Sex,APOE4,PTEDUCAT"]
    for i, subj in enumerate(subjects):
        lines.append(f"{subj},201{i % 3}-01-10,{500 + 100 * i},7{i},{'Female' if i % 2 else 'Male'},{i % 3},1{i}")
    merge_csv.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return {"root": root, "t1": str(t1_dir), "pet": str(pet_dir), "merge": str(merge_csv)}


def test_full_cli_pipeline(adni_tree, tmp_path):
    from cips_tpu.cli import metrics as metrics_cli
    from cips_tpu.cli import output_predict as predict_cli
    from cips_tpu.cli import preprocess as pre_cli
    from cips_tpu.cli import train_unet as train_cli

    work = str(tmp_path)
    # 1. pairing + split
    pre_cli.main([
        "pair", "--PET_dir", adni_tree["pet"], "--T1_dir", adni_tree["t1"],
        "--out_dir", work, "--train_frac", "0.67",
    ])
    assert os.path.exists(os.path.join(work, "pair_training.csv"))

    # 2. covariate merge + stats
    pre_cli.main([
        "merge-csf", "--manifest", os.path.join(work, "pair_training.csv"),
        "--adnimerge_csv", adni_tree["merge"], "--pet_kind", "AV45",
        "--out_csv", os.path.join(work, "train_cov.csv"),
    ])
    pre_cli.main([
        "merge-csf", "--manifest", os.path.join(work, "pair_test.csv"),
        "--adnimerge_csv", adni_tree["merge"], "--pet_kind", "AV45",
        "--out_csv", os.path.join(work, "test_cov.csv"),
    ])
    pre_cli.main([
        "stats", "--manifest", os.path.join(work, "train_cov.csv"),
        "--out_json", os.path.join(work, "stats.json"),
    ])
    stats = json.load(open(os.path.join(work, "stats.json")))
    assert "ABETA" in stats and "Age" in stats

    # 3. train a few steps at tiny shapes via the CLI
    cfg_path = os.path.join(work, "cfg.json")
    json.dump(TINY_MODEL_CFG, open(cfg_path, "w"))
    exp_dir = os.path.join(work, "exp")
    common_args = [
        "--exp_dir", exp_dir, "--config", cfg_path,
        "--training_info_csv", os.path.join(work, "train_cov.csv"),
        "--eval_info_csv", os.path.join(work, "test_cov.csv"),
        "--PET_dir", adni_tree["pet"], "--T1_dir", adni_tree["t1"],
        "--min_and_max", os.path.join(work, "stats.json"),
        "--crop_size", "8", "16", "8",
        "--batch_size", "2", "--use_condition", "--dtype", "f32",
    ]
    train_cli.main(common_args + ["--epochs", "1", "--max_steps", "2", "--save_every", "1"])
    assert os.path.exists(os.path.join(exp_dir, "conditional", "AV45", "ckpt", "meta.json"))
    # sample NIfTI dumps written
    vis = os.path.join(exp_dir, "conditional", "AV45", "visual")
    assert any(f.endswith("rec.nii.gz") for f in os.listdir(vis))

    # 4. inference + per-volume metrics + volume writing
    results = predict_cli.main(common_args + ["--output_dir", os.path.join(work, "pred")])
    s = results.summary()
    assert np.isfinite(s["mae_mean"]) and np.isfinite(s["psnr_mean"])

    # 5. folder-pair metric tool over the written volumes
    out = metrics_cli.main([
        "--root", os.path.join(work, "pred"), "--metric_shape", "8", "16", "8",
    ])
    assert out["count"] >= 1
    assert np.isfinite(out["mae_mean"])


def test_train_cli_streaming_mode(adni_tree, tmp_path):
    """--streaming drives the native prefetch pool instead of packing."""
    import json as _json

    from cips_tpu.cli import train_unet as train_cli

    work = str(tmp_path)
    from cips_tpu.cli import preprocess as pre_cli

    pre_cli.main([
        "pair", "--PET_dir", adni_tree["pet"], "--T1_dir", adni_tree["t1"],
        "--out_dir", work, "--train_frac", "0.67",
    ])
    cfg_path = os.path.join(work, "cfg.json")
    _json.dump(TINY_MODEL_CFG, open(cfg_path, "w"))
    exp_dir = os.path.join(work, "exp")
    train_cli.main([
        "--exp_dir", exp_dir, "--config", cfg_path,
        "--training_info_csv", os.path.join(work, "pair_training.csv"),
        "--eval_info_csv", os.path.join(work, "pair_test.csv"),
        "--PET_dir", adni_tree["pet"], "--T1_dir", adni_tree["t1"],
        "--crop_size", "8", "16", "8", "--batch_size", "2", "--dtype", "f32",
        "--streaming", "--nan_guard", "--epochs", "1", "--max_steps", "1", "--save_every", "1",
    ])
    assert os.path.exists(os.path.join(exp_dir, "unconditional", "AV45", "ckpt", "meta.json"))


def test_train_cli_resume(adni_tree, tmp_path):
    """--resume restores the checkpoint and continues from epoch+1 (§5.4)."""
    from cips_tpu.cli import preprocess as pre_cli
    from cips_tpu.cli import train_unet as train_cli

    work = str(tmp_path)
    pre_cli.main([
        "pair", "--PET_dir", adni_tree["pet"], "--T1_dir", adni_tree["t1"],
        "--out_dir", work, "--train_frac", "0.67",
    ])
    cfg_path = os.path.join(work, "cfg.json")
    json.dump(TINY_MODEL_CFG, open(cfg_path, "w"))
    exp_dir = os.path.join(work, "exp")
    args = [
        "--exp_dir", exp_dir, "--config", cfg_path,
        "--training_info_csv", os.path.join(work, "pair_training.csv"),
        "--eval_info_csv", os.path.join(work, "pair_test.csv"),
        "--PET_dir", adni_tree["pet"], "--T1_dir", adni_tree["t1"],
        "--crop_size", "8", "16", "8", "--batch_size", "2", "--dtype", "f32",
        "--save_every", "1",
    ]
    train_cli.main(args + ["--epochs", "1"])
    meta_path = os.path.join(exp_dir, "unconditional", "AV45", "ckpt", "meta.json")
    assert json.load(open(meta_path))["last_epoch"] == 0

    train_cli.main(args + ["--epochs", "2", "--resume"])
    assert json.load(open(meta_path))["last_epoch"] == 1


def test_no_attention_classifier_config_builds():
    import jax
    import jax.numpy as jnp

    from cips_tpu.cli.common import load_config
    from cips_tpu.training import classifier_task

    cfg = load_config(None, "training_no_atten.json")
    cfg = {"atten_encoder_def": {**cfg["atten_encoder_def"],
                                 "num_channels": [8, 8], "num_res_blocks": 1,
                                 "attention_levels": [False, False],
                                 "num_head_channels": [0, 0], "norm_num_groups": 8}}
    model = classifier_task.build_model(cfg, in_channels=1, n_covariates=5, dtype=jnp.float32)
    x = jnp.ones((1, 8, 8, 8, 1))
    ctx = jnp.ones((1, 1, 5))
    params = model.init(jax.random.key(0), x, ctx)
    logits = model.apply(params, x, ctx)
    assert logits.shape == (1, 2)
