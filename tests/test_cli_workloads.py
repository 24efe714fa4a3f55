"""End-to-end CLI tests for causal, BMGAN and classifier workloads (tiny)."""

import json
import os

import numpy as np
import pytest

from cips_tpu.data import nifti
from cips_tpu.data.manifest import PairRow, write_manifest

CROP = ["--crop_size", "8", "16", "8"]

TINY_CAUSAL_CFG = {
    "t1_autoencoder_def": {
        "atten_encoder": {
            "spatial_dims": 3, "in_channels": 1, "out_channels": 6,
            "num_channels": [8, 8], "num_res_blocks": 1,
            "attention_levels": [False, True], "norm_num_groups": 8,
            "resblock_updown": True, "num_head_channels": [0, 4],
            "with_conditioning": True,
        },
        "decoder": {
            "spatial_dims": 3, "in_channels": 3, "out_channels": 1,
            "num_channels": [8, 8], "num_res_blocks": 1, "norm_num_groups": 8,
            "attention_levels": [False, False],
        },
    },
    "pet_decoder_def": {
        "spatial_dims": 3, "in_channels": 3, "out_channels": 1,
        "num_channels": [8, 8], "num_res_blocks": 1, "norm_num_groups": 8,
        "attention_levels": [True, False], "num_head_channels": [4, 0],
        "with_conditioning": True,
    },
    "discriminator": {"num_channels": 8, "num_layers_d": 1},
    "perceptual_network": {"spatial_dims": 3},
    "training": {"base_lr": 1e-3, "disc_lr": 1e-3, "perceptual_weight": 0,
                 "adv_weight": 0.005, "kl_weight": 0.001},
}

TINY_CLS_CFG = {
    "atten_encoder_def": {
        "spatial_dims": 3, "in_channels": 1, "out_channels": 2,
        "num_channels": [8, 8], "num_res_blocks": 1,
        "attention_levels": [False, True], "norm_num_groups": 8,
        "resblock_updown": True, "num_head_channels": [0, 4],
    },
    "training": {"base_lr": 1e-3},
}


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(6):
        subj = f"s{i}"
        rows.append(PairRow(subj, f"2011-0{i+1}-01", f"2011-0{i+1}-10",
                            {"ABETA": str(400 + 100 * i), "Age": str(70 + i),
                             "Sex": str(i % 2), "APOE4": str(i % 3), "PTEDUCAT": "16"}))
    for r in rows:
        for base, date in (("t1", r.t1_date), ("pet", r.pet_date)):
            d = root / base / r.subject / date
            d.mkdir(parents=True)
            nifti.write(str(d / "img.nii.gz"), rng.random((8, 16, 8)).astype(np.float32))
    train_csv = root / "train.csv"
    write_manifest(str(train_csv), rows[:4])
    # eval split carries BOTH classes (s4 non-converter, s5 converter) so
    # classifier AUC is defined — no degenerate one-class eval
    test_csv = root / "test.csv"
    write_manifest(str(test_csv), rows[4:])
    stats = {"ABETA": [0, 2000], "Age": [55, 94], "PTEDUCAT": [6, 20]}
    (root / "stats.json").write_text(json.dumps(stats))
    (root / "conv.csv").write_text(
        "Subject,MCI_converter,Converter_date\ns0,0,\ns1,1,2020-01-01\ns2,0,\n"
        "s3,1,2020-01-01\ns4,0,\ns5,1,2020-01-01\n"
    )
    return root


def _common(root, work):
    return [
        "--training_info_csv", str(root / "train.csv"),
        "--eval_info_csv", str(root / "test.csv"),
        "--PET_dir", str(root / "pet"), "--T1_dir", str(root / "t1"),
        "--min_and_max", str(root / "stats.json"),
        "--batch_size", "1", "--dtype", "f32", *CROP,
    ]


def test_causal_cli_train_and_generate(tree, tmp_path):
    from cips_tpu.cli import gen_test_causal, train_causal

    cfg = tmp_path / "causal.json"
    cfg.write_text(json.dumps(TINY_CAUSAL_CFG))
    exp = str(tmp_path / "exp")
    args = _common(tree, tmp_path) + ["--exp_dir", exp, "--config", str(cfg)]
    train_causal.main(args + ["--epochs", "1", "--max_steps", "2", "--save_every", "1"])
    results = gen_test_causal.main(args + ["--output_dir", str(tmp_path / "gen")])
    # generated volumes written per subject/date
    wrote = []
    for r, _, files in os.walk(tmp_path / "gen"):
        wrote += [f for f in files if f == "rec.nii.gz"]
    assert wrote, "no rec.nii.gz written"
    assert np.isfinite(results.summary()["mae_mean"])


def test_bmgan_cli_smoke(tree, tmp_path, monkeypatch):
    from cips_tpu.cli import train_bmgan
    from cips_tpu.training import bmgan_task

    # shrink the default BMGAN to test scale
    orig = bmgan_task.build_models

    def tiny_build(dtype=None, latent_dim=8):
        from cips_tpu.models.bmgan import BMGANDiscriminator, DenseUNetGenerator, ResNetEncoder
        from cips_tpu.models.perceptual import PerceptualLoss

        g = DenseUNetGenerator(input_conv_channel=4, down_channels=(4, 8),
                               middle_channels=8, up_channels=(8, 4, 4))
        e = ResNetEncoder(input_layer_channel=4, channels=(4, 8))
        d = BMGANDiscriminator(num_layers_d=1)
        return g, e, d, PerceptualLoss(spatial_dims=3)

    monkeypatch.setattr(bmgan_task, "build_models", tiny_build)
    exp = str(tmp_path / "exp")
    args = _common(tree, tmp_path) + [
        "--exp_dir", exp, "--lamda_perceptual", "0",
        "--epochs", "1", "--max_steps", "2", "--save_every", "1",
    ]
    train_bmgan.main(args)
    assert os.path.exists(os.path.join(exp, "ckpt", "meta.json"))


def test_classifier_cli_train_and_test(tree, tmp_path):
    from cips_tpu.cli import test_mci, train_classifier

    cfg = tmp_path / "cls.json"
    cfg.write_text(json.dumps(TINY_CLS_CFG))
    exp = str(tmp_path / "exp")
    args = _common(tree, tmp_path) + [
        "--exp_dir", exp, "--config", str(cfg),
        "--converter_csv", str(tree / "conv.csv"),
        "--use_tabular_info",
    ]
    train_classifier.main(args + ["--epochs", "1", "--max_steps", "3", "--save_every", "1"])
    sub = os.path.join(exp, "pet_tab")
    assert os.path.exists(os.path.join(sub, "ckpt", "meta.json"))

    # reuse the trained ckpt dir (argparse takes the last --exp_dir)
    m = test_mci.main(args + ["--exp_dir", sub])
    assert set(m) == {"accuracy", "precision", "recall", "f1", "auc"}


def test_train_unet_random_crop_cli(tree, tmp_path):
    """--random_crop_size trains on jointly random-cropped sub-volumes
    (RandSpatialCrop semantics) while eval keeps the center crop."""
    from cips_tpu.cli import train_unet

    cfg = {
        "atten_unet_def": {
            "spatial_dims": 3, "in_channels": 1, "out_channels": 1,
            "num_channels": [8, 8], "num_res_blocks": 1,
            "attention_levels": [False, True], "norm_num_groups": 8,
            "resblock_updown": True, "num_head_channels": [0, 4],
        },
        # kernel_size 3: at the (4,8,4) crop the default k=4 discriminator's
        # patch-logit map is EMPTY — it silently trained on NaN adversarial
        # losses until PatchDiscriminator grew its loud empty-map guard
        "discriminator": {"num_channels": 8, "num_layers_d": 1, "kernel_size": 3},
        "perceptual_network": {"spatial_dims": 3},
        "training": {"base_lr": 1e-3, "disc_lr": 1e-4, "perceptual_weight": 0, "adv_weight": 0.1},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    exp = str(tmp_path / "exp")
    args = _common(tree, tmp_path) + [
        "--exp_dir", exp, "--config", str(cfg_path),
        "--random_crop_size", "4", "8", "4",
        "--epochs", "1", "--max_steps", "2", "--save_every", "1", "--use_condition",
    ]
    train_unet.main(args)
    assert os.path.exists(os.path.join(exp, "conditional", "AV45", "ckpt", "meta.json"))


def test_train_unet_perceptual_weights_cli(tree, tmp_path):
    """--perceptual_weights loads a converted LPIPS .npz and the trainer
    optimises a nonzero perceptual term (reference weight semantics,
    unet/config/training.json:54)."""
    import sys

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from convert_lpips_weights import convert_backbone, convert_lins

    from test_perceptual_parity import _torch_squeeze_features

    torch.manual_seed(0)
    flat = convert_backbone(
        {k: v.detach().numpy() for k, v in _torch_squeeze_features().state_dict().items()},
        "squeeze",
    )
    flat.update(convert_lins({}, "squeeze"))
    npz = tmp_path / "squeeze.npz"
    np.savez(npz, **flat)

    from cips_tpu.cli import train_unet

    cfg = {
        "atten_unet_def": {
            "spatial_dims": 3, "in_channels": 1, "out_channels": 1,
            "num_channels": [8, 8], "num_res_blocks": 1,
            "attention_levels": [False, True], "norm_num_groups": 8,
            "resblock_updown": True, "num_head_channels": [0, 4],
        },
        "discriminator": {"num_channels": 8, "num_layers_d": 1},
        "perceptual_network": {"spatial_dims": 3, "network_type": "squeeze"},
        "training": {"base_lr": 1e-3, "disc_lr": 1e-4, "perceptual_weight": 0.5, "adv_weight": 0.1},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    exp = str(tmp_path / "exp")
    args = [
        "--training_info_csv", str(tree / "train.csv"),
        "--eval_info_csv", str(tree / "test.csv"),
        "--PET_dir", str(tree / "pet"), "--T1_dir", str(tree / "t1"),
        "--min_and_max", str(tree / "stats.json"),
        "--batch_size", "1", "--dtype", "f32",
        "--crop_size", "16", "16", "16",
        "--exp_dir", exp, "--config", str(cfg_path),
        "--perceptual_weights", str(npz),
        "--epochs", "1", "--max_steps", "1", "--save_every", "1", "--use_condition",
    ]
    train_unet.main(args)
    assert os.path.exists(os.path.join(exp, "conditional", "AV45", "ckpt", "meta.json"))
