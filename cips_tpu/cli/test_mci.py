"""Test-only MCI-converter classification (== pet_for_classification/test_MCI.py).

--test_fake_pet points the PET tree at a synthesis output and forces
pet_name='rec.nii.gz' (reference :90,221-222) — the end-to-end
synthesize->classify evaluation. Prints the metric suite + compact row
(:154-159) and writes a confusion-matrix image (:167-186). The reference's
broken `PETdataset` import (:26) is not carried over.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from cips_tpu.cli import common
from cips_tpu.cli.train_classifier import build_dataset, iter_batches
from cips_tpu.eval.classification import (
    classification_metrics,
    metrics_row,
    save_confusion_matrix_figure,
)
from cips_tpu.training import classifier_task
from cips_tpu.training.common import CheckpointManager


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_data_args(p)
    p.add_argument("--exp_dir", required=True, help="trained classifier experiment dir")
    p.add_argument("--converter_csv", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--use_PET", action="store_true", default=True)
    p.add_argument("--no_PET", dest="use_PET", action="store_false")
    p.add_argument("--use_T1", action="store_true")
    p.add_argument("--use_tabular_info", action="store_true")
    p.add_argument("--no_attention", action="store_true")
    p.add_argument("--test_fake_pet", action="store_true")
    p.add_argument("--fake_pet_dir", default=None)
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--best", action="store_true")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = p.parse_args(argv)

    cfg_name = "training_no_atten.json" if args.no_attention else "training_atten.json"
    cfg = common.load_config(args.config, cfg_name)
    need_values = common.covariates_for(args.pet_kind, args.use_tabular_info)
    in_channels = int(args.use_PET) + int(args.use_T1)

    model = classifier_task.build_model(
        cfg, in_channels=in_channels, n_covariates=len(need_values),
        dtype=common.dtype_arg(args.dtype),
    )
    state = classifier_task.init_state(
        jax.random.key(0), model, (1, *args.crop_size, in_channels), n_covariates=len(need_values)
    )
    ckpt = CheckpointManager(os.path.join(args.exp_dir, "ckpt"))
    state = ckpt.restore(state, epoch=args.epoch, best=args.best)
    predict = jax.jit(classifier_task.make_predict_fn(model, use_tabular=args.use_tabular_info))

    ds = build_dataset(args, need_values, train=False, fake_pet=args.test_fake_pet)
    print(f"{len(ds)} test sessions ({'synthesized' if args.test_fake_pet else 'real'} PET)")
    logits_all, labels_all = [], []
    for batch in iter_batches(ds, 1, False, 0, 0):
        logits_all.append(np.asarray(predict(state.model.params, batch), np.float32))
        labels_all.append(np.asarray(batch["labels"]))
    labels_np = np.concatenate(labels_all)
    logits_np = np.concatenate(logits_all)
    m = classification_metrics(labels_np, logits_np)
    print({k: round(v, 4) for k, v in m.items()})
    print("f1 & auc & acc & prec & rec:", metrics_row(m))
    save_confusion_matrix_figure(
        labels_np, logits_np.argmax(-1), os.path.join(args.exp_dir, "confusion_test.jpg")
    )
    return m


if __name__ == "__main__":
    main()
