"""Train the sMCI/pMCI MCI-converter classifier
(== pet_for_classification/train_atten_encoder_MCI.py).

Modality/covariate ablations mirror the reference's flag combos (:357-370):
--use_PET / --use_T1 select input channels; --use_tabular_info enables
covariate cross-attention; --no_attention picks the attention-free config.
--test_fake_pet with --fake_pet_dir evaluates on synthesized volumes
(pet_name='rec.nii.gz'), the end-to-end synth->classify path.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from cips_tpu.cli import common
from cips_tpu.data.dataset import MCIClassificationDataset
from cips_tpu.eval.classification import (
    classification_metrics,
    metrics_row,
    save_confusion_matrix_figure,
)
from cips_tpu.training import classifier_task
from cips_tpu.training.common import CheckpointManager, MetricWriter


def exp_subdir(args) -> str:
    """Ablation experiment-dir layout (train_atten_encoder_MCI.py:357-370)."""
    parts = []
    if args.use_PET:
        parts.append("pet")
    if args.use_T1:
        parts.append("t1")
    if args.use_tabular_info:
        parts.append("tab")
    if args.no_attention:
        parts.append("noattn")
    return os.path.join(args.exp_dir, "_".join(parts) or "none")


def iter_batches(ds, batch_size, shuffle, seed, epoch):
    """Synchronous per-sample decode fallback (--streaming)."""
    order = np.arange(len(ds))
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)
    for b in range(0, len(order) - (len(order) % batch_size if batch_size > 1 else 0), batch_size):
        idx = order[b : b + batch_size]
        if len(idx) < batch_size and batch_size > 1:
            break
        samples = [ds[int(i)] for i in idx]
        imgs = np.stack([s[0] for s in samples])
        info = np.stack([s[1] for s in samples])[:, None, :]
        labels = np.asarray([s[2] for s in samples], np.int32)
        yield {"imgs": jnp.asarray(imgs), "info": jnp.asarray(info), "labels": jnp.asarray(labels)}


def make_mci_loaders(args, train_ds, eval_ds, exp):
    """Packed memory-mapped loaders (decode once, stream batches) — the
    classifier counterpart of common.make_loaders. --streaming keeps the
    per-epoch decode path for churning datasets."""
    from cips_tpu.data.dataset import MCIBatchLoader, PackedMCIDataset, pack_mci

    def ensure(ds, packed_dir, tag):
        want = "fake" if getattr(ds, "pet_name", None) else "real"
        if packed_dir and os.path.exists(os.path.join(packed_dir, "volumes.npy")):
            packed = PackedMCIDataset(packed_dir)
            # index.json records whether the pack was built from real or
            # synthesized PET; an explicit --eval_packed_dir must agree with
            # the run's --test_fake_pet intent (None = pre-provenance pack,
            # accepted for compatibility).
            if packed.pet_source is not None and packed.pet_source != want:
                raise SystemExit(
                    f"packed dir {packed_dir} was built from {packed.pet_source} PET "
                    f"but this run expects {want} PET — repack or pass a matching dir"
                )
            return packed
        out = packed_dir or os.path.join(exp, f"packed_{tag}")
        if not os.path.exists(os.path.join(out, "volumes.npy")):
            pack_mci(ds, out)
        return PackedMCIDataset(out)

    train_packed = ensure(train_ds, args.packed_dir, "train")
    # fake-PET eval reads rec.nii.gz volumes — never reuse the real-PET pack
    eval_tag = "eval_fake" if getattr(args, "test_fake_pet", False) else "eval"
    eval_packed = ensure(eval_ds, args.eval_packed_dir, eval_tag)
    train_loader = MCIBatchLoader(
        train_packed, args.batch_size, seed=args.seed,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    eval_loader = MCIBatchLoader(
        eval_packed, args.batch_size, shuffle=False, drop_last=False,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    return train_loader, eval_loader


def build_dataset(args, need_values, train: bool, fake_pet: bool = False):
    return MCIClassificationDataset(
        args.training_info_csv if train else args.eval_info_csv,
        converter_csv=args.converter_csv,
        pet_dir=(args.fake_pet_dir if fake_pet else args.PET_dir),
        t1_dir=args.T1_dir,
        crop_size=tuple(args.crop_size),
        need_values=need_values,
        min_and_max=common.load_stats(args.min_and_max),
        use_pet=args.use_PET,
        use_t1=args.use_T1,
        pet_name="rec.nii.gz" if fake_pet else None,
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_data_args(p)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--converter_csv", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--save_every", type=int, default=5)
    p.add_argument("--use_PET", action="store_true", default=True)
    p.add_argument("--no_PET", dest="use_PET", action="store_false")
    p.add_argument("--use_T1", action="store_true")
    p.add_argument("--use_tabular_info", action="store_true")
    p.add_argument("--no_attention", action="store_true")
    p.add_argument("--test_fake_pet", action="store_true")
    p.add_argument("--fake_pet_dir", default=None)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--max_steps", type=int, default=0)
    args = p.parse_args(argv)

    cfg_name = "training_no_atten.json" if args.no_attention else "training_atten.json"
    cfg = common.load_config(args.config, cfg_name)
    need_values = common.covariates_for(args.pet_kind, args.use_tabular_info)
    in_channels = int(args.use_PET) + int(args.use_T1)
    exp = exp_subdir(args)
    for d in ("log", "ckpt"):
        os.makedirs(os.path.join(exp, d), exist_ok=True)

    model = classifier_task.build_model(
        cfg, in_channels=in_channels, n_covariates=len(need_values),
        dtype=common.dtype_arg(args.dtype),
    )
    state = classifier_task.init_state(
        jax.random.key(args.seed), model, (1, *args.crop_size, in_channels),
        n_covariates=len(need_values), lr=cfg.get("training", {}).get("base_lr", 1e-4),
    )
    ckpt = CheckpointManager(os.path.join(exp, "ckpt"))
    writer = MetricWriter(os.path.join(exp, "log"))
    step_fn = jax.jit(classifier_task.make_train_step(model, use_tabular=args.use_tabular_info))
    predict = jax.jit(classifier_task.make_predict_fn(model, use_tabular=args.use_tabular_info))

    train_ds = build_dataset(args, need_values, train=True)
    eval_ds = build_dataset(args, need_values, train=False, fake_pet=args.test_fake_pet)
    print(f"train {len(train_ds)} sessions, eval {len(eval_ds)} sessions")
    if args.streaming:
        train_batches = lambda epoch: iter_batches(train_ds, args.batch_size, True, args.seed, epoch)
        eval_batches = lambda: iter_batches(eval_ds, args.batch_size, False, 0, 0)
    else:
        train_loader, eval_loader = make_mci_loaders(args, train_ds, eval_ds, exp)
        train_batches = lambda epoch: train_loader.epoch(epoch)
        eval_batches = lambda: eval_loader.epoch(0)

    rng = jax.random.key(args.seed + 1)
    global_step = 0
    for epoch in range(args.epochs):
        logits_all, labels_all = [], []
        for batch in train_batches(epoch):
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, batch, step_rng)
            logits_all.append(np.asarray(metrics["logits"], np.float32))
            labels_all.append(np.asarray(batch["labels"]))
            global_step += 1
            if args.max_steps and global_step >= args.max_steps:
                break
        if labels_all:
            m = classification_metrics(np.concatenate(labels_all), np.concatenate(logits_all))
            writer.scalars("training", m, epoch)
            print(f"epoch {epoch} train: {metrics_row(m)} (f1&auc&acc&prec&rec)")

        # eval epoch (batched)
        logits_all, labels_all = [], []
        for batch in eval_batches():
            logits_all.append(np.asarray(predict(state.model.params, batch), np.float32))
            labels_all.append(np.asarray(batch["labels"]))
        if labels_all:
            labels_np = np.concatenate(labels_all)
            logits_np = np.concatenate(logits_all)
            m = classification_metrics(labels_np, logits_np)
            writer.scalars("eval", m, epoch)
            print(f"epoch {epoch} eval:  {metrics_row(m)}")
            save_confusion_matrix_figure(
                labels_np, logits_np.argmax(-1), os.path.join(exp, "log", f"cm_epoch{epoch}.jpg")
            )
            if epoch % args.save_every == 0:
                ckpt.save(state, epoch, eval_metric=1.0 - m["auc"])
        if args.max_steps and global_step >= args.max_steps:
            break
    writer.close()
    return state


if __name__ == "__main__":
    main()
