"""Train the conditional AttenUNet T1->PET synthesizer.

CLI re-design of `unet/scripts/train_unet.py:307-354`: same experiment
semantics (covariate set by --pet_kind, (un)conditional exp-dir layout,
per-epoch eval + sample NIfTI dumps, periodic checkpoints, --resume), with
the TPU runtime replacing mp.spawn/DDP: jax.distributed for multi-host,
one jitted train step, batch sharded over the mesh's data axis.

  python -m cips_tpu.cli.train_unet --exp_dir /tmp/exp \
      --training_info_csv train.csv --eval_info_csv test.csv \
      --PET_dir ... --T1_dir ... --pet_kind AV45 --use_condition
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from cips_tpu.cli import common
from cips_tpu.data import nifti
from cips_tpu.parallel.mesh import device_prefetch, make_mesh, replicate, shard_batch
from cips_tpu.training import unet_synthesis
from cips_tpu.training.common import CheckpointManager, MetricWriter, StepTimer


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_data_args(p)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--config", help="model/training config JSON (default: bundled training.json)")
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--save_every", type=int, default=10)
    p.add_argument("--eval_every", type=int, default=1)
    p.add_argument("--use_condition", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--n_space", type=int, default=1, help="spatial-shard mesh axis size")
    p.add_argument("--max_steps", type=int, default=0, help="debug: stop after N steps")
    p.add_argument("--profile_dir", default=None, help="capture a jax.profiler trace of steps 10-15")
    p.add_argument("--perceptual_weights", default=None,
                   help=".npz of converted pretrained LPIPS weights (scripts/convert_lpips_weights.py)")
    p.add_argument("--nan_guard", action="store_true",
                   help="discard parameter updates on non-finite loss (failure detection)")
    p.add_argument("--exact_d_fake", action="store_true",
                   help="D trains on the POST-update generator's fake (reference "
                        "train_unet.py:175-176 semantics; +1 G forward/step)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    cfg = common.load_config(args.config, "training.json")
    train_cfg = cfg["training"]
    need_values = common.covariates_for(args.pet_kind, args.use_condition)
    dirs = common.experiment_dirs(args.exp_dir, args.use_condition, args.pet_kind)

    mesh = make_mesh(n_space=args.n_space)
    is_lead = jax.process_index() == 0

    generator, discriminator, perceptual = unet_synthesis.build_models(
        cfg, n_covariates=len(need_values), dtype=common.dtype_arg(args.dtype)
    )
    state = unet_synthesis.init_state(
        jax.random.key(args.seed),
        generator,
        discriminator,
        perceptual,
        train_cfg,
        batch_shape=(1, *args.crop_size, 1),
        n_covariates=len(need_values),
    )
    state = common.maybe_load_perceptual(state, args.perceptual_weights)
    state = replicate(mesh, state)

    ckpt = CheckpointManager(dirs["ckpt"])
    begin_epoch = 0
    if args.resume and ckpt.latest_epoch() is not None:
        state = ckpt.restore(state)
        begin_epoch = ckpt.latest_epoch() + 1

    train_loader, eval_loader = common.make_loaders(args, need_values)
    writer = MetricWriter(dirs["log"], enabled=is_lead)
    timer = StepTimer()

    raw_step = unet_synthesis.make_train_step(
        generator, discriminator, perceptual, train_cfg, use_condition=args.use_condition,
        exact_d_fake=(True if args.exact_d_fake else None),
    )
    if args.nan_guard:
        from cips_tpu.training.common import guard_nonfinite

        raw_step = guard_nonfinite(raw_step)
    step_fn = jax.jit(raw_step, donate_argnums=0)
    eval_fn = jax.jit(unet_synthesis.make_eval_step(
        generator, discriminator, perceptual, train_cfg, use_condition=args.use_condition
    ))

    global_step = 0
    spatial_axis = 1 if args.n_space > 1 else None
    for epoch in range(begin_epoch, args.epochs):
        for batch in device_prefetch(train_loader.epoch(epoch), mesh, spatial_axis):
            if args.profile_dir and global_step == 10:
                jax.profiler.start_trace(args.profile_dir)
            state, metrics = step_fn(state, batch)
            if args.profile_dir and global_step == 15:
                jax.profiler.stop_trace()
            global_step += 1
            if is_lead and global_step % 10 == 0:
                m = {k: float(v) for k, v in metrics.items()}
                writer.scalars("training", m, global_step)
                print(
                    f"epoch {epoch}/{args.epochs} step {global_step} "
                    f"rec {m['rec_loss']:.5f} adv {m['adv_loss']:.5f} "
                    f"g {m['g_loss']:.5f} d {m['d_loss']:.5f} "
                    f"({timer.lap():.3f}s/10steps)"
                )
            if args.max_steps and global_step >= args.max_steps:
                break

        eval_loss = None  # only a metric computed THIS epoch may rank best-ckpt
        if epoch % args.eval_every == 0:
            eval_losses = []
            sample_written = False
            for batch in eval_loader.epoch(0):
                batch = shard_batch(mesh, batch)
                out = eval_fn(state, batch)
                eval_losses.append(float(out["g_loss"]))
                if is_lead and not sample_written:
                    # sample NIfTI dump for visual inspection (train_unet.py:284-290)
                    vis = dirs["visual"]
                    nifti.write(os.path.join(vis, f"epoch{epoch}_rec.nii.gz"),
                                np.asarray(out["fake"][0, ..., 0], np.float32))
                    nifti.write(os.path.join(vis, f"epoch{epoch}_ori.nii.gz"),
                                np.asarray(batch["pet"][0, ..., 0], np.float32))
                    nifti.write(os.path.join(vis, f"epoch{epoch}_t1.nii.gz"),
                                np.asarray(batch["t1"][0, ..., 0], np.float32))
                    sample_written = True
            eval_loss = float(np.mean(eval_losses)) if eval_losses else float("nan")
            if is_lead:
                writer.scalars("eval", {"g_loss": eval_loss}, global_step)
                print(f"epoch {epoch} eval g_loss {eval_loss:.5f}")

        if is_lead and epoch % args.save_every == 0:
            ckpt.save(state, epoch, eval_metric=eval_loss)
        if args.max_steps and global_step >= args.max_steps:
            break
    writer.close()
    return state


if __name__ == "__main__":
    main()
