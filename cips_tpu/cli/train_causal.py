"""Train the causal unified generator
(== causal_synthesis/scripts/train_unify_causal_gen.py CLI)."""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from cips_tpu.cli import common
from cips_tpu.parallel.mesh import device_prefetch, make_mesh, replicate, shard_batch
from cips_tpu.training import causal_task
from cips_tpu.training.common import CheckpointManager, MetricWriter


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_data_args(p)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--save_every", type=int, default=10)
    p.add_argument("--eval_every", type=int, default=1)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--max_steps", type=int, default=0)
    p.add_argument("--exact_d_fake", action="store_true",
                   help="D trains on a fresh fake from the POST-update generator "
                        "(reference train_unify_causal_gen.py:255-263 semantics)")
    p.add_argument("--perceptual_weights", default=None,
                   help=".npz of converted pretrained LPIPS weights")
    args = p.parse_args(argv)

    cfg = common.load_config(args.config, "training_causal.json")
    train_cfg = cfg["training"]
    need_values = common.covariates_for(args.pet_kind, use_condition=True)
    dirs = common.experiment_dirs(args.exp_dir, True, args.pet_kind)
    mesh = make_mesh()
    is_lead = jax.process_index() == 0

    enc, t1_dec, pet_dec, disc, perc = causal_task.build_models(
        cfg, n_covariates=len(need_values), dtype=common.dtype_arg(args.dtype)
    )
    state = causal_task.init_state(
        jax.random.key(args.seed), enc, t1_dec, pet_dec, disc, perc, train_cfg,
        (1, *args.crop_size, 1), n_covariates=len(need_values),
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
    step_fn = jax.jit(
        causal_task.make_train_step(
            enc, t1_dec, pet_dec, disc, perc, train_cfg,
            exact_d_fake=(True if args.exact_d_fake else None),
        ),
        donate_argnums=0,
    )
    eval_fn = jax.jit(causal_task.make_eval_step(enc, t1_dec, pet_dec))

    global_step = 0
    rng = jax.random.key(args.seed + 1)
    for epoch in range(begin_epoch, args.epochs):
        eval_loss = None  # only a metric computed THIS epoch may rank best-ckpt
        for batch in device_prefetch(train_loader.epoch(epoch), mesh):
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, batch, step_rng)
            global_step += 1
            if is_lead and global_step % 10 == 0:
                m = {k: float(v) for k, v in metrics.items()}
                writer.scalars("training", m, global_step)
                print(f"epoch {epoch} step {global_step} pet {m['rec_pet_loss']:.5f} "
                      f"t1 {m['rec_t1_loss']:.5f} kl {m['kl_loss']:.3f} d {m['d_loss']:.5f}")
            if args.max_steps and global_step >= args.max_steps:
                break
        if epoch % args.eval_every == 0:
            losses = []
            for batch in eval_loader.epoch(0):
                rng, e_rng = jax.random.split(rng)
                out = eval_fn(state, shard_batch(mesh, batch), e_rng)
                losses.append(float(out["rec_pet_loss"]))
            eval_loss = float(np.mean(losses)) if losses else float("nan")
            if is_lead:
                writer.scalars("eval", {"rec_pet_loss": eval_loss}, global_step)
                print(f"epoch {epoch} eval rec_pet {eval_loss:.5f}")
        if is_lead and epoch % args.save_every == 0:
            ckpt.save(state, epoch, eval_metric=eval_loss)
        if args.max_steps and global_step >= args.max_steps:
            break
    writer.close()
    return state


if __name__ == "__main__":
    main()
