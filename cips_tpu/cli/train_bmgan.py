"""Train the BMGAN baseline (== bl_methods/BMGAN/train_bmgan.py CLI).

No covariates (reference :110-113); eval tracks L1 and keeps best.ckpt.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from cips_tpu.cli import common
from cips_tpu.parallel.mesh import device_prefetch, make_mesh, replicate, shard_batch
from cips_tpu.training import bmgan_task
from cips_tpu.training.common import CheckpointManager, MetricWriter


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_data_args(p)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--save_every", type=int, default=10)
    p.add_argument("--eval_every", type=int, default=1)
    p.add_argument("--lamda_l1", type=float, default=20.0)
    p.add_argument("--lamda_perceptual", type=float, default=8.0)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--max_steps", type=int, default=0)
    p.add_argument("--exact_d_fake", action="store_true",
                   help="E/D train on the POST-update generator's fake (reference "
                        "train_bmgan.py:168-169,188-190 semantics; +1 G forward/step)")
    p.add_argument("--perceptual_weights", default=None,
                   help=".npz of converted pretrained LPIPS (alex) weights")
    args = p.parse_args(argv)

    mesh = make_mesh()
    is_lead = jax.process_index() == 0
    for d in ("log", "ckpt", "visual"):
        os.makedirs(os.path.join(args.exp_dir, d), exist_ok=True)

    g, e, d_, perc = bmgan_task.build_models(dtype=common.dtype_arg(args.dtype))
    state = bmgan_task.init_state(
        jax.random.key(args.seed), g, e, d_, perc, (1, *args.crop_size, 1),
        lr=args.lr, perceptual_weight=args.lamda_perceptual,
    )
    state = common.maybe_load_perceptual(state, args.perceptual_weights)
    state = replicate(mesh, state)

    ckpt = CheckpointManager(os.path.join(args.exp_dir, "ckpt"))
    begin_epoch = 0
    if args.resume and ckpt.latest_epoch() is not None:
        state = ckpt.restore(state)
        begin_epoch = ckpt.latest_epoch() + 1

    train_loader, eval_loader = common.make_loaders(args, need_values=[])
    writer = MetricWriter(os.path.join(args.exp_dir, "log"), enabled=is_lead)
    step_fn = jax.jit(
        bmgan_task.make_train_step(
            g, e, d_, perc, args.lamda_l1, args.lamda_perceptual,
            exact_d_fake=args.exact_d_fake,
        ),
        donate_argnums=0,
    )
    eval_fn = jax.jit(bmgan_task.make_eval_step(g))

    global_step = 0
    rng = jax.random.key(args.seed + 1)
    for epoch in range(begin_epoch, args.epochs):
        eval_l1 = None  # only a metric computed THIS epoch may rank best-ckpt
        for batch in device_prefetch(train_loader.epoch(epoch), mesh):
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, batch, step_rng)
            global_step += 1
            if is_lead and global_step % 20 == 0:
                m = {k: float(v) for k, v in metrics.items()}
                writer.scalars("training", m, global_step)
                print(f"epoch {epoch} step {global_step} l1 {m['l1_loss']:.5f} "
                      f"g {m['g_loss']:.5f} e {m['e_loss']:.5f} d {m['d_loss']:.5f}")
            if args.max_steps and global_step >= args.max_steps:
                break
        if epoch % args.eval_every == 0:
            l1s = []
            for batch in eval_loader.epoch(0):
                rng, e_rng = jax.random.split(rng)
                out = eval_fn(state, shard_batch(mesh, batch), e_rng)
                l1s.append(float(out["l1_loss"]))
            eval_l1 = float(np.mean(l1s)) if l1s else float("nan")
            if is_lead:
                writer.scalars("eval", {"l1_loss": eval_l1}, global_step)
                print(f"epoch {epoch} eval l1 {eval_l1:.5f}")
        if is_lead and epoch % args.save_every == 0:
            ckpt.save(state, epoch, eval_metric=eval_l1)  # best.ckpt by eval L1
        if args.max_steps and global_step >= args.max_steps:
            break
    writer.close()
    return state


if __name__ == "__main__":
    main()
