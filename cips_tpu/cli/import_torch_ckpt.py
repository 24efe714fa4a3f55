"""Convert a reference torch checkpoint into a cips_tpu Orbax checkpoint.

The reference trains with torch and saves `{"unet": ddp_state_dict,
"discriminator": ..., "epoch": N, ...}` (unet/scripts/train_unet.py:295-302).
This CLI maps those weights onto our flax trees (proven equivalent to the
vendored architecture by tests/test_golden_reference_parity.py) and writes
them where `cli.output_predict --epoch N` and `cli.train_unet --resume` look:

  python -m cips_tpu.cli.import_torch_ckpt --torch_ckpt ref_epoch500.ckpt \
      --exp_dir /tmp/exp --pet_kind AV45 --use_condition
"""

from __future__ import annotations

import argparse

import jax

from cips_tpu.cli import common
from cips_tpu.data import torch_import
from cips_tpu.training import unet_synthesis
from cips_tpu.training.common import CheckpointManager


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--pet_kind", default="AV45", choices=["AV45", "AV1451"])
    p.add_argument("--use_condition", action="store_true")
    p.add_argument("--crop_size", type=int, nargs=3, default=[96, 128, 96])
    args = p.parse_args(argv)

    cfg = common.load_config(args.config, "training.json")
    need_values = common.covariates_for(args.pet_kind, args.use_condition)
    dirs = common.experiment_dirs(args.exp_dir, args.use_condition, args.pet_kind)

    num_levels = len(cfg["atten_unet_def"]["num_channels"])
    imported = torch_import.import_checkpoint(args.torch_ckpt, num_levels=num_levels)
    if "unet" not in imported:
        raise SystemExit("checkpoint has no 'unet' state_dict")

    generator, discriminator, perceptual = unet_synthesis.build_models(
        cfg, n_covariates=len(need_values)
    )
    state = unet_synthesis.init_state(
        jax.random.key(0), generator, discriminator, perceptual, cfg["training"],
        batch_shape=(1, *args.crop_size, 1), n_covariates=len(need_values),
    )

    def check_tree(template, new, name):
        t_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), template)
        n_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), new)
        if t_shapes != n_shapes:
            raise SystemExit(
                f"{name}: imported parameter shapes do not match the config's "
                f"model — wrong --config / --pet_kind / --use_condition?"
            )

    check_tree(state.g.params, imported["unet"], "unet")
    new_g = state.g.replace(params=imported["unet"])
    new_d = state.d
    if "discriminator" in imported:
        try:
            check_tree(state.d.params, imported["discriminator"], "discriminator")
            new_d = state.d.replace(params=imported["discriminator"])
            print("imported discriminator")
        except SystemExit as e:
            print(f"skipping discriminator: {e}")
    state = state.replace(g=new_g, d=new_d)

    epoch = imported.get("epoch") or 0
    ckpt = CheckpointManager(dirs["ckpt"])
    eval_metric = imported["raw"].get("eval_loss")
    try:
        eval_metric = float(eval_metric)
    except (TypeError, ValueError):
        eval_metric = None
    ckpt.save(state, epoch, eval_metric=eval_metric)
    print(f"wrote epoch {epoch} checkpoint to {dirs['ckpt']}")
    return dirs["ckpt"]


if __name__ == "__main__":
    main()
