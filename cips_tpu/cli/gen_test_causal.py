"""Generate synthetic PET from the trained causal model
(== causal_synthesis/scripts/gen_test_unify_causal.py).

Writes rec.nii.gz per subject/date; output is min-max renormalised and
masked with its own brain mask (reference :133-138).
"""

from __future__ import annotations

import argparse
import os

import jax

from cips_tpu.cli import common
from cips_tpu.data.dataset import PairedVolumeDataset
from cips_tpu.inference.predict import predict_dataset
from cips_tpu.training import causal_task
from cips_tpu.training.common import CheckpointManager


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_data_args(p)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--best", action="store_true")
    p.add_argument("--output_dir", default=None)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = p.parse_args(argv)

    cfg = common.load_config(args.config, "training_causal.json")
    need_values = common.covariates_for(args.pet_kind, use_condition=True)
    dirs = common.experiment_dirs(args.exp_dir, True, args.pet_kind)

    enc, t1_dec, pet_dec, disc, perc = causal_task.build_models(
        cfg, n_covariates=len(need_values), dtype=common.dtype_arg(args.dtype)
    )
    state = causal_task.init_state(
        jax.random.key(0), enc, t1_dec, pet_dec, disc, perc, cfg["training"],
        (1, *args.crop_size, 1), n_covariates=len(need_values),
    )
    ckpt = CheckpointManager(dirs["ckpt"])
    state = ckpt.restore(state, epoch=args.epoch, best=args.best)

    dataset = PairedVolumeDataset(
        args.eval_info_csv, pet_dir=args.PET_dir, t1_dir=args.T1_dir,
        crop_size=tuple(args.crop_size),
        need_values=need_values, min_and_max=common.load_stats(args.min_and_max),
    )
    generate = jax.jit(causal_task.make_generate_fn(enc, pet_dec))
    rng = jax.random.key(args.seed)
    out_dir = args.output_dir or os.path.join(dirs["base"], "generated")
    results = predict_dataset(
        lambda batch: generate(state.gen.params, batch, rng),
        dataset,
        output_dir=out_dir,
        write_ori=False,
        mask_mode="self",
    )
    print(results)
    return results


if __name__ == "__main__":
    main()
