"""Generate synthetic PET with the trained BMGAN generator
(== bl_methods/BMGAN/gen_test_bmgan.py: sample randn(b, 8) latents :82,
write rec.nii.gz per subject/date :92-94)."""

from __future__ import annotations

import argparse
import os

import jax

from cips_tpu.cli import common
from cips_tpu.data.dataset import PairedVolumeDataset
from cips_tpu.inference.predict import predict_dataset
from cips_tpu.training import bmgan_task
from cips_tpu.training.common import CheckpointManager


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_data_args(p)
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--best", action="store_true")
    p.add_argument("--output_dir", default=None)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = p.parse_args(argv)

    g, e, d_, perc = bmgan_task.build_models(dtype=common.dtype_arg(args.dtype))
    state = bmgan_task.init_state(
        jax.random.key(0), g, e, d_, perc, (1, *args.crop_size, 1), perceptual_weight=0.0
    )
    ckpt = CheckpointManager(os.path.join(args.exp_dir, "ckpt"))
    state = ckpt.restore(state, epoch=args.epoch, best=args.best)

    dataset = PairedVolumeDataset(
        args.eval_info_csv, pet_dir=args.PET_dir, t1_dir=args.T1_dir,
        crop_size=tuple(args.crop_size), need_values=[]
    )
    rng = jax.random.key(args.seed)

    @jax.jit
    def generate(params, batch, key):
        z = jax.random.normal(key, (batch["t1"].shape[0], 8), batch["t1"].dtype)
        return g.apply(params, batch["t1"], z)

    out_dir = args.output_dir or os.path.join(args.exp_dir, "generated")
    results = predict_dataset(
        lambda batch: generate(state.g.params, batch, rng),
        dataset,
        output_dir=out_dir,
        write_ori=False,
        mask_mode="none",
    )
    print(results)
    return results


if __name__ == "__main__":
    main()
