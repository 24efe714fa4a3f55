"""Precompute PET latents for the latent-space workflow.

The reference ships `pair_PETlatent_T1_dataset` (unet/utils/dataset.py:
145-248) which pairs T1 volumes with precomputed PET latents loaded from
.npy, but no script that produces them. This CLI closes that loop: encode
every PET volume of a manifest with a trained causal encoder (or
AutoencoderKL) checkpoint and write `{out}/{Subject}/{PET_date}/latent.npy`.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from cips_tpu.cli import common
from cips_tpu.data.dataset import PairedVolumeDataset
from cips_tpu.training import causal_task
from cips_tpu.training.common import CheckpointManager


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_data_args(p)
    p.add_argument("--exp_dir", required=True, help="trained causal experiment dir")
    p.add_argument("--config", default=None)
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--best", action="store_true")
    p.add_argument("--out_dir", required=True)
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

    encode = jax.jit(lambda prm, x: enc.apply(prm, x))
    ds = PairedVolumeDataset(
        args.eval_info_csv or args.training_info_csv,
        pet_dir=args.PET_dir, t1_dir=args.T1_dir,
        crop_size=tuple(args.crop_size), need_values=[],
    )
    n = 0
    for i in range(len(ds)):
        s = ds[i]
        latent = encode(state.gen.params["encoder"], jnp.asarray(s.pet[None, ..., None]))
        out = os.path.join(args.out_dir, s.subject, s.pet_date)
        os.makedirs(out, exist_ok=True)
        np.save(os.path.join(out, "latent.npy"), np.asarray(latent[0], np.float32))
        n += 1
    print(f"wrote {n} latents -> {args.out_dir}")
    return n


if __name__ == "__main__":
    main()
