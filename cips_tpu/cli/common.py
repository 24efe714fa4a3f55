"""Shared CLI plumbing: configs, experiment dirs, covariate sets, loaders.

Mirrors the reference's two-tier config system (SURVEY.md §5.6): JSON model
configs splatted into constructors + argparse path/flag wiring with the
{exp_dir}/(un)conditional/{pet_kind} layout (train_unet.py:336-347).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from cips_tpu.data.covariates import COVARIATES_BY_TRACER, load_min_and_max

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def load_config(path: Optional[str], default_name: str) -> Dict[str, Any]:
    if path is None:
        path = os.path.join(CONFIG_DIR, default_name)
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def covariates_for(pet_kind: str, use_condition: bool) -> list:
    return list(COVARIATES_BY_TRACER.get(pet_kind, [])) if use_condition else []


def experiment_dirs(exp_dir: str, use_condition: bool, pet_kind: str) -> Dict[str, str]:
    base = os.path.join(exp_dir, "conditional" if use_condition else "unconditional", pet_kind)
    dirs = {
        "base": base,
        "log": os.path.join(base, "log"),
        "ckpt": os.path.join(base, "ckpt"),
        "visual": os.path.join(base, "visual"),
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    return dirs


def add_common_data_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--training_info_csv", help="training pair manifest CSV")
    p.add_argument("--eval_info_csv", help="eval/test pair manifest CSV")
    p.add_argument("--PET_dir", help="PET volume tree {dir}/{Subject}/{date}/")
    p.add_argument("--T1_dir", help="T1 volume tree {dir}/{Subject}/{date}/")
    p.add_argument("--packed_dir", help="packed-array dataset dir (preferred fast path)")
    p.add_argument("--eval_packed_dir", help="packed eval dataset dir")
    p.add_argument("--min_and_max", help="covariate stats JSON/pkl")
    p.add_argument("--pet_kind", default="AV45", choices=["AV45", "AV1451"])
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--crop_size", type=int, nargs=3, default=[96, 128, 96],
                   help="working volume shape (train_unet.py:111)")
    p.add_argument("--random_crop_size", type=int, nargs=3, default=None,
                   help="training-time joint random crop (RandSpatialCrop, "
                        "unet/utils/dataset.py:85-87); eval stays center-cropped")
    p.add_argument("--streaming", action="store_true",
                   help="decode NIfTIs on the fly via the native prefetch pool "
                        "instead of packing to memory-mapped arrays")


def load_stats(path: Optional[str]) -> Dict:
    return load_min_and_max(path) if path else {}


def dtype_arg(name: str):
    return {"bf16": jnp.bfloat16, "f32": jnp.float32}[name]


def make_loaders(args, need_values, crop_size=None):
    """Packed-array loaders (preferred) or NIfTI-backed datasets packed on
    the fly into a temp dir."""
    from cips_tpu.data.dataset import (
        BatchLoader,
        PackedDataset,
        PairedVolumeDataset,
        StreamingLoader,
        pack_pairs,
    )

    if crop_size is None:
        crop_size = tuple(getattr(args, "crop_size", (96, 128, 96)))

    if getattr(args, "streaming", False):
        def make_ds(info_csv, train=False):
            return PairedVolumeDataset(
                info_csv, pet_dir=args.PET_dir, t1_dir=args.T1_dir,
                crop_size=crop_size, need_values=need_values,
                min_and_max=load_stats(args.min_and_max),
                random_crop_size=getattr(args, "random_crop_size", None) if train else None,
                seed=args.seed,
            )
        train_loader = StreamingLoader(
            make_ds(args.training_info_csv, train=True), args.batch_size, seed=args.seed,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        eval_loader = StreamingLoader(
            make_ds(args.eval_info_csv), 1, shuffle=False, drop_last=False,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        return train_loader, eval_loader

    def ensure_packed(info_csv, packed_dir, tag):
        if packed_dir and os.path.exists(os.path.join(packed_dir, "volumes.npy")):
            return PackedDataset(packed_dir)
        ds = PairedVolumeDataset(
            info_csv,
            pet_dir=args.PET_dir,
            t1_dir=args.T1_dir,
            crop_size=crop_size,
            need_values=need_values,
            min_and_max=load_stats(args.min_and_max),
        )
        out = packed_dir or os.path.join(args.exp_dir, f"packed_{tag}")
        pack_pairs(ds, out)
        return PackedDataset(out)

    train_packed = ensure_packed(args.training_info_csv, args.packed_dir, "train")
    eval_packed = ensure_packed(args.eval_info_csv, args.eval_packed_dir, "eval")
    train_loader = BatchLoader(
        train_packed,
        args.batch_size,
        seed=args.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        random_crop_size=getattr(args, "random_crop_size", None),
    )
    eval_loader = BatchLoader(
        eval_packed, 1, shuffle=False, drop_last=False,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    return train_loader, eval_loader


def maybe_load_perceptual(state, path):
    """Swap the frozen perceptual-net params for converted pretrained LPIPS
    weights (scripts/convert_lpips_weights.py -> .npz). No-op when the
    workload trains with perceptual_weight == 0 (p_params is None)."""
    if not path or state.p_params is None:
        return state
    from cips_tpu.models.perceptual import params_from_npz

    return state.replace(p_params=params_from_npz(path))
