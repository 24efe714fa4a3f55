"""Folder-pair metric tool — compare synthesized vs real volume trees.

Re-implements `unet/scripts/metrics.py`: walk {root}/{subject}/{date}/
pairs of (real, synthesized) NIfTIs, optionally mean-intensity match
`sys / mean(sys) * mean(real)` (:51-52), pad/crop both to the metric shape
(192, 224, 192) (:55-60), and report MAE / MS-SSIM (data_range 1.0,
torchmetrics defaults kernel 11 sigma 1.5) / PSNR = 10*log10(1/MSE)
(:62-68), mean ± std over the cohort.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cips_tpu.data import nifti
from cips_tpu.data.dataset import pad_crop_np
from cips_tpu.ops.metrics import mae, ms_ssim, psnr

METRIC_SHAPE = (192, 224, 192)


def iter_volume_pairs(
    root: str, real_name: str = "ori.nii.gz", rec_name: str = "rec.nii.gz"
) -> Iterable[Tuple[str, str, str, str]]:
    """Yield (subject, date, real_path, rec_path) for each session dir that
    has both files."""
    for subject in sorted(os.listdir(root)):
        subj_dir = os.path.join(root, subject)
        if not os.path.isdir(subj_dir):
            continue
        for date in sorted(os.listdir(subj_dir)):
            d = os.path.join(subj_dir, date)
            real_p = os.path.join(d, real_name)
            rec_p = os.path.join(d, rec_name)
            if os.path.isfile(real_p) and os.path.isfile(rec_p):
                yield subject, date, real_p, rec_p


@jax.jit
def _pair_metrics(real: jax.Array, rec: jax.Array):
    return mae(rec, real), ms_ssim(rec, real), psnr(rec, real)


def folder_pair_metrics(
    root: str,
    real_name: str = "ori.nii.gz",
    rec_name: str = "rec.nii.gz",
    metric_shape: Tuple[int, int, int] = METRIC_SHAPE,
    intensity_match: bool = False,
) -> Dict[str, float]:
    maes: List[float] = []
    ssims: List[float] = []
    psnrs: List[float] = []
    for subject, date, real_p, rec_p in iter_volume_pairs(root, real_name, rec_name):
        real = nifti.read_array(real_p).astype(np.float32)
        rec = nifti.read_array(rec_p).astype(np.float32)
        if intensity_match:
            rec = rec / max(rec.mean(), 1e-12) * real.mean()
        real = pad_crop_np(real, metric_shape)
        rec = pad_crop_np(rec, metric_shape)
        m, s, p = _pair_metrics(jnp.asarray(real), jnp.asarray(rec))
        maes.append(float(m))
        ssims.append(float(s))
        psnrs.append(float(p))
    def stats(v):
        a = np.asarray(v, np.float64)
        return (float(a.mean()), float(a.std())) if a.size else (float("nan"), float("nan"))

    mm, ms_ = stats(maes)
    sm, ss_ = stats(ssims)
    pm, ps_ = stats(psnrs)
    return {
        "count": len(maes),
        "mae_mean": mm,
        "mae_std": ms_,
        "ms_ssim_mean": sm,
        "ms_ssim_std": ss_,
        "psnr_mean": pm,
        "psnr_std": ps_,
    }
