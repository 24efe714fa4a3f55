"""Folder-pair metric tool — compare synthesized vs real volume trees.

Re-implements `unet/scripts/metrics.py` faithfully:
  * walk the SYNTHESIZED tree {sys_root}/{subject}/{date}/ and pair each
    session with the real tree (same subject/date, first file), skipping
    sessions with no real counterpart (:24-46) — or, in single-root mode,
    pair (real_name, rec_name) files inside one tree (the layout our
    inference CLI writes);
  * real volume is max-normalised `real /= max(real)` (:48);
  * synthesized volume optionally mean-intensity matched
    `sys / mean(sys) * mean(real)` (:51-52, default ON — ``set_mean=True``);
  * both padded/cropped to the metric shape (192, 224, 192) (:55-60);
  * MAE (:62-63); MS-SSIM with torchmetrics defaults (data_range 1.0,
    kernel 11, sigma 1.5) computed exactly as the reference does — its
    4-D ``unsqueeze(0)`` input routes torchmetrics' 2-D path with the
    slice axis as channels (``ms_ssim_2d_slicewise``), NaN values skipped
    (:64-66); PSNR = 10*log10(1/MSE) (:67-68) — mean ± std over the cohort.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cips_tpu.data import nifti
from cips_tpu.data.dataset import pad_crop_np
from cips_tpu.ops.metrics import mae, ms_ssim_2d_slicewise, psnr

METRIC_SHAPE = (192, 224, 192)


def iter_volume_pairs(
    root: str, real_name: str = "ori.nii.gz", rec_name: str = "rec.nii.gz"
) -> Iterable[Tuple[str, str, str, str]]:
    """Single-root mode: yield (subject, date, real_path, rec_path) for each
    session dir holding both files (the tree `cli.output_predict` writes)."""
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


def iter_two_root_pairs(sys_root: str, real_root: str) -> Iterable[Tuple[str, str, str, str]]:
    """Two-tree mode (metrics.py:24-46): walk the synthesized tree, take the
    FIRST file of each session dir, and pair it with the first file of the
    same {subject}/{date} in the real tree; skip unmatched sessions."""
    for subject in sorted(os.listdir(sys_root)):
        subj_dir = os.path.join(sys_root, subject)
        if not os.path.isdir(subj_dir):
            continue
        for date in sorted(os.listdir(subj_dir)):
            d = os.path.join(subj_dir, date)
            sys_files = sorted(os.listdir(d)) if os.path.isdir(d) else []
            real_d = os.path.join(real_root, subject, date)
            if not sys_files or not os.path.isdir(real_d):
                continue
            real_files = sorted(os.listdir(real_d))
            if not real_files:
                continue
            yield subject, date, os.path.join(real_d, real_files[0]), os.path.join(d, sys_files[0])


@jax.jit
def _pair_metrics(real: jax.Array, rec: jax.Array):
    return mae(rec, real), ms_ssim_2d_slicewise(rec, real), psnr(rec, real)


def folder_pair_metrics(
    root: str,
    real_name: str = "ori.nii.gz",
    rec_name: str = "rec.nii.gz",
    real_root: Optional[str] = None,
    metric_shape: Tuple[int, int, int] = METRIC_SHAPE,
    intensity_match: bool = True,
) -> Dict[str, float]:
    if real_root is not None:
        pairs = iter_two_root_pairs(root, real_root)
    else:
        pairs = iter_volume_pairs(root, real_name, rec_name)
    maes: List[float] = []
    ssims: List[float] = []
    psnrs: List[float] = []
    for subject, date, real_p, rec_p in pairs:
        real = nifti.read_array(real_p).astype(np.float32)
        rec = nifti.read_array(rec_p).astype(np.float32)
        real = real / max(real.max(), 1e-12)  # metrics.py:48
        if intensity_match:
            rec = rec / max(rec.mean(), 1e-12) * real.mean()
        real = pad_crop_np(real, metric_shape)
        rec = pad_crop_np(rec, metric_shape)
        m, s, p = _pair_metrics(jnp.asarray(real), jnp.asarray(rec))
        maes.append(float(m))
        if not np.isnan(float(s)):  # metrics.py:64-66 skips NaN MS-SSIM
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
