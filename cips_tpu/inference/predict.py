"""Volume synthesis inference + per-volume metrics.

Re-implements `unet/scripts/output_predict.py`: run the generator over a
test manifest, brain-mask the synthesized volume with the mask of the REAL
PET (:118-119 — ants.get_mask of the ground truth), compute
MAE / MS-SSIM(kernel 5, sigma 0.5) / PSNR (:121-133), write
`ori.nii.gz` / `rec.nii.gz` per subject/date (:135-136) and report
mean ± std (:140-142). Also covers `gen_test_bmgan.py` /
`gen_test_unify_causal.py` output layouts (rec.nii.gz per subject/date;
the causal path min-max renormalises and masks with the mask of the
SYNTHESIZED volume, gen_test_unify_causal.py:133-136).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cips_tpu.data import nifti
from cips_tpu.ops.masking import get_mask
from cips_tpu.ops.metrics import mae, ms_ssim, psnr


@dataclass
class VolumeMetrics:
    mae: List[float] = field(default_factory=list)
    ms_ssim: List[float] = field(default_factory=list)
    psnr: List[float] = field(default_factory=list)

    def add(self, m: Mapping[str, float]) -> None:
        self.mae.append(m["mae"])
        self.ms_ssim.append(m["ms_ssim"])
        self.psnr.append(m["psnr"])

    def summary(self) -> Dict[str, float]:
        out = {}
        for name, vals in (("mae", self.mae), ("ms_ssim", self.ms_ssim), ("psnr", self.psnr)):
            arr = np.asarray(vals, np.float64)
            out[f"{name}_mean"] = float(arr.mean()) if arr.size else float("nan")
            out[f"{name}_std"] = float(arr.std()) if arr.size else float("nan")
        return out

    def __str__(self) -> str:
        s = self.summary()
        return (
            f"MAE {s['mae_mean']:.5f}±{s['mae_std']:.5f}  "
            f"MS-SSIM {s['ms_ssim_mean']:.5f}±{s['ms_ssim_std']:.5f}  "
            f"PSNR {s['psnr_mean']:.3f}±{s['psnr_std']:.3f}"
        )


@jax.jit
def _real_mask(real: jax.Array) -> jax.Array:
    return get_mask(real).astype(real.dtype)


@jax.jit
def _metric_triple(masked: jax.Array, real: jax.Array):
    return (
        mae(masked, real),
        ms_ssim(masked, real, kernel_size=5, sigma=0.5),
        psnr(masked, real),
    )


@jax.jit
def _renorm_and_self_mask(rec: jax.Array) -> jax.Array:
    """Causal-path output post-processing (gen_test_unify_causal.py:133-136):
    min-max renormalise then mask with the synthesized volume's own mask."""
    lo, hi = rec.min(), rec.max()
    rec = (rec - lo) / jnp.maximum(hi - lo, 1e-12)
    return rec * get_mask(rec).astype(rec.dtype)


def predict_dataset(
    predict_fn: Callable[[Mapping[str, jax.Array]], jax.Array],
    dataset,
    output_dir: Optional[str] = None,
    write_ori: bool = True,
    mask_mode: str = "real",  # "real" (output_predict) | "self" (causal gen) | "none"
    compute_metrics: bool = True,
    rec_name: str = "rec.nii.gz",
    ori_name: str = "ori.nii.gz",
    batch_size: int = 1,
) -> VolumeMetrics:
    """Run inference over a PairedVolumeDataset; returns aggregate metrics.

    ``predict_fn`` maps {"t1","pet","info"} (batched, channels-last) to the
    synthesized volume batch.
    """
    results = VolumeMetrics()
    n = len(dataset)
    for start in range(0, n, batch_size):
        samples = [dataset[i] for i in range(start, min(start + batch_size, n))]
        batch = {
            "t1": jnp.asarray(np.stack([s.t1 for s in samples])[..., None]),
            "pet": jnp.asarray(np.stack([s.pet for s in samples])[..., None]),
            "info": jnp.asarray(np.stack([s.info for s in samples])[:, None, :]),
        }
        recs = predict_fn(batch)
        for j, s in enumerate(samples):
            rec = recs[j, ..., 0].astype(jnp.float32)
            real = batch["pet"][j, ..., 0].astype(jnp.float32)
            if mask_mode == "self":
                rec = _renorm_and_self_mask(rec)
            masked = rec * _real_mask(real) if mask_mode == "real" else rec
            if compute_metrics:
                m, ss, ps = _metric_triple(masked, real)
                results.add({"mae": float(m), "ms_ssim": float(ss), "psnr": float(ps)})
            if output_dir is not None:
                out_dir = os.path.join(output_dir, s.subject, s.pet_date)
                nifti.write(os.path.join(out_dir, rec_name), np.asarray(masked, np.float32))
                if write_ori:
                    nifti.write(os.path.join(out_dir, ori_name), np.asarray(real, np.float32))
    return results
