"""Capture-range sweep for the physical-space rigid registration.

ADNI-realistic synthetic cases (oblique anisotropic headers, cropped PET
FOV, bias field, noise) with increasing true inter-scan motion; records
masked correlation after header-only alignment vs full optimisation, and
whether the optimiser recovered (corr > 0.93). The documented result goes
in docs/DESIGN.md (ANTs' rigid stage on the same regime captures ~10-15deg
from a header start; reg_to_T1.py:62-99 is the reference chain).

  python scripts/probe_reg_capture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if not os.environ.get("CIPS_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_registration_geometry import _make_case, _masked_corr  # noqa: E402

from cips_tpu.ops.registration import apply_transform, register_rigid_physical  # noqa: E402


def main():
    print(f"{'deg':>5} {'mm':>5}  {'header':>7} {'optim':>7}  recovered")
    for deg in (2.0, 4.0, 6.0, 8.0, 10.0, 12.0, 15.0, 20.0):
        mm = (deg / 2, -deg / 3, deg / 4)
        t1, t1_aff, pet, pet_aff = _make_case(motion_deg=deg, motion_mm=mm)
        mask = t1 > 0.2
        hdr = register_rigid_physical(
            jnp.asarray(pet), jnp.asarray(t1), pet_aff, t1_aff, pyramid=(2,), iters_per_level=0
        )
        base = _masked_corr(apply_transform(jnp.asarray(pet), hdr.matrix, out_shape=t1.shape), t1, mask)
        res = register_rigid_physical(
            jnp.asarray(pet), jnp.asarray(t1), pet_aff, t1_aff,
            pyramid=(2, 1), iters_per_level=120,
        )
        corr = _masked_corr(apply_transform(jnp.asarray(pet), res.matrix, out_shape=t1.shape), t1, mask)
        mmmag = float(np.linalg.norm(mm))
        print(f"{deg:5.1f} {mmmag:5.1f}  {base:7.4f} {corr:7.4f}  {'YES' if corr > 0.93 else 'no'}",
              flush=True)


if __name__ == "__main__":
    main()
