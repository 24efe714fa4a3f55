"""Toy-scale LEARNING assertions for the non-flagship workloads.

The flagship already proves optimisation works (test_training.py::
test_gan_training_step_loss_decreases); these cover the other three
training loops the reference ships — BMGAN (reference
bl_methods/BMGAN/train_bmgan.py), the unified causal generator
(causal_synthesis/scripts/train_unify_causal_gen.py) and the MCI
classifier (MCI_classification/train_atten_encoder_MCI.py) — by running
the REAL jitted train steps on structured synthetic data and asserting
the losses move, not merely that they are finite.

The model/config/data builders live in scripts/learning_curves.py (the
round-over-round regression harness); importing them keeps the tested
trajectories and the committed LEARNING_CURVES_REF.json in lockstep.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import learning_curves as lc  # noqa: E402


@pytest.fixture(scope="module")
def curves():
    # One pass per workload at the harness's default step counts; module
    # scoped so the three asserts below share the work.
    return {"bmgan": lc.bmgan(), "causal": lc.causal(), "classifier": lc.classifier()}


def test_bmgan_learns(curves):
    c = curves["bmgan"]
    # Reconstruction must improve; the GAN losses must stay finite and the
    # encoder KL term must not explode.
    assert c["l1_loss"][-1] < 0.7 * c["l1_loss"][0]
    for key in ("d_loss", "e_loss"):
        assert all(abs(v) < 1e3 for v in c[key])


def test_causal_learns(curves):
    c = curves["causal"]
    assert c["rec_pet_loss"][-1] < 0.8 * c["rec_pet_loss"][0]
    assert c["rec_t1_loss"][-1] < 0.8 * c["rec_t1_loss"][0]


def test_classifier_learns(curves):
    c = curves["classifier"]
    # Labels follow a linear rule on the covariates: CE must drop AND the
    # final train accuracy must beat chance on the balanced-ish batch.
    assert c["ce_loss"][-1] < 0.8 * c["ce_loss"][0]
    assert c["accuracy"][-1] >= 0.75
