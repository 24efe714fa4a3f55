"""Aux subsystem tests: perceptual loss, metric writer, prefetch, timers."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from cips_tpu.models.perceptual import PerceptualLoss
from cips_tpu.parallel.mesh import device_prefetch, make_mesh
from cips_tpu.training.common import MetricWriter, StepTimer
from cips_tpu.training.profiling import device_memory_report, timed_steps


def test_perceptual_loss_properties():
    p = PerceptualLoss(spatial_dims=3)
    x = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 32, 1)), jnp.float32)
    params = p.init(jax.random.key(0), x, x)
    same = float(p.apply(params, x, x))
    assert abs(same) < 1e-6  # identical volumes -> zero distance
    y = jnp.clip(x + 0.3, 0, 1)
    diff = float(p.apply(params, x, y))
    assert diff > 0

    p2 = PerceptualLoss(spatial_dims=2)
    x2 = x[:, 0]
    params2 = p2.init(jax.random.key(0), x2, x2)
    assert abs(float(p2.apply(params2, x2, x2))) < 1e-6


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path))
    w.scalars("training", {"loss": 1.5}, step=3)
    w.close()
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    rec = json.loads(lines[-1])
    assert rec["loss"] == 1.5 and rec["step"] == 3 and rec["prefix"] == "training"


def test_device_prefetch_order_and_content():
    mesh = make_mesh()
    batches = [{"x": np.full((8, 2), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches), mesh, depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(b["x"][0, 0]) == i


def test_timers_and_memory_report():
    t = StepTimer()
    t.lap()
    t.lap()
    assert t.mean() > 0
    ts = timed_steps(range(4), warmup=1)
    for _ in ts:
        pass
    rep = ts.report()
    assert rep["steps"] == 4
    mem = device_memory_report()
    assert len(mem) == len(jax.devices())


def test_guard_nonfinite_restores_state():
    from cips_tpu.training.common import guard_nonfinite

    def bad_step(state, batch):
        new_state = jax.tree_util.tree_map(lambda x: x + 1.0, state)
        loss = jnp.where(batch["explode"], jnp.float32(jnp.nan), jnp.float32(0.5))
        return new_state, {"g_loss": loss}

    guarded = jax.jit(guard_nonfinite(bad_step))
    state = {"w": jnp.ones((2,))}
    s1, m1 = guarded(state, {"explode": jnp.asarray(False)})
    assert float(m1["skipped_nonfinite"]) == 0.0
    np.testing.assert_allclose(np.asarray(s1["w"]), 2.0)
    s2, m2 = guarded(s1, {"explode": jnp.asarray(True)})
    assert float(m2["skipped_nonfinite"]) == 1.0
    np.testing.assert_allclose(np.asarray(s2["w"]), np.asarray(s1["w"]))  # update discarded
