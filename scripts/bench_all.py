"""Per-workload training-throughput bench: one JSON line per workload.

Measures the full jitted train step of all four reference workloads at the
(96,128,96) working volume on the attached TPU chip, each with its
reference config, and prints one JSON object per line:
  {"metric": ..., "value": ..., "unit": "volumes/sec/chip", "vs_baseline": ...}

vs_baseline anchors (volumes/sec/GPU, analytic — the reference publishes no
numbers, BASELINE.md): flagship 2.0 (batch 2/GPU fp32 + synchronous decode),
BMGAN 1.0 (batch 1), causal 0.8 (batch 2 across heavier trio), classifier
4.0 (batch 4 encoder-only).

Results land in BENCH_WORKLOADS.json too, so round-over-round regressions
anywhere in the zoo are visible (the driver's bench.py stays the flagship
single line).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cips_tpu.cli import common

VOL = (96, 128, 96)


def _rand(rng, shape, dtype=jnp.bfloat16):
    return jnp.asarray(rng.random(shape, np.float32), dtype)


def _measure(step, state, args, fetch, n=6):
    state, m = step(state, *args)
    fetch(m)
    state, m = step(state, *args)
    fetch(m)
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, *args)
    fetch(m)
    return (time.perf_counter() - t0) / n


def bench_flagship(rng):
    from __graft_entry__ import FLAGSHIP_CFG, N_COVARIATES, TRAIN_CFG
    from cips_tpu.training.unet_synthesis import build_models, init_state, make_train_step

    # conv12 save policy (skip/tiled-conv1 recomputed) fits batch 16 — the
    # round-3 throughput optimum (BENCH_NOTES.md round-3 log). Env override
    # so A/B queues can probe other amortisation points without editing.
    batch = int(os.environ.get("CIPS_BENCH_FLAGSHIP_BATCH", "16"))
    shape = (batch, *VOL, 1)
    g, d, p = build_models(
        FLAGSHIP_CFG, n_covariates=N_COVARIATES, dtype=jnp.bfloat16, remat_policy="conv12"
    )
    state = init_state(
        jax.random.key(0), g, d, p, TRAIN_CFG, batch_shape=(1,) + shape[1:], n_covariates=N_COVARIATES
    )
    batch_data = {
        "t1": _rand(rng, shape),
        "pet": _rand(rng, shape),
        "info": _rand(rng, (batch, 1, N_COVARIATES)),
    }
    step = jax.jit(make_train_step(g, d, p, TRAIN_CFG, split_d=True), donate_argnums=0)
    dt = _measure(step, state, (batch_data,), lambda m: float(m["g_loss"]))
    return "t1_to_pet_synthesis_train_throughput", batch / dt, 2.0


def bench_bmgan(rng):
    from cips_tpu.training import bmgan_task

    # perceptual_weight=8.0 is the reference's real G-step cost
    # (/root/reference/bl_methods/BMGAN/train_bmgan.py:157,324) — benching
    # without it understated the workload (VERDICT round 3, weak #4).
    g, e, d, p = bmgan_task.build_models(dtype=jnp.bfloat16)
    shape = (1, *VOL, 1)
    state = bmgan_task.init_state(
        jax.random.key(0), g, e, d, p, shape, perceptual_weight=8.0
    )
    batch = {"t1": _rand(rng, shape), "pet": _rand(rng, shape)}
    step = jax.jit(bmgan_task.make_train_step(g, e, d, p, 20.0, 8.0), donate_argnums=0)
    dt = _measure(step, state, (batch, jax.random.key(1)), lambda m: float(m["g_loss"]))
    return "bmgan_train_throughput", 1 / dt, 1.0


def bench_causal(rng):
    from cips_tpu.training import causal_task

    cfg = common.load_config(None, "training_causal.json")
    enc, t1_dec, pet_dec, disc, perc = causal_task.build_models(cfg, n_covariates=5, dtype=jnp.bfloat16)
    step = jax.jit(
        causal_task.make_train_step(enc, t1_dec, pet_dec, disc, perc, cfg["training"]),
        donate_argnums=0,
    )
    # batch 4 fits again after the perceptual fake-3d channel squeeze but
    # HBM is marginal there; fall back to the proven batch-2 config rather
    # than lose the causal line to an OOM (bench.py isolates failures, but
    # a missing line hides regressions).
    last_err = None
    for b in (4, 2):
        shape = (b, *VOL, 1)
        state = causal_task.init_state(
            jax.random.key(0), enc, t1_dec, pet_dec, disc, perc, cfg["training"], (1, *VOL, 1), n_covariates=5
        )
        batch = {
            "t1": _rand(rng, shape),
            "pet": _rand(rng, shape),
            "info": _rand(rng, (b, 1, 5)),
        }
        try:
            dt = _measure(step, state, (batch, jax.random.key(1)), lambda m: float(m["rec_pet_loss"]))
        except Exception as e:  # noqa: BLE001 — OOM at the marginal batch
            last_err = e
            continue
        print(f"# causal bench ran at batch {b} ({dt*1e3:.0f} ms/step)", file=sys.stderr, flush=True)
        return "causal_synthesis_train_throughput", b / dt, 0.8
    raise last_err


def bench_classifier(rng):
    from cips_tpu.training import classifier_task

    cfg = common.load_config(None, "training_atten.json")
    model = classifier_task.build_model(cfg, in_channels=2, n_covariates=5, dtype=jnp.bfloat16)
    state = classifier_task.init_state(jax.random.key(0), model, (1, *VOL, 2), n_covariates=5)
    # batch 32 = the measured amortisation optimum on v5e (probe_classifier_
    # batch round-4: 16.6@4 / 53.9@8 / 55.1@16 / 57.7@32 vol/s/chip) — same
    # optimum-batch discipline as the flagship line; the reference trains at
    # batch 4 (train_atten_encoder_MCI.py:336). Env override for A/B probes.
    b = int(os.environ.get("CIPS_BENCH_CLS_BATCH", "32"))
    batch = {
        "imgs": _rand(rng, (b, *VOL, 2)),
        "info": _rand(rng, (b, 1, 5)),
        "labels": jnp.asarray([0, 1] * (b // 2)),
    }
    step = jax.jit(classifier_task.make_train_step(model, use_tabular=True), donate_argnums=0)
    dt = _measure(step, state, (batch, jax.random.key(1)), lambda m: float(m["ce_loss"]))
    return "mci_classifier_train_throughput", b / dt, 4.0


def main():
    rng = np.random.default_rng(0)
    rows = []
    # CIPS_BENCH_ONLY=flagship|bmgan|causal|classifier runs a single
    # workload (A/B probe queues); the full set is the default and the only
    # mode that refreshes BENCH_WORKLOADS.json.
    only = os.environ.get("CIPS_BENCH_ONLY", "")
    fns = {"flagship": bench_flagship, "bmgan": bench_bmgan,
           "causal": bench_causal, "classifier": bench_classifier}
    selected = [fns[only]] if only else list(fns.values())
    for fn in selected:
        metric, vps, anchor = fn(rng)
        per_chip = vps / jax.device_count()
        row = {
            "metric": metric,
            "value": round(per_chip, 3),
            "unit": "volumes/sec/chip",
            "vs_baseline": round(per_chip / anchor, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    if not only:
        out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_WORKLOADS.json")
        with open(out, "w", encoding="utf-8") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
