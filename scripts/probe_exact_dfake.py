"""Measured stale-vs-exact D-fake dynamics (VERDICT item: make the default
a measured choice).

Runs a 40-step smoke of each GAN workload twice — default one-step-stale
fake vs exact_d_fake (reference semantics: D sees the post-update
generator) — on the same synthetic structured batch and seed, and prints
the g/d loss trajectories plus step-time cost of the extra forward.

  python scripts/probe_exact_dfake.py [flagship|causal|bmgan]

NOTE: volumes below ~(32,32,32) make the patch discriminators' logit maps
empty (now a loud ValueError rather than a silent NaN mean) — keep VOL at
half-volume scale.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Half volume by default: a dynamics probe, not a throughput bench. On CPU
# (tunnel down) CIPS_PROBE_VOL=32,32,32 keeps the patch-logit maps non-empty
# while making 40 fwd+bwd steps per variant tractable on one core.
VOL = tuple(int(v) for v in os.environ.get("CIPS_PROBE_VOL", "48,64,48").split(","))
STEPS = int(os.environ.get("CIPS_PROBE_STEPS", "40"))


def _structured(rng, shape):
    """Smooth blobby volumes so the losses have learnable structure."""
    base = rng.random([shape[0]] + [s // 4 for s in shape[1:4]] + [shape[4]], np.float32)
    import jax.image

    x = jax.image.resize(jnp.asarray(base), shape, "linear")
    return x.astype(jnp.bfloat16)


def trajectory(step, state, batch, keys, fetch):
    gl, dl = [], []
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, m = step(state, batch, keys[i]) if keys is not None else step(state, batch)
        gl.append(float(m["g_loss"]))
        dl.append(float(m["d_loss"]))
    dt = (time.perf_counter() - t0) / STEPS
    return gl, dl, dt


def run_flagship():
    from __graft_entry__ import FLAGSHIP_CFG, N_COVARIATES, TRAIN_CFG
    from cips_tpu.training.unet_synthesis import build_models, init_state, make_train_step

    rng = np.random.default_rng(0)
    shape = (4, *VOL, 1)
    g, d, p = build_models(FLAGSHIP_CFG, n_covariates=N_COVARIATES, dtype=jnp.bfloat16)
    batch = {
        "t1": _structured(rng, shape),
        "pet": _structured(rng, shape),
        "info": jnp.asarray(rng.random((4, 1, N_COVARIATES), np.float32), jnp.bfloat16),
    }
    for exact in (False, True):
        state = init_state(jax.random.key(0), g, d, p, TRAIN_CFG,
                           batch_shape=(1,) + shape[1:], n_covariates=N_COVARIATES)
        step = jax.jit(make_train_step(g, d, p, TRAIN_CFG, exact_d_fake=exact), donate_argnums=0)
        state, m = step(state, batch)
        float(m["g_loss"])  # compile
        state = init_state(jax.random.key(0), g, d, p, TRAIN_CFG,
                           batch_shape=(1,) + shape[1:], n_covariates=N_COVARIATES)
        gl, dl, dt = trajectory(step, state, batch, None, None)
        print(f"flagship exact={exact}: step {dt*1e3:.0f} ms  "
              f"g {gl[0]:.4f}->{gl[-1]:.4f}  d {dl[0]:.4f}->{dl[-1]:.4f}  "
              f"g_tail_mean {np.mean(gl[-10:]):.4f}  d_tail_mean {np.mean(dl[-10:]):.4f}",
              flush=True)


def run_causal():
    from cips_tpu.cli import common
    from cips_tpu.training import causal_task

    cfg = common.load_config(None, "training_causal.json")
    rng = np.random.default_rng(1)
    shape = (1, *VOL, 1)
    enc, t1_dec, pet_dec, disc, perc = causal_task.build_models(cfg, n_covariates=5, dtype=jnp.bfloat16)
    batch = {
        "t1": _structured(rng, shape),
        "pet": _structured(rng, shape),
        "info": jnp.asarray(rng.random((1, 1, 5), np.float32), jnp.bfloat16),
    }
    keys = [jax.random.key(100 + i) for i in range(STEPS)]
    for exact in (False, True):
        state = causal_task.init_state(jax.random.key(0), enc, t1_dec, pet_dec, disc, perc,
                                       cfg["training"], shape, n_covariates=5)
        step = jax.jit(causal_task.make_train_step(enc, t1_dec, pet_dec, disc, perc,
                                                   cfg["training"], exact_d_fake=exact),
                       donate_argnums=0)
        state, m = step(state, batch, keys[0])
        float(m["g_loss"])
        state = causal_task.init_state(jax.random.key(0), enc, t1_dec, pet_dec, disc, perc,
                                       cfg["training"], shape, n_covariates=5)
        gl, dl, dt = trajectory(step, state, batch, keys, None)
        print(f"causal exact={exact}: step {dt*1e3:.0f} ms  "
              f"g {gl[0]:.4f}->{gl[-1]:.4f}  d {dl[0]:.4f}->{dl[-1]:.4f}  "
              f"g_tail_mean {np.mean(gl[-10:]):.4f}  d_tail_mean {np.mean(dl[-10:]):.4f}",
              flush=True)


def run_bmgan():
    from cips_tpu.training import bmgan_task

    rng = np.random.default_rng(2)
    # The dense UNet's stem + 5 dense levels need /32-divisible extents
    # (the reference trains at (96,128,96): 3,4,3 cells at the coarsest),
    # and the 4-layer k4-s2 patch discriminator's logit map is empty below
    # 64: round the probe volume up accordingly.
    vol = tuple(max(64, -(-v // 32) * 32) for v in VOL)
    shape = (1, *vol, 1)
    g, e, d, p = bmgan_task.build_models(dtype=jnp.bfloat16)
    batch = {"t1": _structured(rng, shape), "pet": _structured(rng, shape)}
    keys = [jax.random.key(200 + i) for i in range(STEPS)]
    for exact in (False, True):
        state = bmgan_task.init_state(jax.random.key(0), g, e, d, p, shape, perceptual_weight=0.0)
        step = jax.jit(bmgan_task.make_train_step(g, e, d, p, 20.0, 0.0, exact_d_fake=exact),
                       donate_argnums=0)
        state, m = step(state, batch, keys[0])
        float(m["g_loss"])
        state = bmgan_task.init_state(jax.random.key(0), g, e, d, p, shape, perceptual_weight=0.0)
        gl, dl, dt = trajectory(step, state, batch, keys, None)
        print(f"bmgan exact={exact}: step {dt*1e3:.0f} ms  "
              f"g {gl[0]:.4f}->{gl[-1]:.4f}  d {dl[0]:.4f}->{dl[-1]:.4f}  "
              f"g_tail_mean {np.mean(gl[-10:]):.4f}  d_tail_mean {np.mean(dl[-10:]):.4f}",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("flagship", "all"):
        run_flagship()
    if which in ("causal", "all"):
        run_causal()
    if which in ("bmgan", "all"):
        run_bmgan()
