"""Trace a full workload train step on TPU and attribute the top fusions.

  python scripts/trace_step.py {flagship|bmgan|causal} [batch]

Prints the per-step device time of the top HLO ops with a content summary
recovered from the compiled HLO text (shared helper scripts/trace_util.py),
so anonymous `fusion.N` rows become "shape <- op kinds".
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from trace_util import hlo_fusion_index, summarize_trace  # noqa: E402

from cips_tpu.cli import common  # noqa: E402

VOL = (96, 128, 96)
TRACE_DIR = "/tmp/trace_step"


def build(which: str, b: int, rng):
    def _r(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.random(shape, np.float32), dtype)

    shape = (b, *VOL, 1)
    if which == "flagship":
        from __graft_entry__ import FLAGSHIP_CFG, N_COVARIATES, TRAIN_CFG
        from cips_tpu.training.unet_synthesis import build_models, init_state, make_train_step

        g, d, p = build_models(
            FLAGSHIP_CFG, n_covariates=N_COVARIATES, dtype=jnp.bfloat16, remat_policy="conv12"
        )
        state = init_state(
            jax.random.key(0), g, d, p, TRAIN_CFG, batch_shape=(1,) + shape[1:],
            n_covariates=N_COVARIATES,
        )
        batch = {"t1": _r(shape), "pet": _r(shape), "info": _r((b, 1, N_COVARIATES))}
        step = jax.jit(make_train_step(g, d, p, TRAIN_CFG, split_d=True))
        return step, (state, batch), lambda m: float(m["g_loss"])
    if which == "bmgan":
        from cips_tpu.training import bmgan_task

        g, e, d, p = bmgan_task.build_models(dtype=jnp.bfloat16)
        state = bmgan_task.init_state(jax.random.key(0), g, e, d, p, (1, *VOL, 1), perceptual_weight=0.0)
        batch = {"t1": _r(shape), "pet": _r(shape)}
        raw = bmgan_task.make_train_step(g, e, d, p, 20.0, 0.0)
        step = jax.jit(lambda s, bt: raw(s, bt, jax.random.key(1)))
        return step, (state, batch), lambda m: float(m["g_loss"])
    if which == "causal":
        from cips_tpu.training import causal_task

        cfg = common.load_config(None, "training_causal.json")
        enc, t1_dec, pet_dec, disc, perc = causal_task.build_models(
            cfg, n_covariates=5, dtype=jnp.bfloat16
        )
        state = causal_task.init_state(
            jax.random.key(0), enc, t1_dec, pet_dec, disc, perc, cfg["training"], (1, *VOL, 1),
            n_covariates=5,
        )
        batch = {"t1": _r(shape), "pet": _r(shape), "info": _r((b, 1, 5))}
        raw = causal_task.make_train_step(enc, t1_dec, pet_dec, disc, perc, cfg["training"])
        step = jax.jit(lambda s, bt: raw(s, bt, jax.random.key(1)))
        return step, (state, batch), lambda m: float(m["rec_pet_loss"])
    raise SystemExit(f"unknown workload {which}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "bmgan"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rng = np.random.default_rng(0)
    step, (state, batch), fetch = build(which, b, rng)

    state2, m = step(state, batch)
    fetch(m)
    state2, m = step(state, batch)
    fetch(m)

    n = 3
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(n):
        state2, m = step(state, batch)
    fetch(m)
    jax.profiler.stop_trace()

    totals = summarize_trace(TRACE_DIR, n)
    grand = sum(totals.values())

    # attribute via the compiled HLO of the SAME jit (cache hit)
    try:
        text = step.lower(state, batch).compile().as_text()
    except Exception:
        text = ""
    describe = hlo_fusion_index(text) if text else (lambda s: "")

    print(f"total device op-time {grand:.1f} ms/step; top ops:")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{ms:9.2f} ms  {name[:40]:40} {describe(name)[:100]}")


if __name__ == "__main__":
    main()
