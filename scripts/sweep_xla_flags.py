"""Compiler-option sweep on the flagship train step (TPU).

Sweeps `xla_tpu_scoped_vmem_limit_kib` (the one long-stable TPU compiler
option with a measured history of moving conv-heavy workloads) through the
per-compile `compiler_options` channel — no process restarts, each setting
is an AOT `.lower().compile()` of the SAME traced step.

NOTE: unknown option names crash the remote-compile worker and wedge the
tunnel for ~30 min (measured 2026-08-17) — only add names verified against
this libtpu's xla.proto.

  python scripts/sweep_xla_flags.py [batch] [policy]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import FLAGSHIP_CFG, N_COVARIATES, TRAIN_CFG  # noqa: E402
from cips_tpu.training.unet_synthesis import build_models, init_state, make_train_step  # noqa: E402

VOL = (96, 128, 96)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    policy = sys.argv[2] if len(sys.argv) > 2 else "conv12"
    shape = (batch, *VOL, 1)
    g, d, p = build_models(
        FLAGSHIP_CFG, n_covariates=N_COVARIATES, dtype=jnp.bfloat16, remat_policy=policy
    )
    state = init_state(
        jax.random.key(0), g, d, p, TRAIN_CFG, batch_shape=(1,) + shape[1:],
        n_covariates=N_COVARIATES,
    )
    rng = np.random.default_rng(0)
    batch_data = {
        "t1": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
        "pet": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
        "info": jnp.asarray(rng.random((batch, 1, N_COVARIATES), np.float32), jnp.bfloat16),
    }
    step = make_train_step(g, d, p, TRAIN_CFG, split_d=True)
    lowered = jax.jit(step, donate_argnums=0).lower(state, batch_data)

    # default (16 MiB) first as the in-run control, then larger scoped-vmem
    # budgets: more VMEM per fusion lets Mosaic keep bigger conv tiles
    # resident (less HBM re-reading), at the cost of less double-buffering
    # headroom.
    for kib in (None, 32768, 49152, 65536, 98304):
        opts = None if kib is None else {"xla_tpu_scoped_vmem_limit_kib": str(kib)}
        tag = "default" if kib is None else f"{kib}kib"
        try:
            t0 = time.perf_counter()
            ex = lowered.compile(compiler_options=opts)
            ct = time.perf_counter() - t0
            state, m = ex(state, batch_data)
            float(m["g_loss"])
            t0 = time.perf_counter()
            n = 4
            for _ in range(n):
                state, m = ex(state, batch_data)
            float(m["g_loss"])
            dt = (time.perf_counter() - t0) / n
            print(
                f"{tag:>10}: {dt*1e3:7.1f} ms/step  {batch/dt:6.2f} vol/s  (compile {ct:.0f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(f"{tag:>10}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
