"""Causal encoder grad: remat(conv_all) vs no-remat (batch 1) — decide
whether the 3.6x backward ratio is remat recompute or kernel inefficiency."""

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

from cips_tpu.cli import common
from cips_tpu.training import causal_task

VOL = (96, 128, 96)


def timeit(fn, *args, n=6):
    out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cfg = common.load_config(None, "training_causal.json")
    rng = np.random.default_rng(0)
    t1 = jnp.asarray(rng.random((1, *VOL, 1), np.float32), jnp.bfloat16)
    for remat in (True, False):
        enc, *_ = causal_task.build_models(cfg, n_covariates=5, dtype=jnp.bfloat16, remat=remat)
        params = jax.jit(enc.init)(jax.random.key(0), t1)
        fwd = jax.jit(lambda p: enc.apply(p, t1))
        grad = jax.jit(jax.grad(lambda p: jnp.mean(jnp.square(enc.apply(p, t1).astype(jnp.float32)))))
        tf = timeit(fwd, params)
        tg = timeit(grad, params)
        print(f"remat={remat}: fwd {tf:6.1f} ms  grad {tg:6.1f} ms  ratio {tg/tf:.2f}", flush=True)


if __name__ == "__main__":
    main()
