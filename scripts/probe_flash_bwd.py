"""Measure the Pallas flash backward vs the jnp-scan backward on TPU.

  python scripts/probe_flash_bwd.py [stage]

stage 1: small-L numeric check vs reference attention (fast, low wedge risk)
stage 2: causal shape (2,4,18432,32) fwd+bwd timing, block variants
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

from cips_tpu.ops.attention import _reference_attention
from cips_tpu.ops.pallas.flash_attention import _flash_backward, _flash_core, flash_attention


def _rand(shape, dtype=jnp.bfloat16, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), dtype)


def stage1():
    b, h, l, d = 1, 2, 1024, 32
    q, k, v = (_rand((b, h, l, d), seed=i) for i in range(3))
    scale = 1.0 / d**0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=scale).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, scale, False).astype(jnp.float32) ** 2)

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for name, a, bb in zip("q k v".split(), gf, gr):
        a32, b32 = np.asarray(a, np.float32), np.asarray(bb, np.float32)
        rel = np.abs(a32 - b32).max() / (np.abs(b32).max() + 1e-9)
        print(f"stage1 d{name}: max rel err {rel:.2e}", flush=True)


def time_grad(fn, args, n=5):
    g = jax.jit(jax.grad(fn, argnums=(0, 1, 2)))
    out = g(*args)
    float(jnp.sum(out[0].astype(jnp.float32)))
    out = g(*args)
    float(jnp.sum(out[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = g(*args)
    float(jnp.sum(out[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def time_fwd(fn, args, n=5):
    f = jax.jit(fn)
    o = f(*args)
    float(jnp.sum(o.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*args)
    float(jnp.sum(o.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def stage2():
    b, h, l, d = 2, 4, 18432, 32
    q, k, v = (_rand((b, h, l, d), seed=i) for i in range(3))
    scale = 1.0 / d**0.5

    for bq, bk in ((256, 512), (512, 512), (512, 1024)):
        fwd = lambda q, k, v: flash_attention(q, k, v, scale=scale, block_q=bq, block_k=bk)
        t = time_fwd(fwd, (q, k, v))
        print(f"fwd blocks ({bq},{bk}): {t*1e3:7.2f} ms", flush=True)

    for bq, bk in ((256, 512), (512, 512), (512, 1024)):
        def loss(q, k, v, bq=bq, bk=bk):
            o = flash_attention(q, k, v, scale=scale, block_q=bq, block_k=bk)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        t = time_grad(loss, (q, k, v))
        print(f"fwd+bwd blocks ({bq},{bk}): {t*1e3:7.2f} ms  (pallas bwd)", flush=True)

    # old jnp-scan backward for comparison (same fwd kernel)
    import functools

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
    def core_jnp(q, k, v, scale, bq, bk, interp):
        return _flash_core(q, k, v, scale, bq, bk, interp)

    from cips_tpu.ops.pallas.flash_attention import _flash_forward

    def fwd_jnp(q, k, v, scale, bq, bk, interp):
        out, lse = _flash_forward(q, k, v, scale, bq, bk, interp)
        return out, (q, k, v, out, lse)

    def bwd_jnp(scale, bq, bk, interp, res, g):
        return _flash_backward(scale, bq, res, g)

    core_jnp.defvjp(fwd_jnp, bwd_jnp)

    def loss_jnp(q, k, v):
        return jnp.sum(core_jnp(q, k, v, scale, 256, 512, False).astype(jnp.float32) ** 2)

    t = time_grad(loss_jnp, (q, k, v))
    print(f"fwd+bwd (256,512) jnp-scan bwd: {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "1"
    if stage in ("1", "all"):
        stage1()
    if stage in ("2", "all"):
        stage2()
