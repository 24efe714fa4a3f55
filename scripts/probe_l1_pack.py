"""Probe: level-1 (2,2,1) packing pieces + whole-model forward variants."""

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

from cips_tpu.ops.s2d import packed_conv, repack_pool, repack_tile


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a.astype(jnp.float32))), out)
    return (time.perf_counter() - t0) / n


def main():
    B = 8
    rng = np.random.default_rng(0)

    def arr(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    f1 = (2, 2, 1)
    # level-1 packed conv: cells (24,32,48), C=32 -> 128 packed
    x1 = arr((B, 24, 32, 48, 128))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 32)) * 0.1, jnp.float32)
    t = timeit(jax.jit(lambda a, b: packed_conv(a, b, f=f1)), x1, w)
    print(f"L1 packed(2,2,1) conv 32->32        {t*1e3:7.2f} ms", flush=True)

    w2 = jnp.asarray(rng.standard_normal((3, 3, 3, 64, 32)) * 0.1, jnp.float32)
    x2 = arr((B, 24, 32, 48, 256))
    t = timeit(jax.jit(lambda a, b: packed_conv(a, b, f=f1)), x2, w2)
    print(f"L1 packed(2,2,1) conv 64->32 concat {t*1e3:7.2f} ms", flush=True)

    # transitions
    x0 = arr((B, 48, 64, 48, 128))  # level-0 packed (16ch)
    t = timeit(jax.jit(lambda a: repack_pool(a, (2, 2, 2), f1)), x0)
    print(f"repack_pool F8 -> (2,2,1)           {t*1e3:7.2f} ms", flush=True)
    t = timeit(jax.jit(lambda a: repack_tile(a, f1, (2, 2, 2))), x1)
    print(f"repack_tile (2,2,1) -> F8           {t*1e3:7.2f} ms", flush=True)
    t = timeit(jax.jit(lambda a: repack_pool(a, f1, None)), x1)
    print(f"repack_pool (2,2,1) -> unpacked     {t*1e3:7.2f} ms", flush=True)
    t = timeit(jax.jit(lambda a: repack_tile(a, None, f1)), arr((B, 24, 32, 24, 64)))
    print(f"repack_tile unpacked L2 -> (2,2,1)  {t*1e3:7.2f} ms", flush=True)

    # whole-model forward variants
    from __graft_entry__ import FLAGSHIP_CFG, N_COVARIATES
    from cips_tpu.models.atten_unet import AttenUNet

    x = arr((B, 96, 128, 96, 1))
    ctx = arr((B, 1, N_COVARIATES))
    for label, extra in [
        ("fwd s2d L0 only", {"s2d": True, "s2d_factors": ((2, 2, 2),)}),
        ("fwd s2d L0+L1", {"s2d": True, "s2d_factors": ((2, 2, 2), (2, 2, 1))}),
    ]:
        unet_def = dict(FLAGSHIP_CFG["atten_unet_def"])
        unet_def.update(cross_attention_dim=N_COVARIATES, with_conditioning=True, remat=False)
        unet_def.update(extra)
        g = AttenUNet(dtype=jnp.bfloat16, **unet_def)
        params = jax.jit(g.init)(jax.random.key(0), x[:1], ctx[:1])
        f = jax.jit(lambda p, a, c: g.apply(p, a, c))
        t = timeit(f, params, x, ctx, n=10)
        print(f"{label:36s} {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
