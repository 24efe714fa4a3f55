"""Micro-probe: causal-encoder hot ops at their real shapes (batch 1).

L0: (2,1,1)-packed halo conv 64->64 on the (48,128,96) cell grid.
L1: dense conv 128->128 at (48,64,48). GN at both. fwd + grad each,
with GFLOP and implied MFU printed.
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

from cips_tpu.ops.s2d import packed_conv

PEAK = 394e12


def timeit(fn, *args, n=20):
    out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    return (time.perf_counter() - t0) / n


def report(name, dt, gflop):
    print(f"{name:34s} {dt*1e3:7.2f} ms  {gflop:7.1f} GF  MFU {gflop/1e3/(dt*PEAK/1e12)*100:5.1f}%", flush=True)


def main():
    rng = np.random.default_rng(0)
    f = (2, 1, 1)

    # L0 packed halo conv 64->64
    x0 = jnp.asarray(rng.random((1, 48, 128, 96, 128), np.float32), jnp.bfloat16)
    w0 = jnp.asarray(rng.random((3, 3, 3, 64, 64), np.float32), jnp.bfloat16) * 0.1
    c0 = jax.jit(lambda x, w: packed_conv(x, w, f=f))
    g0 = jax.jit(jax.grad(lambda w, x: jnp.sum(packed_conv(x, w, f=f).astype(jnp.float32) ** 2), argnums=(0,)))
    math_gf = 96 * 128 * 96 * 64 * 64 * 27 * 2 / 1e9
    report("L0 halo (2,1,1) 64->64 fwd", timeit(c0, x0, w0), math_gf)
    report("L0 halo grad (dW; dX via vjp)", timeit(lambda w: g0(w, x0), w0), 3 * math_gf)

    # L0 full vjp (dx + dw)
    gv = jax.jit(lambda x, w: jax.vjp(lambda a, b: packed_conv(a, b, f=f), x, w)[1](x0 * 0 + 1))
    report("L0 halo full vjp", timeit(gv, x0, w0), 2 * math_gf)

    # L1 dense conv 128->128 at (48,64,48)
    x1 = jnp.asarray(rng.random((1, 48, 64, 48, 128), np.float32), jnp.bfloat16)
    w1 = jnp.asarray(rng.random((3, 3, 3, 128, 128), np.float32), jnp.bfloat16) * 0.1
    dn = ("NDHWC", "DHWIO", "NDHWC")
    c1 = jax.jit(lambda x, w: jax.lax.conv_general_dilated(x, w, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn))
    gf1 = 48 * 64 * 48 * 128 * 128 * 27 * 2 / 1e9
    report("L1 dense 128->128 fwd", timeit(c1, x1, w1), gf1)
    gv1 = jax.jit(lambda x, w: jax.vjp(lambda a, b: jax.lax.conv_general_dilated(a, b, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn), x, w)[1](x1 * 0 + 1))
    report("L1 dense full vjp", timeit(gv1, x1, w1), 2 * gf1)

    # GN at L0 packed shape (bandwidth-bound; report GB/s instead)
    import flax.linen as nn
    from cips_tpu.models.blocks import GroupNorm

    gmod = GroupNorm(16, 1e-6, packed=True, phases=2)
    gp = gmod.init(jax.random.key(0), x0)
    gfn = jax.jit(lambda p, x: gmod.apply(p, x))
    dt = timeit(gfn, gp, x0)
    gb = x0.size * 2 * 2 / 1e9
    print(f"{'L0 packed GN fwd':34s} {dt*1e3:7.2f} ms  {gb/dt:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
