"""Bare-op bandwidth at the GN shape: copy, single reduce, dual reduce,
and the packed GN fwd — is 194 GB/s the platform reduce ceiling or GN slack?"""

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


def timeit(fn, *args, n=30):
    out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 48, 128, 96, 128), np.float32), jnp.bfloat16)
    nbytes = x.size * 2

    dt = timeit(jax.jit(lambda a: a * 2), x)
    print(f"copy (r+w)          {dt*1e3:6.2f} ms  {2*nbytes/dt/1e9:6.0f} GB/s", flush=True)
    dt = timeit(jax.jit(lambda a: jnp.sum(a.astype(jnp.float32), axis=(1, 2, 3))), x)
    print(f"single reduce (r)   {dt*1e3:6.2f} ms  {nbytes/dt/1e9:6.0f} GB/s", flush=True)

    def dual(a):
        a32 = a.astype(jnp.float32)
        return jnp.sum(a32, axis=(1, 2, 3)), jnp.sum(a32 * a32, axis=(1, 2, 3))

    dt = timeit(jax.jit(dual), x)
    print(f"dual reduce (r)     {dt*1e3:6.2f} ms  {nbytes/dt/1e9:6.0f} GB/s", flush=True)

    # one-axis-at-a-time staged reduce
    def staged(a):
        a32 = a.astype(jnp.float32)
        s = a32.sum(axis=3).sum(axis=2).sum(axis=1)
        s2 = (a32 * a32).sum(axis=3).sum(axis=2).sum(axis=1)
        return s, s2

    dt = timeit(jax.jit(staged), x)
    print(f"staged dual reduce  {dt*1e3:6.2f} ms  {nbytes/dt/1e9:6.0f} GB/s", flush=True)

    from cips_tpu.models.blocks import GroupNorm

    gmod = GroupNorm(16, 1e-6, packed=True, phases=2)
    gp = gmod.init(jax.random.key(0), x)
    dt = timeit(jax.jit(lambda p, a: gmod.apply(p, a)), gp, x)
    print(f"packed GN fwd       {dt*1e3:6.2f} ms  {3*nbytes/dt/1e9:6.0f} GB/s (of 3-pass min)", flush=True)


if __name__ == "__main__":
    main()
