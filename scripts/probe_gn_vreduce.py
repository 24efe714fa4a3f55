"""Tiny compile+run probe for the variadic-reduce GroupNorm (fwd+bwd).

Guards against a pathological XLA compile path for the two-operand
lax.reduce before it is trusted inside the 15-minute flagship compile.

  python scripts/probe_gn_vreduce.py [B C]
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

from cips_tpu.models.blocks import GroupNorm


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    shape = (b, 24, 32, 24, c)
    gn = GroupNorm(num_groups=16, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)
    params = gn.init(jax.random.key(0), x)

    def loss(p, x):
        return jnp.sum(gn.apply(p, x).astype(jnp.float32))

    step = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t0 = time.perf_counter()
    g = step(params, x)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), g)
    # tunnel gotcha: force a scalar fetch to really wait
    print("first-call (compile+run)", round(time.perf_counter() - t0, 2), "s",
          float(jnp.sum(g[1].astype(jnp.float32))), flush=True)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        g = step(params, x)
    print("fetch", float(jnp.sum(g[1].astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / n
    print(f"steady {dt*1e3:.2f} ms per fwd+bwd at {shape}", flush=True)


if __name__ == "__main__":
    main()
