"""LPIPS (alex, fake-3d) fwd/grad timing + top-op trace at the BMGAN shape.

The +P8 delta in the BMGAN G step measured ~82 ms (probe_bmgan_parts,
round-4 session-4) against a sub-ms FLOP ideal — attribute where it goes
before optimizing.

  python scripts/probe_lpips_trace.py [batch]
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

from cips_tpu.models.perceptual import PerceptualLoss

VOL = (96, 128, 96)
TRACE_DIR = "/tmp/trace_lpips"


def timeit(fn, *args, n=8):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.random((b, *VOL, 1), np.float32), jnp.bfloat16)
    target = jnp.asarray(rng.random((b, *VOL, 1), np.float32), jnp.bfloat16)
    perc = PerceptualLoss(spatial_dims=3, network_type="alex", dtype=jnp.bfloat16)
    params = jax.jit(perc.init)(jax.random.key(0), pred, target)

    fwd = jax.jit(lambda p_, a, t: perc.apply(p_, a, t))
    # grad wrt the GENERATED volume — the path the G backward pays
    grad = jax.jit(jax.grad(lambda a, p_, t: perc.apply(p_, a, t).astype(jnp.float32), argnums=0))
    tf = timeit(fwd, params, pred, target)
    tg = timeit(grad, pred, params, target)
    print(f"lpips fwd  {tf:7.2f} ms")
    print(f"lpips grad {tg:7.2f} ms  (d/dpred, the G-step cost)")

    from trace_util import summarize_trace

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(4):
            out = grad(pred, params, target)
        jax.block_until_ready(out)
    totals = summarize_trace(TRACE_DIR, 4)
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
