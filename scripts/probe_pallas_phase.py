"""Correctness + timing of the Pallas phase conv on the real TPU."""

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

from cips_tpu.ops.pallas.phase_conv import phase_conv
from cips_tpu.ops.s2d import packed_conv, space_to_depth


def timeit(fn, *args, n=20):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)

    # correctness at moderate shape, fp32 (pc = 8C must be a lane multiple)
    C = 16
    x_full = jnp.asarray(rng.standard_normal((2, 16, 32, 16, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.2, jnp.float32)
    xp = space_to_depth(x_full)
    want = jax.jit(packed_conv)(xp, w)
    got = phase_conv(xp, w, tz=4)
    err = float(jnp.max(jnp.abs(want - got)))
    print(f"correctness fp32: max err {err:.2e}", flush=True)
    assert err < 1e-4, err

    # flagship level-0 shape, bf16
    B, Z, Y, X, C = 8, 48, 64, 48, 16
    x = jnp.asarray(rng.standard_normal((B, Z, Y, X, 8 * C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.1, jnp.float32)
    want = jax.jit(packed_conv)(x, w)
    for tz in (2, 4, 6, 8):
        if Z % tz:
            continue
        try:
            got = phase_conv(x, w, tz=tz)
            err = float(jnp.max(jnp.abs(want.astype(jnp.float32) - got.astype(jnp.float32))))
            t = timeit(lambda a, b: phase_conv(a, b, tz=tz), x, w)
            print(f"tz={tz:2d}: {t*1e3:6.2f} ms   err {err:.3e}", flush=True)
        except Exception as e:
            print(f"tz={tz:2d}: FAILED {str(e)[:140]}", flush=True)

    t_dense = timeit(jax.jit(packed_conv), x, w)
    print(f"XLA dense k3:  {t_dense*1e3:6.2f} ms", flush=True)

    # concat-input case (256 -> 128) and 32-channel case (up_2 upsampler conv2)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 3, 32, 32)) * 0.1, jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((B, Z, Y, X, 256)), jnp.bfloat16)
    want2 = jax.jit(packed_conv)(x2, w2)
    got2 = phase_conv(x2, w2, tz=4)
    err2 = float(jnp.max(jnp.abs(want2.astype(jnp.float32) - got2.astype(jnp.float32))))
    t2 = timeit(lambda a, b: phase_conv(a, b, tz=4), x2, w2)
    t2d = timeit(jax.jit(packed_conv), x2, w2)
    print(f"32ch 256->256: pallas {t2*1e3:6.2f} ms vs dense {t2d*1e3:6.2f} ms  err {err2:.3e}", flush=True)


if __name__ == "__main__":
    main()
