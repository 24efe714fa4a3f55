"""Isolate the Pallas phase-conv cost: matmul structure vs selects vs DMA."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

B, Z, Y, X, PC = 8, 48, 64, 48, 128
MODE = sys.argv[1] if len(sys.argv) > 1 else "dot4d"


def timeit(fn, *args, n=20):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def k_dot4d(x_ref, w_ref, o_ref, acc):
    acc[:] = jnp.zeros_like(acc)
    for k in range(8):
        acc[:] += jax.lax.dot_general(
            x_ref[0], w_ref[k],
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = acc[:].astype(o_ref.dtype)


def k_dot2d(x_ref, w_ref, o_ref, acc):
    _, tz, ty, xdim, pc = x_ref.shape
    m = tz * ty * xdim
    flat = x_ref[0].reshape(m, pc)
    acc[:] = jnp.zeros_like(acc)
    for k in range(8):
        acc[:] += jnp.dot(flat, w_ref[k], preferred_element_type=jnp.float32)
    o_ref[0] = acc[:].astype(o_ref.dtype).reshape(tz, ty, xdim, pc)


def k_sel(x_ref, w_ref, o_ref, acc):
    """selects only (datapath cost without matmuls)."""
    _, tz, ty, xdim, pc = x_ref.shape
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, pc), 3)
    m1 = lanes % 2 == 0
    v = x_ref[0]
    v = jnp.where(m1, v, v * 2.0)
    v = jnp.where(m1, v, v * 0.5)
    v = jnp.where(m1, v, v * 3.0)
    o_ref[0] = v.astype(o_ref.dtype)


def run(mode, tz, ty):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, Z, Y, X, PC)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((8, PC, PC)) * 0.1, jnp.bfloat16)
    kern = {"dot4d": k_dot4d, "dot2d": k_dot2d, "sel": k_sel}[mode]
    scratch = [pltpu.VMEM((tz * ty * X, PC) if mode == "dot2d" else (tz, ty, X, PC), jnp.float32)]

    @jax.jit
    def f(x, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, Z, Y, X, PC), x.dtype),
            grid=(B, Z // tz, Y // ty),
            in_specs=[
                pl.BlockSpec((1, tz, ty, X, PC), lambda b, i, j: (b, i, j, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, PC, PC), lambda b, i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, tz, ty, X, PC), lambda b, i, j: (b, i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(x, w)

    t = timeit(f, x, w)
    flops = 2 * 8 * B * Z * Y * X * PC * PC
    print(f"{mode} tz={tz} ty={ty}: {t*1e3:6.2f} ms  ({flops/t/1e12:5.1f} TFLOP/s)", flush=True)


if __name__ == "__main__":
    for tz, ty in [(8, 16), (12, 16), (8, 32)]:
        run(MODE, tz, ty)
