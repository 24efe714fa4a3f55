"""Bisect the slab phase-conv kernel: which stage costs 60ms?

MODE=nosel : DMA + 8 window dots straight off the halo buffer (no selects)
MODE=sel   : DMA + x' assembly (selects + stores), single copy out, no dots
MODE=full  : the real kernel
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

MODE = sys.argv[1] if len(sys.argv) > 1 else "nosel"
B, Z, Y, X, PC = 8, 48, 64, 48, 128
TZ = 8


def _kernel(x0_hbm, x1_hbm, x2_hbm, w_ref, out_ref, xh0, xh1, xh2, xp0, xp1, acc, sem):
    b = pl.program_id(0)
    iz = pl.program_id(1)
    _, tz, ydim, xdim, pc = out_ref.shape
    c = pc // 8

    bufs = (xh0, xh1, xh2)
    dmas = []
    for src, buf in zip((x0_hbm, x1_hbm, x2_hbm), bufs):
        dma = pltpu.make_async_copy(
            src.at[pl.ds(b, 1), pl.ds(iz * tz, tz + 2)], buf, sem.at[len(dmas)]
        )
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()

    if MODE == "nosel":
        acc[:] = jnp.zeros_like(acc)
        for kz in range(2):
            for ky in range(2):
                for kx in range(2):
                    window = bufs[kx][0][kz : kz + tz, ky : ky + ydim]
                    acc[:] += jax.lax.dot_general(
                        window, w_ref[kz, ky, kx],
                        dimension_numbers=(((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
        out_ref[0] = acc[:].astype(out_ref.dtype)
        return

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, pc), 3)
    phase = lanes // c
    mz = (phase // 4) % 2 == 0
    my = (phase // 2) % 2 == 0
    mx = phase % 2 == 0
    for kx, xp in enumerate((xp0, xp1)):
        t = jnp.where(mx, bufs[kx + 1][0], bufs[kx][0])
        t = jnp.where(mz, t[1 : tz + 2], t[0 : tz + 1])
        t = jnp.where(my, t[:, 1 : ydim + 2], t[:, 0 : ydim + 1])
        xp[:] = t
    if MODE == "sel":
        out_ref[0] = xp0[0:tz, 0:ydim]
        return

    acc[:] = jnp.zeros_like(acc)
    for kz in range(2):
        for ky in range(2):
            for kx in range(2):
                xp = xp1 if kx else xp0
                window = xp[kz : kz + tz, ky : ky + ydim]
                acc[:] += jax.lax.dot_general(
                    window, w_ref[kz, ky, kx],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    out_ref[0] = acc[:].astype(out_ref.dtype)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, Z, Y, X, PC)), jnp.bfloat16)
    wp = jnp.asarray(rng.standard_normal((2, 2, 2, PC, PC)) * 0.1, jnp.bfloat16)

    @jax.jit
    def f(x, wp):
        xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        x0 = xpad[:, :, :, 0:X, :]
        x1 = xpad[:, :, :, 1 : 1 + X, :]
        x2 = xpad[:, :, :, 2 : 2 + X, :]
        return pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((B, Z, Y, X, PC), x.dtype),
            grid=(B, Z // TZ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((2, 2, 2, PC, PC), lambda b, i: (0, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, TZ, Y, X, PC), lambda b, i: (b, i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((1, TZ + 2, Y + 2, X, PC), x.dtype),
                pltpu.VMEM((1, TZ + 2, Y + 2, X, PC), x.dtype),
                pltpu.VMEM((1, TZ + 2, Y + 2, X, PC), x.dtype),
                pltpu.VMEM((TZ + 1, Y + 1, X, PC), x.dtype),
                pltpu.VMEM((TZ + 1, Y + 1, X, PC), x.dtype),
                pltpu.VMEM((TZ, Y, X, PC), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=112 * 1024 * 1024),
        )(x0, x1, x2, wp)

    out = f(x, wp)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(x, wp)
    float(jnp.sum(out.astype(jnp.float32)))
    t = (time.perf_counter() - t0) / 20
    print(f"{MODE}: {t*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
