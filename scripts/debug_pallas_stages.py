"""Stage-wise debug of the Pallas phase conv (isolate the faulting stage)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

STAGE = int(sys.argv[1]) if len(sys.argv) > 1 else 1


def _kernel(x_hbm, w_ref, out_ref, xh, acc, sem):
    b = pl.program_id(0)
    iz = pl.program_id(1)
    iy = pl.program_id(2)
    _, tz, ty, xdim, pc = out_ref.shape
    c = pc // 8

    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(b, 1), pl.ds(iz * tz, tz + 2), pl.ds(iy * ty, ty + 2)],
        xh,
        sem,
    )
    dma.start()
    dma.wait()

    if STAGE == 1:  # DMA + interior copy out
        out_ref[0] = xh[0, 1 : tz + 1, 1 : ty + 1, 1 : xdim + 1, :]
        return

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, pc), 3)
    phase = lanes // c
    mz = (phase // 4) % 2 == 0
    my = (phase // 2) % 2 == 0
    mx = phase % 2 == 0

    v = xh[0]
    xp_dim = v.shape[2]
    v = jnp.where(mz, v[1 : tz + 2], v[0 : tz + 1])
    v = jnp.where(my, v[:, 1 : ty + 2], v[:, 0 : ty + 1])
    v = jnp.where(mx, pltpu.roll(v, shift=xp_dim - 1, axis=2), v)
    if STAGE == 2:  # shifts only
        out_ref[0] = v[0:tz, 0:ty, 0:xdim, :]
        return

    v1 = pltpu.roll(v, shift=xp_dim - 1, axis=2)
    acc[:] = jnp.zeros_like(acc)
    nk = 1 if STAGE == 3 else 8
    idx = 0
    for kz in range(2):
        for ky in range(2):
            for kx in range(2):
                if idx >= nk:
                    break
                src = v1 if kx else v
                window = src[kz : kz + tz, ky : ky + ty, 0:xdim, :]
                acc[:] += jax.lax.dot_general(
                    window,
                    w_ref[kz, ky, kx],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                idx += 1
    out_ref[0] = acc[:].astype(out_ref.dtype)


def run(x, wp, tz, ty):
    b, z, y, xdim, pc = x.shape
    xpad_dim = -((xdim + 2) // -8) * 8
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, xpad_dim - xdim - 1), (0, 0)))
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, z, y, xdim, pc), x.dtype),
        grid=(b, z // tz, y // ty),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((2, 2, 2, pc, pc), lambda b_, i, j: (0, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tz, ty, xdim, pc), lambda b_, i, j: (b_, i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((1, tz + 2, ty + 2, xpad_dim, pc), x.dtype),
            pltpu.VMEM((tz, ty, xdim, pc), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xpad, wp)


def main():
    rng = np.random.default_rng(0)
    C = 16
    B, Z, Y, X = 1, 8, 16, 8
    x = jnp.asarray(rng.standard_normal((B, Z, Y, X, 8 * C)), jnp.float32)
    wp = jnp.asarray(rng.standard_normal((2, 2, 2, 8 * C, 8 * C)) * 0.1, jnp.float32)
    out = jax.jit(run, static_argnames=("tz", "ty"))(x, wp, tz=4, ty=8)
    got = np.asarray(out)
    print(f"stage {STAGE}: finite={np.isfinite(got).all()} sum={got.sum():.4f}", flush=True)
    if STAGE == 1:
        np.testing.assert_allclose(got, np.asarray(x), atol=1e-6)
        print("stage 1 exact: DMA + copy OK", flush=True)


if __name__ == "__main__":
    main()
