"""Pallas phase-structured packed convolution (TPU).

The space-to-depth packed conv (ops/s2d.py) runs under XLA as a dense k-3
conv over a 1/8-dense scattered kernel — ~63% MXU utilisation but 8x the
mathematical MACs. The phase-structured formulation needs only 2.37x
(a k-2 window over per-phase-group shifted inputs), but in XLA the shift
relayout dominates. This kernel fuses the shift inside VMEM:

  out[c, p*C+co] = sum_{k in {0,1}^3}  x'[c+k] @ Wp[k]
  x'[i][q*C+c]   = x[i - q][q*C+c]     (zero outside the volume)

with Wp = pack_conv_kernel_phase(w): (2,2,2,8C,8C), 27/64 dense — executed
densely, giving 8*(8C)^2 MACs per cell = 2.37x the mathematical count.

Mosaic constraints shape the implementation:
  * the 128-lane dim cannot be sliced at channel-block granularity, so the
    per-phase-group shift is ONE full-register select per axis (the shift
    amount along axis a is the lane's q_a bit);
  * the x (sublane) dim cannot be sliced/rolled either (16-bit data packs
    x-pairs into 32-bit words), so the kernel DMAs THREE x-offset copies of
    the halo tile and x-shifts become buffer choices;
  * z/y are untiled dims — ordinary slices.

Per grid step (one (TZ, TY, X) output tile):
  1. DMA the haloed tile at x-offsets 0/1/2,
  2. build the two x-window variants of x' with 3 selects each,
  3. accumulate 8 dot_generals ((TZ,TY,X,8C) . (8C,8C)) in fp32,
  4. write the output tile.

The input is zero-padded (1 voxel halo) in XLA beforehand so DMA reads
never leave the array.

Backward: dX is the SAME kernel with the adjoint weights (the packed form
of the full-resolution conv transpose: spatially flipped, in/out swapped);
dW falls back to XLA's correlation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cips_tpu.ops.s2d import PHASES, pack_conv_kernel_phase


def _kernel(x0_hbm, x1_hbm, x2_hbm, w_ref, out_ref, xh0, xh1, xh2, xp0, xp1, acc, sem):
    b = pl.program_id(0)
    iz = pl.program_id(1)
    _, tz, ydim, xdim, pc = out_ref.shape
    c = pc // PHASES

    # 1. haloed z-slab from the three x-shift variants (x shifts become
    #    buffer choices — neither VMEM slicing nor DMA offsets may break the
    #    sublane tiling, so the shifts are materialised HBM-side). Full-Y
    #    slabs keep each DMA to tz+2 large contiguous rows.
    bufs = (xh0, xh1, xh2)
    dmas = []
    for src, buf in zip((x0_hbm, x1_hbm, x2_hbm), bufs):
        dma = pltpu.make_async_copy(
            src.at[pl.ds(b, 1), pl.ds(iz * tz, tz + 2)],
            buf,
            sem.at[len(dmas)],
        )
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()

    # 2. lane masks: lane l holds phase p = l // C with bits (qz, qy, qx);
    #    group q shifts by (1 - q) per axis.
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, pc), 3)
    phase = lanes // c
    mz = (phase // 4) % 2 == 0
    my = (phase // 2) % 2 == 0
    mx = phase % 2 == 0

    # x-window variants of x', staged through VMEM so the matmul windows
    # are memref slices (z/y are untiled dims) rather than register shuffles
    for kx, xp in enumerate((xp0, xp1)):
        t = jnp.where(mx, bufs[kx + 1][0], bufs[kx][0])  # (tz+2, Y+2, X, pc)
        t = jnp.where(mz, t[1 : tz + 2], t[0 : tz + 1])  # (tz+1, Y+2, X, pc)
        t = jnp.where(my, t[:, 1 : ydim + 2], t[:, 0 : ydim + 1])  # (tz+1, Y+1, X, pc)
        xp[:] = t

    # 3. eight accumulating MXU contractions over the k-2 window
    acc[:] = jnp.zeros_like(acc)
    for kz in range(2):
        for ky in range(2):
            for kx in range(2):
                xp = xp1 if kx else xp0
                window = xp[kz : kz + tz, ky : ky + ydim]
                acc[:] += jax.lax.dot_general(
                    window,
                    w_ref[kz, ky, kx],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    # 4. store
    out_ref[0] = acc[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tz",))
def phase_conv_apply(x: jax.Array, wp: jax.Array, tz: int = 4) -> jax.Array:
    """Apply the phase-structured conv given the (2,2,2,8C,8C) phase kernel.

    x: (B, Z, Y, X, 8C) packed input. Returns (B, Z, Y, X, 8C).
    Tiles are full-(Y, X) z-slabs so each halo DMA is tz+2 contiguous rows.
    """
    b, z, y, xdim, pc = x.shape
    assert z % tz == 0, (z, tz)
    assert pc % 128 == 0, "phase_conv needs a lane-multiple packed channel count"
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    assert xdim % sub == 0, f"x dim must be a multiple of the sublane tile ({sub})"
    # halo pad, then materialise the three x-shift variants (aligned DMAs)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    x0 = xpad[:, :, :, 0:xdim, :]
    x1 = xpad[:, :, :, 1 : 1 + xdim, :]
    x2 = xpad[:, :, :, 2 : 2 + xdim, :]

    grid = (b, z // tz)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, z, y, xdim, pc), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # manually DMA'd halo slabs
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (2, 2, 2, pc, pc), lambda b_, i: (0, 0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tz, y, xdim, pc), lambda b_, i: (b_, i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((1, tz + 2, y + 2, xdim, pc), x.dtype),
            pltpu.VMEM((1, tz + 2, y + 2, xdim, pc), x.dtype),
            pltpu.VMEM((1, tz + 2, y + 2, xdim, pc), x.dtype),
            pltpu.VMEM((tz + 1, y + 1, xdim, pc), x.dtype),
            pltpu.VMEM((tz + 1, y + 1, xdim, pc), x.dtype),
            pltpu.VMEM((tz, y, xdim, pc), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * b * z * y * xdim * pc * pc,
            bytes_accessed=4 * b * z * y * xdim * pc * 2,
            transcendentals=0,
        ),
    )(x0, x1, x2, wp)


def phase_conv(x: jax.Array, w: jax.Array, tz: int = 4) -> jax.Array:
    """Exact packed conv (== ops.s2d.packed_conv with f=(2,2,2)) as a fused
    Pallas kernel. w: original (3,3,3,Cin,Cout); x: (B,Z,Y,X,8*Cin)."""
    wp = pack_conv_kernel_phase(w.astype(x.dtype))
    return phase_conv_apply(x, wp, tz=tz)
