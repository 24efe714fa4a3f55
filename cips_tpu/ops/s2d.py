"""Space-to-depth (packed) level-0 arithmetic — exact, TPU-layout-optimal.

Motivation (BENCH_NOTES.md profiling): the UNet's finest level runs 3-D
convs with 16 output channels; on TPU the 128-lane MXU/VPU then works at
1/8 occupancy and XLA pads level-0 buffers 8x. Packing 2x2x2 voxel cells
into channels turns every level-0 tensor into a 128-channel half-resolution
tensor — full lanes, no padding — while computing *exactly* the same
function with *exactly* the same parameters:

  * conv k3 s1 on the full grid == conv k3 s1 on the packed grid whose
    (8*Cin, 8*Cout) kernel is a fixed scatter of the original
    (Cin, Cout) kernel (`pack_conv_kernel`);
  * GroupNorm over channels == GroupNorm with the phase axis treated as
    spatial (`packed_group_norm_reshape`);
  * 2x average-pool == mean over the 8 phases (`phase_mean`) — pooling
    windows coincide with packing cells;
  * nearest 2x upsample == tiling over phases (`phase_tile`);
  * elementwise ops are positionwise in either representation.

Packing order: phase-major channels, p = az*4 + ay*2 + ax, packed channel
index = p*C + c. Measured on v5e: the packed conv runs 1.35x FASTER than
the full-res original despite doing 8x the MACs (scripts/probe_s2d_conv.py).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PHASES = 8  # 2x2x2


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, 2Z, 2Y, 2X, C) -> (B, Z, Y, X, 8C), phase-major channels."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, d // 2, h // 2, w // 2, PHASES * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """(B, Z, Y, X, 8C) -> (B, 2Z, 2Y, 2X, C)."""
    b, z, y, w, pc = x.shape
    c = pc // PHASES
    x = x.reshape(b, z, y, w, 2, 2, 2, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, 2 * z, 2 * y, 2 * w, c)


def phase_mean(x: jax.Array) -> jax.Array:
    """Packed (B,Z,Y,X,8C) -> (B,Z,Y,X,C): mean over phases
    (== avg_pool 2x2x2 stride 2 on the full grid)."""
    b, z, y, w, pc = x.shape
    c = pc // PHASES
    return x.reshape(b, z, y, w, PHASES, c).mean(axis=4)


def phase_tile(x: jax.Array) -> jax.Array:
    """(B,Z,Y,X,C) -> packed (B,Z,Y,X,8C): every phase identical
    (== nearest 2x upsample on the full grid)."""
    return jnp.tile(x, (1,) * (x.ndim - 1) + (PHASES,))


@lru_cache(maxsize=None)
def _scatter_indices(k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static index maps for pack_conv_kernel: for each (output phase,
    kernel offset) where does the original tap land in the packed kernel.

    Returns (dst, src): dst columns are (Kz, Ky, Kx, q_phase, p_phase);
    src columns are (dz, dy, dx) of the original kernel. k in {1, 3}.
    """
    assert k in (1, 3)
    dst, src = [], []
    phases = [(a, b, c) for a in range(2) for b in range(2) for c in range(2)]
    for pi, (a, b, c) in enumerate(phases):
        for dz in range(k):
            for dy in range(k):
                for dx in range(k):
                    off = [dz - (k // 2), dy - (k // 2), dx - (k // 2)]
                    ts = [a + off[0], b + off[1], c + off[2]]
                    qs = [t % 2 for t in ts]
                    ks = [(t - q) // 2 for t, q in zip(ts, qs)]
                    qi = qs[0] * 4 + qs[1] * 2 + qs[2]
                    # packed kernel is k=3 for k=3 (cells -1..1), k=1 for k=1
                    kk = 1 if k == 3 else 0
                    dst.append((ks[0] + kk, ks[1] + kk, ks[2] + kk, qi, pi))
                    src.append((dz, dy, dx))
    return np.asarray(dst, np.int32), np.asarray(src, np.int32)


def pack_conv_kernel(w: jax.Array) -> jax.Array:
    """(k,k,k,Cin,Cout) -> (k,k,k,8Cin,8Cout) packed-domain kernel.

    conv(full_grid_x, w) == depth_to_space(conv(space_to_depth(x), W)).
    Differentiable scatter of the original weights (parameters unchanged).
    """
    k, _, _, cin, cout = w.shape
    dst, src = _scatter_indices(k)
    kk = 3 if k == 3 else 1
    big = jnp.zeros((kk, kk, kk, PHASES * cin, PHASES * cout), w.dtype)

    # advanced-index scatter: one (Cin, Cout) block per mapping row
    taps = w[src[:, 0], src[:, 1], src[:, 2]]  # (n, Cin, Cout)
    ci = np.arange(cin)
    co = np.arange(cout)
    n = dst.shape[0]
    kz = np.repeat(dst[:, 0], cin * cout)
    ky = np.repeat(dst[:, 1], cin * cout)
    kx = np.repeat(dst[:, 2], cin * cout)
    qin = np.repeat(dst[:, 3] * cin, cin * cout) + np.tile(np.repeat(ci, cout), n)
    pout = np.repeat(dst[:, 4] * cout, cin * cout) + np.tile(np.tile(co, cin), n)
    return big.at[kz, ky, kx, qin, pout].set(taps.reshape(-1))


def packed_conv(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
    """Convolution in the packed domain with an original-parameter kernel."""
    assert stride == 1, "packed domain only hosts stride-1 convs"
    wp = pack_conv_kernel(w.astype(x.dtype))
    k = wp.shape[0]
    pad = (k - 1) // 2
    # MXU accumulates bf16 products in fp32 internally; matching operand
    # dtypes keeps the custom-VJP/transpose path dtype-consistent.
    return jax.lax.conv_general_dilated(
        x,
        wp,
        (1, 1, 1),
        [(pad, pad)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
