"""Space-to-depth (packed) arithmetic — exact, TPU-layout-optimal.

Motivation (BENCH_NOTES.md profiling): the UNet's fine levels run 3-D convs
with 16-32 channels; on TPU the 128-lane MXU/VPU then works at 1/8-1/4
occupancy and XLA pads the activations up to 8x in HBM (measured 4x at
C=32). Packing spatial cells into channels turns those tensors into
128-channel reduced-resolution tensors — full lanes, no padding — while
computing *exactly* the same function with *exactly* the same parameters:

  * conv k3 s1 on the full grid == conv k3 s1 on the packed grid whose
    (P*Cin, P*Cout) kernel is a fixed scatter of the original (Cin, Cout)
    kernel (`pack_conv_kernel`);
  * GroupNorm over channels == GroupNorm with the phase axis treated as
    spatial (blocks.GroupNorm packed=True);
  * 2x average-pool / nearest-upsample and the transitions between levels
    packed with DIFFERENT factors are compositions of the (de)packing
    reshapes with the full-grid op (`repack_pool`, `repack_tile`);
  * elementwise ops are positionwise in either representation.

Packing is **anisotropic**: per-axis factors f = (fz, fy, fx), each 1 or 2,
P = fz*fy*fx phases. Choose f per level so C*P == 128 exactly:
level 0 (C=16) -> (2,2,2); level 1 (C=32) -> (2,2,1). Phase-major channel
order: packed channel index = p*C + c with p = (az*fy + ay)*fx + ax.

The packed conv runs as a DENSE k-3 conv over the scattered kernel: it
issues P-times the mathematical MACs, but the MXU executes it at ~63%
utilisation (measured, v5e) — faster than every sparsity-exploiting
XLA-level formulation tried (see `packed_conv_phase`), and P-times-denser
activations also cut HBM traffic and footprint.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Factors = Tuple[int, int, int]
F8: Factors = (2, 2, 2)
PHASES = 8  # phase count of the default (2,2,2) packing


def phase_count(f: Optional[Factors]) -> int:
    return 1 if f is None else f[0] * f[1] * f[2]


def auto_factor(channels: int) -> Optional[Factors]:
    """The largest packing whose phase count keeps ``channels`` within the
    128-lane register width: C<=16 -> (2,2,2), 32 -> (2,2,1), 64 -> (2,1,1),
    >64 -> None (packing cannot help)."""
    for p, f in ((8, (2, 2, 2)), (4, (2, 2, 1)), (2, (2, 1, 1))):
        if channels * p <= 128:
            return f
    return None


def _s2d_reshape(x: jax.Array, f: Factors = F8) -> jax.Array:
    b, d, h, w, c = x.shape
    fz, fy, fx = f
    x = x.reshape(b, d // fz, fz, h // fy, fy, w // fx, fx, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, d // fz, h // fy, w // fx, phase_count(f) * c)


def _d2s_reshape(x: jax.Array, f: Factors = F8) -> jax.Array:
    b, z, y, w, pc = x.shape
    fz, fy, fx = f
    c = pc // phase_count(f)
    x = x.reshape(b, z, y, w, fz, fy, fx, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, fz * z, fy * y, fx * w, c)


@lru_cache(maxsize=None)
def _s2d_onehot_kernel(f: Factors, c: int) -> np.ndarray:
    """(fz,fy,fx,C,P*C) one-hot kernel: a VALID stride-f conv with it IS
    space_to_depth (phase-major channel order p*C + c)."""
    fz, fy, fx = f
    k = np.zeros((fz, fy, fx, c, phase_count(f) * c), np.float32)
    for az in range(fz):
        for ay in range(fy):
            for ax in range(fx):
                p = (az * fy + ay) * fx + ax
                for ci in range(c):
                    k[az, ay, ax, ci, p * c + ci] = 1.0
    return k


_DN3D = ("NDHWC", "DHWIO", "NDHWC")


def _s2d_conv(x: jax.Array, f: Factors = F8) -> jax.Array:
    """space_to_depth as a one-hot strided conv: the phase relayout stays
    inside one conv lowering, so XLA never materialises the 6-D transpose
    intermediate (measured 8x-padded, 288 MB for a 36 MB stem input when
    rematerialised — the marginal allocation of the L0+L1 batch-16 OOM)."""
    k = jnp.asarray(_s2d_onehot_kernel(f, x.shape[-1]), x.dtype)
    # HIGHEST: DEFAULT precision rounds f32 operands to bf16 on the MXU
    # path; with a 0/1 kernel and one term per output, HIGHEST is bit-exact
    # in every dtype (bf16 operands are selected, not computed).
    return jax.lax.conv_general_dilated(
        x, k, window_strides=f, padding="VALID", dimension_numbers=_DN3D,
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=x.dtype,
    )


def _d2s_conv(x: jax.Array, f: Factors = F8) -> jax.Array:
    """Inverse of _s2d_conv: the transposed conv with the SAME one-hot
    kernel — the adjoint of a permutation is its inverse, and each output
    element is a single 0/1-weighted term, so it is exact in any dtype."""
    c = x.shape[-1] // phase_count(f)
    k = jnp.asarray(_s2d_onehot_kernel(f, c), x.dtype)
    return jax.lax.conv_transpose(
        x, k, strides=f, padding="VALID", dimension_numbers=_DN3D,
        transpose_kernel=True, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=x.dtype,
    )


def space_to_depth(x: jax.Array, f: Factors = F8) -> jax.Array:
    """(B, fz*Z, fy*Y, fx*X, C) -> (B, Z, Y, X, P*C), phase-major channels."""
    if _S2D_IMPL == "conv" and x.ndim == 5 and jnp.issubdtype(x.dtype, jnp.floating):
        return _s2d_conv(x, f)
    return _s2d_reshape(x, f)


def depth_to_space(x: jax.Array, f: Factors = F8) -> jax.Array:
    """(B, Z, Y, X, P*C) -> (B, fz*Z, fy*Y, fx*X, C)."""
    if _S2D_IMPL == "conv" and x.ndim == 5 and jnp.issubdtype(x.dtype, jnp.floating):
        return _d2s_conv(x, f)
    return _d2s_reshape(x, f)


def phase_mean(x: jax.Array, f: Factors = F8) -> jax.Array:
    """Packed (B,Z,Y,X,P*C) -> (B,Z,Y,X,C): mean over phases
    (== avg_pool with window f on the full grid)."""
    b, z, y, w, pc = x.shape
    p = phase_count(f)
    return x.reshape(b, z, y, w, p, pc // p).mean(axis=4)


def phase_tile(x: jax.Array, f: Factors = F8) -> jax.Array:
    """(B,Z,Y,X,C) -> packed (B,Z,Y,X,P*C): every phase identical
    (== nearest upsample by f on the full grid)."""
    return jnp.tile(x, (1,) * (x.ndim - 1) + (phase_count(f),))


def _pool2(x: jax.Array) -> jax.Array:
    """2x average pool over all spatial axes of (B, *S, C); rank-generic so
    the unpacked (f_in is None) path serves 2-D models too.

    Reshape + mean (not reduce_window) so the op linearises cleanly inside
    jax.checkpoint policies."""
    b, *spatial, c = x.shape
    shape = [b]
    for s in spatial:
        shape += [s // 2, 2]
    x = x.reshape(*shape, c)
    return x.mean(axis=tuple(range(2, 2 * len(spatial) + 1, 2)))


def _tile2(x: jax.Array) -> jax.Array:
    """Nearest 2x upsample over all spatial axes (broadcast + reshape)."""
    b, *spatial, c = x.shape
    idx: list = [slice(None)]
    target = [b]
    for s in spatial:
        idx += [slice(None), None]
        target += [s, 2]
    idx.append(slice(None))
    target.append(c)
    x = jnp.broadcast_to(x[tuple(idx)], tuple(target))
    return x.reshape(b, *(2 * s for s in spatial), c)


def repack_pool_compact(x: jax.Array, f_in: Factors) -> jax.Array:
    """2x average-pool of the full grid, consuming the f_in-packed input and
    producing the UNPACKED pooled (half-res) tensor WITHOUT materialising the
    full grid.

    Per axis with full coordinate fz*i + a: when fz == 2 the pool window
    {2j, 2j+1} is exactly cell j's phase pair -> mean over the phase axis;
    when fz == 1 the window is the adjacent cell pair {2j, 2j+1} -> pairwise
    spatial mean. Exact == _pool2(depth_to_space(x, f_in)); the full-grid
    temporary (e.g. 2x the packed bytes at (2,2,2), the dominant allocation
    of the old repack_pool on packed->packed down transitions) never exists."""
    b, z, y, w, pc = x.shape
    p = phase_count(f_in)
    c = pc // p
    fz, fy, fx = f_in
    v = x.reshape(b, z, y, w, fz, fy, fx, c)
    phase_axes = tuple(ax for ax, ff in zip((4, 5, 6), f_in) if ff == 2)
    if phase_axes:
        v = v.mean(axis=phase_axes, keepdims=True)
    v = v.reshape(b, z, y, w, c)
    shape: list = [b]
    red = []
    for s, ff in zip((z, y, w), f_in):
        if ff == 1:
            shape += [s // 2, 2]
            red.append(len(shape) - 1)
        else:
            shape.append(s)
    shape.append(c)
    if red:
        v = v.reshape(*shape).mean(axis=tuple(red))
    return v


def repack_pool(x: jax.Array, f_in: Optional[Factors], f_out: Optional[Factors]) -> jax.Array:
    """2x average-pool a level-i tensor (packing f_in) into the level-(i+1)
    domain (packing f_out). Exact == avg_pool_2x on the full grids."""
    if f_in == F8 and f_out is None:
        return phase_mean(x)  # fast path: pooling windows == packing cells
    if f_in is not None:
        # compact path: pool in the packed domain (phase means + pairwise
        # cell means), never touching the full grid
        pooled = repack_pool_compact(x, f_in)
        return space_to_depth(pooled, f_out) if f_out else pooled
    pooled = _pool2(x)
    return space_to_depth(pooled, f_out) if f_out else pooled


def repack_tile(x: jax.Array, f_in: Optional[Factors], f_out: Optional[Factors]) -> jax.Array:
    """Nearest-2x-upsample a level-i tensor (packing f_in) into the
    level-(i-1) domain (packing f_out)."""
    if f_in is None and f_out == F8:
        return phase_tile(x)  # fast path: tiling cells == packing cells
    if f_out is not None:
        return phase_tile(repack_tile_compact(x, f_in, f_out), f_out)
    full = depth_to_space(x, f_in) if f_in else x
    return _tile2(full)


def _tile_axes(x: jax.Array, t: Tuple[int, int, int]) -> jax.Array:
    """Nearest upsample of (B,Z,Y,X,C) by per-axis integer factors t
    (broadcast + reshape, no gather)."""
    b, z, y, w, c = x.shape
    tz, ty, tx = t
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :, None, :], (b, z, tz, y, ty, w, tx, c)
    )
    return x.reshape(b, z * tz, y * ty, w * tx, c)


def repack_tile_compact(
    x: jax.Array, f_in: Optional[Factors], f_out: Factors
) -> jax.Array:
    """The compact pre-tile of a packed nearest-2x upsample.

    Returns UNPACKED u on the f_out cell grid with
      repack_tile(x, f_in, f_out) == phase_tile(u, f_out),
    so a `packed_conv_tiled` over u replaces the conv over the full tile
    (prod(f_out)-times fewer MACs, and the (…, P*C) tile temporary never
    exists). Derivation: per axis, output cell i / phase a sits at full
    coordinate f_out*i + a, and the x2-upsample reads full_in[(f_out*i+a)//2]
    — independent of a for f_out∈{1,2}, equal to full_in[i] when f_out==2
    and full_in[i//2] (a 2x tile of full_in) when f_out==1. Generalises the
    fold-tile trick to packed->packed up transitions (L0+L1 flagship
    packing, causal s2d_levels=all decoders)."""
    full = depth_to_space(x, f_in) if f_in else x
    t = tuple(2 // fo for fo in f_out)
    if t == (1, 1, 1):
        return full
    return _tile_axes(full, t)


@lru_cache(maxsize=None)
def _scatter_indices(k: int, f: Factors = F8) -> Tuple[np.ndarray, np.ndarray]:
    """Static index maps for pack_conv_kernel: for each (output phase,
    kernel offset) where does the original tap land in the packed kernel.

    Returns (dst, src): dst columns are (Kz, Ky, Kx, q_phase, p_phase);
    src columns are (dz, dy, dx) of the original kernel. k in {1, 3}.
    Packed-kernel support stays k (cells -1..1 for k=3) on every axis,
    whether that axis is packed (factor 2) or not (factor 1).
    """
    assert k in (1, 3)
    dst, src = [], []
    fz, fy, fx = f
    phases = [(a, b, c) for a in range(fz) for b in range(fy) for c in range(fx)]
    for pi, ph in enumerate(phases):
        for dz in range(k):
            for dy in range(k):
                for dx in range(k):
                    off = [dz - (k // 2), dy - (k // 2), dx - (k // 2)]
                    ts = [a + o for a, o in zip(ph, off)]
                    qs = [t % ff for t, ff in zip(ts, f)]
                    ks = [(t - q) // ff for t, q, ff in zip(ts, qs, f)]
                    qi = (qs[0] * fy + qs[1]) * fx + qs[2]
                    kk = 1 if k == 3 else 0
                    dst.append((ks[0] + kk, ks[1] + kk, ks[2] + kk, qi, pi))
                    src.append((dz, dy, dx))
    return np.asarray(dst, np.int32), np.asarray(src, np.int32)


@lru_cache(maxsize=None)
def _scatter_onehot(k: int, f: Factors) -> np.ndarray:
    """0/1 placement matrix M of shape (KK^3 * P * P, k^3):
    M[(kt, q, p), s] = 1 iff original tap s lands at packed kernel position
    kt for the (input phase q -> output phase p) block. Each row has at most
    a single 1, so contracting with it is an exact selection."""
    dst, src = _scatter_indices(k, f)
    p = phase_count(f)
    kk = 3 if k == 3 else 1
    m = np.zeros((kk * kk * kk * p * p, k * k * k), np.float32)
    for (kz, ky, kx, qi, pi), (dz, dy, dx) in zip(dst, src):
        m[((kz * kk + ky) * kk + kx) * p * p + qi * p + pi, (dz * k + dy) * k + dx] = 1.0
    return m


def pack_conv_kernel(w: jax.Array, f: Factors = F8) -> jax.Array:
    """(k,k,k,Cin,Cout) -> (k,k,k,P*Cin,P*Cout) packed-domain kernel.

    conv(full_grid_x, w) == depth_to_space(conv(space_to_depth(x, f), W), f).
    The placement runs as a static one-hot contraction (tiny MXU dot + small
    transpose) rather than an element-indexed scatter: the scatter compiled
    to per-element gathers with u32 index arrays costing *milliseconds per
    step per conv* on TPU (measured — the BMGAN step carried ~27 ms/step of
    such gather fusions). One-hot selection is exact in any dtype; the
    transpose (einsum cotangent) is the wgrad's inverse placement."""
    k, _, _, cin, cout = w.shape
    p = phase_count(f)
    kk = 3 if k == 3 else 1
    m = jnp.asarray(_scatter_onehot(k, f), w.dtype)
    big = (m @ w.reshape(k * k * k, cin * cout)).reshape(kk, kk, kk, p, p, cin, cout)
    big = big.transpose(0, 1, 2, 3, 5, 4, 6)  # (..., q, Cin, p, Cout)
    return big.reshape(kk, kk, kk, p * cin, p * cout)


def packed_conv_dense(x: jax.Array, w: jax.Array, f: Factors = F8) -> jax.Array:
    """Packed conv as a dense conv over the scattered (P*Cin, P*Cout) kernel.

    Issues P-times the mathematical MACs (the scattered kernel is 1/P dense
    and the MXU cannot exploit the sparsity) but runs at ~63% MXU
    utilisation (measured, v5e) — the production path."""
    wp = pack_conv_kernel(w.astype(x.dtype), f)
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


@lru_cache(maxsize=None)
def _phase_kernel_indices() -> Tuple[np.ndarray, np.ndarray]:
    """Static index maps for `pack_conv_kernel_phase` (k=3, (2,2,2) packing).

    In the phase-shifted representation (see `_phase_shift_input`) the packed
    conv becomes ONE dense VALID k-2 conv. Per axis, a tap of the original
    kernel at offset d feeding output phase p from input phase q lands at
    k-2 position ``k`` with d = 2k - p + 1 - q; taps with d outside [0, 2]
    do not exist (stay zero). 216 of the 512 (k, q, p) axis-triples are
    live — 27 original taps x 8 output phases.
    """
    dst, src = [], []
    axes = [(k, q, p) for k in range(2) for q in range(2) for p in range(2)]
    for kz, qz, pz in axes:
        dz = 2 * kz - pz + 1 - qz
        if not 0 <= dz <= 2:
            continue
        for ky, qy, py in axes:
            dy = 2 * ky - py + 1 - qy
            if not 0 <= dy <= 2:
                continue
            for kx, qx, px in axes:
                dx = 2 * kx - px + 1 - qx
                if not 0 <= dx <= 2:
                    continue
                qi = qz * 4 + qy * 2 + qx
                pi = pz * 4 + py * 2 + px
                dst.append((kz, ky, kx, qi, pi))
                src.append((dz, dy, dx))
    return np.asarray(dst, np.int32), np.asarray(src, np.int32)


def pack_conv_kernel_phase(w: jax.Array) -> jax.Array:
    """(3,3,3,Cin,Cout) -> (2,2,2,8Cin,8Cout) phase-structured kernel.

    Combined with `_phase_shift_input`, a VALID k-2 conv computes the exact
    packed conv with 2.37x the mathematical MACs instead of 8x."""
    k, _, _, cin, cout = w.shape
    assert k == 3
    dst, src = _phase_kernel_indices()
    m = np.zeros((2 * 2 * 2 * PHASES * PHASES, k * k * k), np.float32)
    for (kz, ky, kx, qi, pi), (dz, dy, dx) in zip(dst, src):
        m[((kz * 2 + ky) * 2 + kx) * PHASES * PHASES + qi * PHASES + pi, (dz * k + dy) * k + dx] = 1.0
    big = (jnp.asarray(m, w.dtype) @ w.reshape(k * k * k, cin * cout)).reshape(
        2, 2, 2, PHASES, PHASES, cin, cout
    )
    return big.transpose(0, 1, 2, 3, 5, 4, 6).reshape(2, 2, 2, PHASES * cin, PHASES * cout)


def _phase_shift_input(x: jax.Array) -> jax.Array:
    """(B,Z,Y,X,8C) -> (B,Z+1,Y+1,X+1,8C): shift phase group q by q per axis.

    Input phase q per axis reaches output cells at shifts {0,1} (q=0) or
    {-1,0} (q=1); padding group q by (q, 1-q) aligns every group onto the
    common VALID k-2 window. The zero padding reproduces the full-grid
    conv's zero boundary exactly."""
    c = x.shape[-1] // PHASES
    parts = []
    for qz in range(2):
        for qy in range(2):
            for qx in range(2):
                qi = qz * 4 + qy * 2 + qx
                parts.append(
                    jnp.pad(
                        x[..., qi * c : (qi + 1) * c],
                        [(0, 0), (qz, 1 - qz), (qy, 1 - qy), (qx, 1 - qx), (0, 0)],
                    )
                )
    return jnp.concatenate(parts, axis=-1)


def packed_conv_phase(x: jax.Array, w: jax.Array) -> jax.Array:
    """Phase-structured packed conv expressed in XLA ops.

    Exact, and issues only 2.37x the mathematical MACs (vs 8x dense), but
    measured SLOWER than `packed_conv_dense` on v5e (24 ms vs 8.4 ms at the
    flagship level-0 shape): the per-phase-group shift/pad/concat relayout
    dominates, while XLA runs the dense k-3 conv at ~63% MXU utilisation.
    Kept as the semantics reference for a fused Pallas kernel where the
    phase shift is free inside VMEM (scripts/probe_phase_conv.py)."""
    wp = pack_conv_kernel_phase(w.astype(x.dtype))
    return jax.lax.conv_general_dilated(
        _phase_shift_input(x),
        wp,
        (1, 1, 1),
        [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@lru_cache(maxsize=None)
def _halo_onehot(f: Factors) -> np.ndarray:
    """0/1 placement matrix (Kz*Ky*Kx*P*P, 27) for `pack_conv_kernel_halo`.

    Per packed axis (factor 2) the halo kernel has extent 2; tap a feeding
    output phase p from input phase q realises original-tap index
    t = p + q + 2a - 1 (live iff 0 <= t <= 2). Unpacked axes (factor 1) keep
    extent 3 with t = a. Exactly 27 * P of the Kz*Ky*Kx*P*P slots are live
    (each original tap lands once per output phase)."""
    ks = tuple(2 if ff == 2 else 3 for ff in f)
    p = phase_count(f)
    fz, fy, fx = f
    phases = [(a, b, c) for a in range(fz) for b in range(fy) for c in range(fx)]
    m = np.zeros((ks[0] * ks[1] * ks[2] * p * p, 27), np.float32)
    for pi, ph in enumerate(phases):
        for qi, qh in enumerate(phases):
            for az in range(ks[0]):
                for ay in range(ks[1]):
                    for ax in range(ks[2]):
                        t = []
                        for ff, pp, qq, aa in zip(f, ph, qh, (az, ay, ax)):
                            t.append(pp + qq + 2 * aa - 1 if ff == 2 else aa)
                        if all(0 <= ti <= 2 for ti in t):
                            row = ((az * ks[1] + ay) * ks[2] + ax) * p * p + qi * p + pi
                            m[row, (t[0] * 3 + t[1]) * 3 + t[2]] = 1.0
    return m


def pack_conv_kernel_halo(w: jax.Array, f: Factors = F8) -> jax.Array:
    """(3,3,3,Cin,Cout) -> (Kz,Ky,Kx,P*Cin,P*Cout) halo kernel, K = 2 on
    packed axes (3 on unpacked ones) — prod(K)/27 of the dense scattered
    kernel's MACs (8/27 = 2.37x-of-minimum at (2,2,2))."""
    k, _, _, cin, cout = w.shape
    assert k == 3, "halo formulation exists for k=3 only"
    p = phase_count(f)
    ks = tuple(2 if ff == 2 else 3 for ff in f)
    m = jnp.asarray(_halo_onehot(f), w.dtype)
    big = (m @ w.reshape(27, cin * cout)).reshape(*ks, p, p, cin, cout)
    big = big.transpose(0, 1, 2, 3, 5, 4, 6)  # (..., q, Cin, p, Cout)
    return big.reshape(*ks, p * cin, p * cout)


def _halo_realign_slices(v: jax.Array, out_shape: Tuple[int, int, int], cout: int, f: Factors) -> jax.Array:
    """(B, Z+fz-1, Y+fy-1, X+fx-1, P*Cout) halo conv output -> packed
    (B,Z,Y,X,P*Cout): output phase p takes the spatial slice offset by its
    per-axis phase. Channel indices are untouched, so XLA lowers the whole
    realign to one concat-of-slices fusion (~2 output-size HBM passes)."""
    z, y, x = out_shape
    fz, fy, fx = f
    parts = []
    for pz in range(fz):
        for py in range(fy):
            for px in range(fx):
                pi = (pz * fy + py) * fx + px
                parts.append(v[:, pz : pz + z, py : py + y, px : px + x, pi * cout : (pi + 1) * cout])
    return jnp.concatenate(parts, axis=-1)


def _halo_realign_masked(v: jax.Array, out_shape: Tuple[int, int, int], cout: int, f: Factors) -> jax.Array:
    """Realign via full-lane shifted views merged by a channel-indexed select.

    The slice-concat realign's per-phase (…, cout) slices pad cout to the
    128-lane tile when materialised (8x HBM expansion at cout=16 — the
    batch-16 halo OOM, BENCH_NOTES round-3). Here every view keeps all
    P*cout lanes and the phase choice is a lane-wise select, so no
    lane-padded temporary can exist; costs up to P reads of ``v`` inside
    one fusion instead of ~1."""
    z, y, x = out_shape
    fz, fy, fx = f
    pc = phase_count(f) * cout
    b = v.shape[0]
    ch = jax.lax.broadcasted_iota(jnp.int32, (pc,), 0) // cout
    out = None
    for pz in range(fz):
        for py in range(fy):
            for px in range(fx):
                pi = (pz * fy + py) * fx + px
                part = jax.lax.slice(v, (0, pz, py, px, 0), (b, pz + z, py + y, px + x, pc))
                out = part if out is None else jnp.where(ch == pi, part, out)
    return out


@lru_cache(maxsize=None)
def _dw_realign_kernel(cout: int, f: Factors) -> np.ndarray:
    """One-hot depthwise kernel (fz,fy,fx,1,P*cout) realising the halo
    realign: channel block p takes the tap at its per-axis phase offset."""
    fz, fy, fx = f
    k = np.zeros((fz, fy, fx, 1, phase_count(f) * cout), np.float32)
    for pz in range(fz):
        for py in range(fy):
            for px in range(fx):
                pi = (pz * fy + py) * fx + px
                k[pz, py, px, 0, pi * cout : (pi + 1) * cout] = 1.0
    return k


def _halo_realign_dwconv(v: jax.Array, out_shape: Tuple[int, int, int], cout: int, f: Factors) -> jax.Array:
    """Realign as a depthwise VALID conv whose one-hot taps select each
    output phase's shifted slice — the fastest exact realign measured on
    v5e (probe_phase_conv.py round-4: fwd 5.0 ms vs slice-concat's 15.0 at
    the flagship level-0 shape): the conv lowering keeps full lanes and
    never materialises per-phase slices or select chains."""
    pc = phase_count(f) * cout
    k = jnp.asarray(_dw_realign_kernel(cout, f), v.dtype)
    return jax.lax.conv_general_dilated(
        v, k, (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=pc,
    )


def _env_choice(name: str, default: str, allowed: Tuple[str, ...]) -> str:
    """Read an impl-switch env var, rejecting unknown values at import —
    a typo (e.g. 'Masked') would otherwise silently benchmark the default."""
    v = os.environ.get(name, default)
    if v not in allowed:
        raise ValueError(f"{name}={v!r}: expected one of {allowed}")
    return v


@lru_cache(maxsize=None)
def _strided_onehot(f: Factors) -> np.ndarray:
    """0/1 placement matrix (Kz*Ky*Kx*P, 27) for `pack_conv_kernel_strided`.

    A stride-2 SAME k-3 conv's outputs sit on the packed CELL grid, so a
    packed input needs no output phases at all: per packed axis (factor 2),
    kernel tap a reading input phase q realises original-tap index
    t = 2a + q - 1 (live iff 0 <= t <= 2; only (a=0,q=0) is dead). Unpacked
    axes (factor 1) keep extent 3 with stride 2 and t = a. Every original
    tap lands exactly once."""
    ks = tuple(2 if ff == 2 else 3 for ff in f)
    p = phase_count(f)
    fz, fy, fx = f
    phases = [(a, b, c) for a in range(fz) for b in range(fy) for c in range(fx)]
    m = np.zeros((ks[0] * ks[1] * ks[2] * p, 27), np.float32)
    for qi, qh in enumerate(phases):
        for az in range(ks[0]):
            for ay in range(ks[1]):
                for ax in range(ks[2]):
                    t = []
                    for ff, qq, aa in zip(f, qh, (az, ay, ax)):
                        t.append(2 * aa + qq - 1 if ff == 2 else aa)
                    if all(0 <= ti <= 2 for ti in t):
                        row = ((az * ks[1] + ay) * ks[2] + ax) * p + qi
                        m[row, (t[0] * 3 + t[1]) * 3 + t[2]] = 1.0
    return m


def pack_conv_kernel_strided(w: jax.Array, f: Factors = F8) -> jax.Array:
    """(3,3,3,Cin,Cout) -> (Kz,Ky,Kx,P*Cin,Cout) stride-2-absorbing kernel,
    K = 2 on packed axes (3 on unpacked ones)."""
    k, _, _, cin, cout = w.shape
    assert k == 3, "strided packed conv exists for k=3 only"
    p = phase_count(f)
    ks = tuple(2 if ff == 2 else 3 for ff in f)
    m = jnp.asarray(_strided_onehot(f), w.dtype)
    big = (m @ w.reshape(27, cin * cout)).reshape(*ks, p, cin, cout)
    return big.reshape(*ks, p * cin, cout)


def packed_conv_strided(x: jax.Array, w: jax.Array, f: Factors = F8) -> jax.Array:
    """Stride-2 SAME k-3 conv over the full grid, consuming the f-packed
    input and producing the UNPACKED stride-2 output directly.

    The stride-2 output grid coincides with the packing cell grid on packed
    axes, so no output phases (and no realign) exist: ONE conv with extent-2
    taps on packed axes (pad (1,0)) and extent-3 stride-2 taps on unpacked
    ones (pad (1,1)). Exact == lax stride-2 conv on the unpacked input;
    prod(K)/27 of the mathematical MACs' dense-scatter cost with full
    128-lane contractions (2.37x-of-minimum at (2,2,2)) — the down-path
    mirror of `packed_conv_halo`. Serves the BMGAN ResNet_encoder's strided
    ResidualUnits (bmgan_model.py:118) in the s2d domain."""
    wp = pack_conv_kernel_strided(w.astype(x.dtype), f)
    strides = tuple(1 if ff == 2 else 2 for ff in f)
    pads = [(1, 0) if ff == 2 else (1, 1) for ff in f]
    return jax.lax.conv_general_dilated(
        x, wp, strides, pads, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )


# s2d/d2s boundary relayout: "conv" routes through the one-hot strided
# conv / its transpose (layout change stays inside a conv lowering);
# "reshape" is the 6-D reshape+transpose. Read once at import.
_S2D_IMPL = _env_choice("CIPS_S2D_IMPL", "reshape", ("reshape", "conv"))

# dwconv (default; fastest measured) | slice | masked; read once at import.
_HALO_REALIGN = _env_choice("CIPS_HALO_REALIGN", "dwconv", ("dwconv", "slice", "masked"))
_REALIGN_IMPLS = {
    "dwconv": _halo_realign_dwconv,
    "slice": _halo_realign_slices,
    "masked": _halo_realign_masked,
}


def _halo_realign(v: jax.Array, out_shape: Tuple[int, int, int], cout: int, f: Factors) -> jax.Array:
    return _REALIGN_IMPLS[_HALO_REALIGN](v, out_shape, cout, f)


def packed_conv_halo(x: jax.Array, w: jax.Array, f: Factors = F8, realign: bool = True) -> jax.Array:
    """Packed conv via the halo-output formulation: ONE k-2 VALID-style conv
    over the (1,1)-padded packed input produces every output phase's windows
    on a (Z+1, Y+1, X+1) halo grid; a static slice-concat realigns them.

    Exact (== packed_conv_dense, tests/test_s2d.py). Issues prod(K)/27 of
    the dense path's MACs (2.37x the mathematical minimum at (2,2,2) vs the
    dense path's 8x) with full 128-lane contractions; the phase-shift
    datapath — the cost that sank the input-side `packed_conv_phase` (8
    pad+concat copies of the input) and the Mosaic kernel (VPU select
    chains, BENCH_NOTES.md) — collapses to one output-side realign fusion.

    ``realign=False`` returns the raw halo grid so multi-part callers
    (skip-fusion tuple inputs) can sum partial halo outputs and realign
    once (realignment commutes with the sum by linearity)."""
    wp = pack_conv_kernel_halo(w.astype(x.dtype), f)
    v = jax.lax.conv_general_dilated(
        x,
        wp,
        (1, 1, 1),
        [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if not realign:
        return v
    return _halo_realign(v, x.shape[1:4], w.shape[-1], f)


def packed_conv_tiled_halo(x: jax.Array, w: jax.Array, f: Factors = F8, realign: bool = True) -> jax.Array:
    """`packed_conv_tiled` through the halo formulation: the tile's identical
    input phases sum the halo kernel's q blocks (linearity), so the up-path
    fold-tile conv drops to prod(K)/27 of its MACs too."""
    k, _, _, cin, cout = w.shape
    p = phase_count(f)
    wp = pack_conv_kernel_halo(w.astype(x.dtype), f)
    ks = wp.shape[:3]
    folded = wp.reshape(*ks, p, cin, p * cout).sum(axis=3)
    v = jax.lax.conv_general_dilated(
        x,
        folded,
        (1, 1, 1),
        [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    if not realign:
        return v
    return _halo_realign(v, x.shape[1:4], cout, f)


def _halo_dots(x: jax.Array, wk: jax.Array) -> jax.Array:
    """prod(K) shifted full-lane contractions over the (1,1)-padded input.

    Each kernel tap runs as a dot_general over a shifted slice of the
    once-padded input, at matmul MXU rates, accumulating all taps in fp32
    (the conv-based paths get fp32 accumulation from XLA internally; an
    input-dtype add chain would round per tap at bf16). wk is a halo kernel
    (Kz,Ky,Kx,Cin_eff,Cout_eff); returns the raw halo grid in x.dtype."""
    kz, ky, kx = wk.shape[:3]
    b, z, y, xx, c = x.shape
    gz, gy, gx = z + 3 - kz, y + 3 - ky, xx + 3 - kx
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    acc = None
    for az in range(kz):
        for ay in range(ky):
            for ax in range(kx):
                xv = jax.lax.slice(
                    xpad, (0, az, ay, ax, 0), (b, az + gz, ay + gy, ax + gx, c)
                )
                yv = jax.lax.dot_general(
                    xv, wk[az, ay, ax], (((4,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = yv if acc is None else acc + yv
    return acc.astype(x.dtype)


def packed_conv_halo_dots(x: jax.Array, w: jax.Array, f: Factors = F8, realign: bool = True) -> jax.Array:
    """Halo conv as prod(K) explicit shifted full-lane contractions.

    XLA's even-kernel (k=2) conv lowering issues ~5x the halo formulation's
    MAC minimum on v5e (probe_phase_conv.py); expressing each kernel tap as
    a dot_general over a shifted slice of the once-padded input runs every
    contraction at matmul MXU rates, at the cost of re-reading the input
    once per tap (prod(K)=8 at (2,2,2)). Exact (== packed_conv_dense)."""
    wp = pack_conv_kernel_halo(w.astype(x.dtype), f)  # (Kz,Ky,Kx,PC,PC)
    acc = _halo_dots(x, wp)
    if not realign:
        return acc
    return _halo_realign(acc, x.shape[1:4], w.shape[-1], f)


def packed_conv_tiled_halo_dots(x: jax.Array, w: jax.Array, f: Factors = F8, realign: bool = True) -> jax.Array:
    """`packed_conv_tiled` through the halo-dots formulation: fold the halo
    kernel's q blocks (the tile's phases are identical), then run the
    prod(K) shifted dots — the up-path fold-tile sites get the same
    even-kernel-free lowering as `packed_conv_halo_dots`."""
    k, _, _, cin, cout = w.shape
    p = phase_count(f)
    wp = pack_conv_kernel_halo(w.astype(x.dtype), f)
    ks = wp.shape[:3]
    folded = wp.reshape(*ks, p, cin, p * cout).sum(axis=3)
    acc = _halo_dots(x, folded)
    if not realign:
        return acc
    return _halo_realign(acc, x.shape[1:4], cout, f)


# Production-path switch, read once at import (static under jit):
#   CIPS_PACKED_CONV=halo      — the 2.37x-MAC halo formulation (k-2 conv)
#   CIPS_PACKED_CONV=halo_dots — halo via prod(K) shifted MXU dots
#   CIPS_PACKED_CONV=dense     — the 8x-MAC dense scattered kernel
# Default: halo (+ dwconv realign). Measured on v5e (BENCH_NOTES round-4
# session-1): flagship 12.59 vs dense 9.88 vol/s/chip (+27%), exact to the
# dense path (full-model forward+grad gate, tests/test_halo_full_model.py).
_PACKED_CONV_IMPL = _env_choice("CIPS_PACKED_CONV", "halo", ("dense", "halo", "halo_dots"))


def packed_conv_uses_halo(k: int) -> bool:
    """True when `packed_conv` would route a kernel-``k`` site through a
    halo formulation (multi-part callers use this to sum raw halo grids and
    realign once)."""
    return _PACKED_CONV_IMPL in ("halo", "halo_dots") and k == 3


def packed_conv_halo_impl(x: jax.Array, w: jax.Array, f: Factors = F8, realign: bool = True) -> jax.Array:
    """The env-selected halo formulation (k-2 conv or shifted dots)."""
    fn = packed_conv_halo_dots if _PACKED_CONV_IMPL == "halo_dots" else packed_conv_halo
    return fn(x, w, f, realign=realign)


def halo_realign(v: jax.Array, out_shape: Tuple[int, int, int], cout: int, f: Factors = F8) -> jax.Array:
    """Public alias of the halo-grid -> packed-output realign."""
    return _halo_realign(v, out_shape, cout, f)


def packed_conv(x: jax.Array, w: jax.Array, stride: int = 1, f: Factors = F8) -> jax.Array:
    """Convolution in the packed domain with an original-parameter kernel."""
    assert stride == 1, "packed domain only hosts stride-1 convs"
    if packed_conv_uses_halo(w.shape[0]):
        return packed_conv_halo_impl(x, w, f)
    return packed_conv_dense(x, w, f)


def tconv_k4s2_kernel(w: jax.Array) -> jax.Array:
    """(4,4,4,Cin,Cout) ConvTranspose kernel -> (2,2,2,Cin,8*Cout) subpixel
    kernel, phase-major output channels (p = (az*2+ay)*2+ax)."""
    _, _, _, cin, cout = w.shape
    w6 = w.reshape(2, 2, 2, 2, 2, 2, cin, cout)  # (dz,az,dy,ay,dx,ax,...)
    wq = jnp.transpose(w6, (0, 2, 4, 6, 1, 3, 5, 7))
    return wq.reshape(2, 2, 2, cin, 8 * cout)


def conv_transpose_k4s2(x: jax.Array, w: jax.Array) -> jax.Array:
    """`flax.linen.ConvTranspose(kernel=4, stride=2, padding=SAME)` as a
    dense k-2 conv + halo realign + depth_to_space — never the input-dilated
    k-4 lowering (64 taps over an 87.5%-zero dilated input on the MXU).

    Per axis (matched empirically against nn.ConvTranspose, then exact by
    the fractional-stride algebra): even outputs y[2j] = w0*x[j-1] + w2*x[j]
    and odd outputs y[2j+1] = w1*x[j] + w3*x[j+1], so a VALID k-2 conv over
    the (1,1)-padded input produces every output phase's value on the same
    (Z+1,Y+1,X+1) halo grid as `packed_conv_halo`, phase p reading cell
    j + p — exactly `_halo_realign`. Backward inherits the dense lowering
    (dX is a k-2 transposed conv, dW a dense contraction).

    x: (B,Z,Y,X,Cin) unpacked; w: (4,4,4,Cin,Cout); returns
    (B,2Z,2Y,2X,Cout) == nn.ConvTranspose(...)(x) exactly."""
    cout = w.shape[-1]
    wq = tconv_k4s2_kernel(w.astype(x.dtype))
    v = jax.lax.conv_general_dilated(
        x, wq, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=_DN3D
    )
    y = _halo_realign(v, x.shape[1:4], cout, F8)
    return depth_to_space(y, F8)


def packed_conv_pooled(x: jax.Array, w: jax.Array, f: Factors = F8) -> jax.Array:
    """conv(phase_mean(x, f), w) WITHOUT materialising the pooled tensor.

    Down-transition mirror of `packed_conv_tiled`: when the 2x pooling
    windows coincide with the packing cells (f == (2,2,2) into an unpacked
    next level) the pooled tensor lives on the packed grid and the phase
    mean folds into the kernel by linearity:
      conv(mean_p x_p, w) == conv(x, tile_p(w) / P).
    Issues P-times the mathematical MACs, but at Cin <= 16 the MXU lanes
    were padded to 128 anyway — the pooled (B,Z,Y,X,Cin) temporary and its
    relayout never exist. x: packed (B,Z,Y,X,P*Cin); returns UNPACKED
    (B,Z,Y,X,Cout) on the pooled grid.
    """
    k, _, _, cin, cout = w.shape
    p = phase_count(f)
    wf = jnp.tile(w, (1, 1, 1, p, 1)) / p  # phase-major Cin: index p*Cin + c
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x,
        wf.astype(x.dtype),
        (1, 1, 1),
        [(pad, pad)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def packed_conv_tiled(x: jax.Array, w: jax.Array, f: Factors = F8) -> jax.Array:
    """packed_conv(phase_tile(x, f), w, f) WITHOUT materialising the tile.

    When the packed input is a nearest-upsample (all P phase blocks equal x),
    the packed kernel's input-phase blocks can be summed instead:
      conv(tile(x), W_packed) == conv(x, sum_q W_packed[:, q-block, :]).
    Exact, P-times fewer MACs, and the (B,Z,Y,X,P*C) tile temporary — the
    dominant batch>8 HBM allocation in the up path — never exists.
    x: (B, Z, Y, X, C) on the PACKED cell grid; returns (B, Z, Y, X, P*Cout).
    """
    if _PACKED_CONV_IMPL == "halo_dots" and w.shape[0] == 3:
        return packed_conv_tiled_halo_dots(x, w, f)
    if _PACKED_CONV_IMPL == "halo" and w.shape[0] == 3:
        return packed_conv_tiled_halo(x, w, f)
    k, _, _, cin, cout = w.shape
    p = phase_count(f)
    wp = pack_conv_kernel(w.astype(x.dtype), f)  # (k,k,k,P*cin,P*cout)
    kk = wp.shape[0]
    folded = wp.reshape(kk, kk, kk, p, cin, p * cout).sum(axis=3)
    pad = (kk - 1) // 2
    return jax.lax.conv_general_dilated(
        x,
        folded,
        (1, 1, 1),
        [(pad, pad)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
