"""Probe: dense-k3 vs phase-structured packed conv on the real TPU.

Times forward and forward+backward of the level-0 packed conv at the
flagship working shape (batch 8, cells (48,64,48), C=16 -> 128 packed)
for both implementations, plus the unpacked full-resolution original.
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

from cips_tpu.ops.s2d import (
    packed_conv_dense,
    packed_conv_halo,
    packed_conv_halo_dots,
    packed_conv_phase,
    packed_conv_tiled,
    packed_conv_tiled_halo,
    space_to_depth,
)

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a).astype(jnp.float32)), out)  # sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a).astype(jnp.float32)), out)
    return (time.perf_counter() - t0) / n


def main():
    B, Z, Y, X, C = 8, 48, 64, 48, 16
    rng = np.random.default_rng(0)
    x_full = jnp.asarray(rng.standard_normal((B, 2 * Z, 2 * Y, 2 * X, C)), jnp.bfloat16)
    xp = jax.jit(space_to_depth)(x_full)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.1, jnp.float32)

    def full_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    variants = {
        "full-res k3 (C=16)": (full_conv, x_full),
        "packed dense k3": (packed_conv_dense, xp),
        "packed phase k2 (input-shift)": (packed_conv_phase, xp),
        "packed halo k2 (output-realign)": (packed_conv_halo, xp),
        "packed halo k2 NOREALIGN": (lambda x_, w_: packed_conv_halo(x_, w_, realign=False), xp),
        "packed halo dots (8 shifted MXU dots)": (packed_conv_halo_dots, xp),
        "packed halo dots NOREALIGN": (lambda x_, w_: packed_conv_halo_dots(x_, w_, realign=False), xp),
    }

    for name, (fn, xin) in variants.items():
        f = jax.jit(fn)
        t_fwd = timeit(f, xin, w)

        def loss(x_, w_, fn_=fn):
            return jnp.sum(fn_(x_, w_).astype(jnp.float32))

        g = jax.jit(jax.grad(loss, argnums=1))
        t_bwd = timeit(g, xin, w)

        gx = jax.jit(jax.grad(loss, argnums=0))
        t_bwd_x = timeit(gx, xin, w)
        print(
            f"{name:24s} fwd {t_fwd*1e3:7.2f} ms   dW {t_bwd*1e3:7.2f} ms   dX {t_bwd_x*1e3:7.2f} ms",
            flush=True,
        )

    # realign formulations: slice-concat (default) vs full-lane masked select
    # vs a depthwise k-2 VALID conv whose one-hot taps realise the shifts.
    from cips_tpu.ops import s2d as _s2d

    def halo_masked(x_, w_):
        v = packed_conv_halo(x_, w_, realign=False)
        return _s2d._halo_realign_masked(v, x_.shape[1:4], w_.shape[-1], (2, 2, 2))

    def _dw_realign(v, out_shape, cout):
        z, y, xx = out_shape
        pc = 8 * cout
        k = np.zeros((2, 2, 2, 1, pc), np.float32)
        for pz in range(2):
            for py in range(2):
                for px in range(2):
                    pi = (pz * 2 + py) * 2 + px
                    k[pz, py, px, 0, pi * cout : (pi + 1) * cout] = 1.0
        return jax.lax.conv_general_dilated(
            v, jnp.asarray(k, v.dtype), (1, 1, 1), [(0, 0)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), feature_group_count=pc,
        )

    def halo_dwconv(x_, w_):
        v = packed_conv_halo(x_, w_, realign=False)
        return _dw_realign(v, x_.shape[1:4], w_.shape[-1])

    for name, fn in (("halo + MASKED realign", halo_masked), ("halo + DWCONV realign", halo_dwconv)):
        ff = jax.jit(fn)
        t_fwd = timeit(ff, xp, w)

        def loss(x_, w_, fn_=fn):
            return jnp.sum(fn_(x_, w_).astype(jnp.float32))

        t_bwd = timeit(jax.jit(jax.grad(loss, argnums=1)), xp, w)
        t_bwd_x = timeit(jax.jit(jax.grad(loss, argnums=0)), xp, w)
        print(f"{name:32s} fwd {t_fwd*1e3:7.2f} ms   dW {t_bwd*1e3:7.2f} ms   dX {t_bwd_x*1e3:7.2f} ms", flush=True)
        err = float(jnp.max(jnp.abs(jax.jit(packed_conv_dense)(xp, w).astype(jnp.float32) - ff(xp, w).astype(jnp.float32))))
        print(f"   max |dense - this| = {err}", flush=True)

    # fold-tile variants (up-path): unpacked (B,Z,Y,X,C) -> packed output
    xt = jnp.asarray(rng.standard_normal((B, Z, Y, X, C)), jnp.bfloat16)
    for name, fn in (("tiled dense k3", packed_conv_tiled), ("tiled halo k2", packed_conv_tiled_halo)):
        f = jax.jit(fn)
        t_fwd = timeit(f, xt, w)

        def loss(x_, w_, fn_=fn):
            return jnp.sum(fn_(x_, w_).astype(jnp.float32))

        t_bwd = timeit(jax.jit(jax.grad(loss, argnums=1)), xt, w)
        t_bwd_x = timeit(jax.jit(jax.grad(loss, argnums=0)), xt, w)
        print(f"{name:32s} fwd {t_fwd*1e3:7.2f} ms   dW {t_bwd*1e3:7.2f} ms   dX {t_bwd_x*1e3:7.2f} ms", flush=True)

    # numerical cross-check on-device
    y_dense = jax.jit(packed_conv_dense)(xp, w)
    for name, fn in (
        ("phase", packed_conv_phase),
        ("halo", packed_conv_halo),
        ("halo_dots", packed_conv_halo_dots),
    ):
        y = jax.jit(fn)(xp, w)
        err = float(jnp.max(jnp.abs(y_dense.astype(jnp.float32) - y.astype(jnp.float32))))
        print(f"max |dense - {name}| = {err}")


if __name__ == "__main__":
    main()
