"""Per-segment fwd/bwd timing of the BMGAN generator on TPU.

Builds each stage of DenseUNetGenerator standalone at its production shape
(batch 1, (96,128,96) volume) and times jit(fwd) and jit(grad wrt params+
input) so the G-grad hotspot (248.8 ms vs 63.5 ms fwd, round-4 queue E) can
be attributed.  Also micro-times _InstanceNorm fwd/bwd at the two largest
shapes, and A/Bs the up-path tconv lowering (nn.ConvTranspose vs the
subpixel conv_transpose_k4s2).

  python scripts/probe_bmgan_segments.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cips_tpu.models import bmgan
from cips_tpu.models.discriminator import _InstanceNorm

DT = jnp.bfloat16


def timeit(fn, *args, n=8):
    out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    return (time.perf_counter() - t0) / n * 1e3


def bench_module(label, mod, *xs):
    rng = np.random.default_rng(0)
    xs = tuple(jnp.asarray(rng.random(s, np.float32), DT) for s in xs)
    params = jax.jit(mod.init)(jax.random.key(0), xs if len(xs) > 1 else xs[0])

    def fwd(p, xs):
        y = mod.apply(p, xs if len(xs) > 1 else xs[0])
        return jnp.sum(y.astype(jnp.float32))

    f = jax.jit(lambda p, xs: mod.apply(p, xs if len(xs) > 1 else xs[0]))
    g = jax.jit(jax.grad(fwd, argnums=(0, 1)))
    tf = timeit(f, params, xs)
    tg = timeit(g, params, xs)
    print(f"{label:34s} fwd {tf:7.2f} ms   grad {tg:7.2f} ms", flush=True)
    return tf, tg


class _Stem(nn.Module):
    @nn.compact
    def __call__(self, x):
        g = bmgan.DenseUNetGenerator(dtype=DT)
        # replicate the stem inline: s2d packed convs + stride-2 down
        f = bmgan.auto_factor(64)
        p = bmgan.phase_count(f)
        h = bmgan.space_to_depth(x, f)
        for i in range(2):
            h = bmgan.PackedConv(64, 3, factors=f, dtype=DT, name=f"stem_{i}")(h)
            h = _InstanceNorm(phases=p, name=f"stem_norm_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        h = bmgan.depth_to_space(h, f)
        h = bmgan._conv(3, 64, 3, 2, "stem_down", DT)(h)
        h = _InstanceNorm(name="stem_down_norm")(h)
        return nn.leaky_relu(h, 0.2)


class _Head(nn.Module):
    @nn.compact
    def __call__(self, x):
        f = bmgan.auto_factor(64)
        p = bmgan.phase_count(f)
        h = bmgan.space_to_depth(x, f)
        for i in range(2):
            h = bmgan.PackedConv(64, 3, factors=f, dtype=DT, name=f"head_{i}")(h)
            h = _InstanceNorm(phases=p, name=f"head_norm_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        h = bmgan.PackedConv(1, 3, factors=f, dtype=DT, name="head_out")(h)
        h = bmgan.depth_to_space(h, f)
        return jnp.tanh(h)


class _DenseTuple(nn.Module):
    features: int

    @nn.compact
    def __call__(self, xs):
        return bmgan._DenseBlock(3, self.features, dtype=DT)(xs)


class _TConvNative(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.features, kernel_size=(4, 4, 4), strides=(2, 2, 2), padding="SAME",
            dtype=DT, param_dtype=jnp.float32,
        )(x)


class _INWrap(nn.Module):
    @nn.compact
    def __call__(self, x):
        return _InstanceNorm()(x)


def main():
    V = (96, 128, 96)
    H = tuple(v // 2 for v in V)

    print("== generator segments (batch 1) ==", flush=True)
    bench_module("stem (s2d packed, full res)", _Stem(), (1, *V, 9))
    bench_module("head (s2d packed, full res)", _Head(), (1, *V, 128))
    bench_module("down_dense_0 128 @ /2", _DenseTuple(128), (1, *H, 64))
    bench_module("down_dense_1 256 @ /4", _DenseTuple(256), (1, 24, 32, 24, 128))
    bench_module("up_dense_3 256 @ /4", _DenseTuple(256), (1, 24, 32, 24, 256), (1, 24, 32, 24, 128))
    bench_module("up_dense_4 128 @ /2", _DenseTuple(128), (1, *H, 256), (1, *H, 64))
    bench_module("tconv4 native k4s2 128 @ /2", _TConvNative(128), (1, *H, 128))
    bench_module("tconv4 subpixel 128 @ /2", bmgan._SubpixelTConv(128, dtype=DT), (1, *H, 128))
    bench_module("tconv3 native 256 @ /4", _TConvNative(256), (1, 24, 32, 24, 256))
    bench_module("tconv3 subpixel 256 @ /4", bmgan._SubpixelTConv(256, dtype=DT), (1, 24, 32, 24, 256))

    print("== InstanceNorm micro ==", flush=True)
    bench_module("IN 64 @ full res", _INWrap(), (1, *V, 64))
    bench_module("IN 128 @ /2", _INWrap(), (1, *H, 128))


if __name__ == "__main__":
    main()
