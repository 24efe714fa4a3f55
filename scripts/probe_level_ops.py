"""Micro-probe: per-level op costs of the flagship UNet on the real TPU.

Times the individual hot ops at each level's working shape (batch 8) to
locate where the 305 ms forward / 845 ms backward actually go.
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

from cips_tpu.ops.s2d import packed_conv


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a.astype(jnp.float32))), out)
    return (time.perf_counter() - t0) / n


def conv3(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def gn(x, groups=16):
    import flax.linen as nn

    mod = nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32)
    p = mod.init(jax.random.key(0), x[:1].astype(jnp.float32))
    return mod.apply(p, x.astype(jnp.float32)).astype(x.dtype)


def main():
    B = 8
    rng = np.random.default_rng(0)

    def arr(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    cases = [
        # (label, builder fn, input shape)
        ("L0 packed conv 128->128 @(48,64,48)", "pconv", (B, 48, 64, 48, 128), 16, 16),
        ("L0 packed conv 256->128 (concat in)", "pconv", (B, 48, 64, 48, 256), 32, 16),
        ("L1 conv 32->32 @(48,64,48)", "conv", (B, 48, 64, 48, 32), 32, 32),
        ("L1 conv 64->32 (concat in)", "conv", (B, 48, 64, 48, 64), 64, 32),
        ("L1 conv 16->32 (transition)", "conv", (B, 48, 64, 48, 16), 16, 32),
        ("L2 conv 64->64 @(24,32,24)", "conv", (B, 24, 32, 24, 64), 64, 64),
        ("L3 conv 128->128 @(12,16,12)", "conv", (B, 12, 16, 12, 128), 128, 128),
        ("GN @L0 packed (128ch)", "gn", (B, 48, 64, 48, 128), None, None),
        ("GN @L1 (32ch)", "gn", (B, 48, 64, 48, 32), None, None),
        ("concat @L1 (32+32)", "concat", (B, 48, 64, 48, 32), None, None),
    ]
    for label, kind, shape, cin, cout in cases:
        x = arr(shape)
        if kind == "pconv":
            w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1, jnp.float32)
            f = jax.jit(packed_conv)
            t = timeit(f, x, w)
        elif kind == "conv":
            w = jnp.asarray(rng.standard_normal((3, 3, 3, shape[-1], cout)) * 0.1, jnp.float32)
            f = jax.jit(conv3)
            t = timeit(f, x, w)
        elif kind == "gn":
            f = jax.jit(gn)
            t = timeit(f, x)
        elif kind == "concat":
            f = jax.jit(lambda a, b: jnp.concatenate([a, b], axis=-1))
            t = timeit(f, x, x)
        print(f"{label:42s} {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
