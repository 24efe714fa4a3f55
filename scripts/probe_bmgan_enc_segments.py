"""Per-segment fwd/grad timing of the BMGAN ResNetEncoder on TPU.

The E phase (KL on real+fake, batch 2 at (96,128,96)) costs 81 ms/step
(probe_bmgan_parts) against a ~8 ms FLOP ideal — attribute it before
optimizing.  Segments are built standalone at the E step's real shapes.

  python scripts/probe_bmgan_enc_segments.py
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
from cips_tpu.models.bmgan import _InstanceNorm, _ResidualUnit, _conv

DT = jnp.bfloat16


def timeit(fn, *args, n=8):
    out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    return (time.perf_counter() - t0) / n * 1e3


def bench_module(label, mod, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape, np.float32), DT)
    params = jax.jit(mod.init)(jax.random.key(0), x)
    f = jax.jit(mod.apply)
    g = jax.jit(jax.grad(lambda p_, x_: jnp.sum(mod.apply(p_, x_).astype(jnp.float32)), argnums=(0, 1)))
    tf = timeit(f, params, x)
    tg = timeit(g, params, x)
    print(f"{label:34s} fwd {tf:7.2f} ms   grad {tg:7.2f} ms", flush=True)


class _Stem(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = _conv(3, 32, 3, 1, "stem", DT)(x)
        h = _InstanceNorm(name="stem_norm")(h)
        return nn.relu(h)


class _Res(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return _ResidualUnit(3, self.features, stride=2, subunits=2, act="prelu", dtype=DT)(x)


class _PackedFront(nn.Module):
    """stem + res_0 exactly as the s2d ResNetEncoder front end runs them."""

    @nn.compact
    def __call__(self, x):
        from cips_tpu.models.blocks import PackedConv
        from cips_tpu.models.bmgan import _PackedStridedResUnit
        from cips_tpu.ops.s2d import phase_count, space_to_depth

        f = (2, 2, 2)
        h = space_to_depth(x, f)
        h = PackedConv(32, 3, factors=f, dtype=DT, name="stem")(h)
        h = _InstanceNorm(phases=phase_count(f), name="stem_norm")(h)
        h = nn.relu(h)
        return _PackedStridedResUnit(3, 64, factors=f, dtype=DT, name="res_0")(h)


def main():
    V = (96, 128, 96)
    B = 2  # the E step batches [real; fake]
    print("== encoder segments (batch 2 = real+fake) ==", flush=True)
    bench_module("packed stem+res_0 @ full->/2", _PackedFront(), (B, *V, 1))
    bench_module("stem 1->32 @ full res", _Stem(), (B, *V, 1))
    bench_module("res_0 32->64 s2 @ full->/2", _Res(64), (B, *V, 32))
    bench_module("res_1 64->128 s2 @ /2->/4", _Res(128), (B, 48, 64, 48, 64))
    bench_module("res_2 128->128 s2 @ /4->/8", _Res(128), (B, 24, 32, 24, 128))
    bench_module("res_3 128->128 s2 @ /8->/16", _Res(128), (B, 12, 16, 12, 128))


if __name__ == "__main__":
    main()
