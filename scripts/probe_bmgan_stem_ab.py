"""A/B the BMGAN stem/head lowering at production shapes (batch 1).

Variants (argv[1]):
  halo   — s2d (2,1,1) packed convs, CIPS_PACKED_CONV=halo (current default)
  dense  — s2d packed convs, dense scattered-k3 impl
  plain  — no s2d: plain nn.Conv at 64 channels full res (half-full lanes)

With no argv, re-execs itself for all three variants (env is read at
import, so each needs a fresh process).

  python scripts/probe_bmgan_stem_ab.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

VARIANTS = {"halo": "halo", "dense": "dense", "plain": "halo"}


def run_all():
    for v in VARIANTS:
        env = dict(os.environ, CIPS_PACKED_CONV=VARIANTS[v])
        subprocess.run([sys.executable, __file__, v], env=env, check=False)


def main(variant: str):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cips_tpu.models import bmgan
    from cips_tpu.models.discriminator import _InstanceNorm

    DT = jnp.bfloat16
    V = (96, 128, 96)

    class Stem(nn.Module):
        s2d: bool

        @nn.compact
        def __call__(self, x):
            if self.s2d:
                f = bmgan.auto_factor(64)
                p = bmgan.phase_count(f)
                h = bmgan.space_to_depth(x, f)
                for i in range(2):
                    h = bmgan.PackedConv(64, 3, factors=f, dtype=DT, name=f"stem_{i}")(h)
                    h = _InstanceNorm(phases=p, name=f"stem_norm_{i}")(h)
                    h = nn.leaky_relu(h, 0.2)
                h = bmgan.depth_to_space(h, f)
            else:
                h = x
                for i in range(2):
                    h = bmgan._conv(3, 64, 3, 1, f"stem_{i}", DT)(h)
                    h = _InstanceNorm(name=f"stem_norm_{i}")(h)
                    h = nn.leaky_relu(h, 0.2)
            h = bmgan._conv(3, 64, 3, 2, "stem_down", DT)(h)
            h = _InstanceNorm(name="stem_down_norm")(h)
            return nn.leaky_relu(h, 0.2)

    class Head(nn.Module):
        s2d: bool

        @nn.compact
        def __call__(self, x):
            if self.s2d:
                f = bmgan.auto_factor(64)
                p = bmgan.phase_count(f)
                h = bmgan.space_to_depth(x, f)
                for i in range(2):
                    h = bmgan.PackedConv(64, 3, factors=f, dtype=DT, name=f"head_{i}")(h)
                    h = _InstanceNorm(phases=p, name=f"head_norm_{i}")(h)
                    h = nn.leaky_relu(h, 0.2)
                h = bmgan.PackedConv(1, 3, factors=f, dtype=DT, name="head_out")(h)
                h = bmgan.depth_to_space(h, f)
            else:
                h = x
                for i in range(2):
                    h = bmgan._conv(3, 64, 3, 1, f"head_{i}", DT)(h)
                    h = _InstanceNorm(name=f"head_norm_{i}")(h)
                    h = nn.leaky_relu(h, 0.2)
                h = bmgan._conv(3, 1, 3, 1, "head_out", DT)(h)
            return jnp.tanh(h)

    def timeit(fn, *args, n=8):
        out = fn(*args)
        jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
        return (time.perf_counter() - t0) / n * 1e3

    def bench(label, mod, shape):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random(shape, np.float32), DT)
        params = jax.jit(mod.init)(jax.random.key(0), x)
        f = jax.jit(mod.apply)
        g = jax.jit(jax.grad(lambda p_, x_: jnp.sum(mod.apply(p_, x_).astype(jnp.float32)), argnums=(0, 1)))
        print(f"[{variant}] {label:22s} fwd {timeit(f, params, x):7.2f} ms   grad {timeit(g, params, x):7.2f} ms", flush=True)

    s2d = variant != "plain"
    bench("stem", Stem(s2d=s2d), (1, *V, 9))
    bench("head", Head(s2d=s2d), (1, *V, 128))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        main(sys.argv[1])
    else:
        run_all()
