"""Op-level trace of the packed BMGAN encoder front end's grad.

packed stem+res_0 measures 48.9 ms grad at batch 2 vs a ~14 ms ideal
(probe_bmgan_enc_segments) — attribute the remaining 3.5x.

  python scripts/probe_enc_front_trace.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cips_tpu.models.blocks import PackedConv
from cips_tpu.models.bmgan import _PackedStridedResUnit
from cips_tpu.models.discriminator import _InstanceNorm
from cips_tpu.ops.s2d import phase_count, space_to_depth
from trace_util import hlo_fusion_index, summarize_trace

DT = jnp.bfloat16


class Front(nn.Module):
    @nn.compact
    def __call__(self, x):
        f = (2, 2, 2)
        h = space_to_depth(x, f)
        h = PackedConv(32, 3, factors=f, dtype=DT, name="stem")(h)
        h = _InstanceNorm(phases=phase_count(f), name="stem_norm")(h)
        h = nn.relu(h)
        return _PackedStridedResUnit(3, 64, factors=f, dtype=DT, name="res_0")(h)


def main():
    mod = Front()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 96, 128, 96, 1), np.float32), DT)
    params = jax.jit(mod.init)(jax.random.key(0), x)

    g = jax.jit(jax.grad(lambda p_, x_: jnp.sum(mod.apply(p_, x_).astype(jnp.float32)), argnums=(0, 1)))
    describe = hlo_fusion_index(g.lower(params, x).compile().as_text())
    out = g(params, x)
    jax.block_until_ready(out)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    n = 6
    tdir = "/tmp/trace_enc_front"
    with jax.profiler.trace(tdir):
        for _ in range(n):
            out = g(params, x)
        jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    totals = summarize_trace(tdir, n)
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f"total device op-time {sum(totals.values()):.1f} ms/step", flush=True)
    for name, ms in rows[:28]:
        print(f"{ms:8.2f} ms  {name:40s} {describe(name)}", flush=True)


if __name__ == "__main__":
    main()
