"""Op-level trace of the BMGAN head segment's grad (the 59 ms hotspot).

The head (two s2d-packed 64-ch convs + INs + head_out at full res) costs
18 ms fwd / 59 ms grad at batch 1 (probe_bmgan_segments) against a ~13 ms
FLOP ideal for fwd+bwd combined.  Trace the grad and attribute.

  python scripts/probe_bmgan_head_trace.py
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

from cips_tpu.models import bmgan
from cips_tpu.models.discriminator import _InstanceNorm
from trace_util import hlo_fusion_index, summarize_trace

DT = jnp.bfloat16
TRACE_DIR = "/tmp/trace_bmgan_head"


class Head(nn.Module):
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


def main():
    V = (96, 128, 96)
    mod = Head()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, *V, 128), np.float32), DT)
    params = jax.jit(mod.init)(jax.random.key(0), x)

    def loss(p_, x_):
        return jnp.sum(mod.apply(p_, x_).astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    lowered = g.lower(params, x)
    compiled = lowered.compile()
    hlo_text = compiled.as_text()
    describe = hlo_fusion_index(hlo_text)

    out = g(params, x)
    jax.block_until_ready(out)
    n = 6
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(n):
            out = g(params, x)
        jax.block_until_ready(out)

    totals = summarize_trace(TRACE_DIR, n)
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    tot = sum(totals.values())
    print(f"total device op-time {tot:.1f} ms/step", flush=True)
    for name, ms in rows[:35]:
        print(f"{ms:8.2f} ms  {name:32s} {describe(name)}", flush=True)


if __name__ == "__main__":
    main()
