"""Op-level trace of _InstanceNorm fwd and grad at the BMGAN full-res shape.

The IN micro measures 4.2 ms fwd / 4.0 ms grad at (1,96,128,96,64) — ~7x
the ~0.55 ms HBM bound for 3 reads + 1 write.  Attribute.

  python scripts/probe_in_trace.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cips_tpu.models.discriminator import _InstanceNorm
from trace_util import hlo_fusion_index, summarize_trace

DT = jnp.bfloat16


def run(label, fn, *args):
    g = jax.jit(fn)
    out = g(*args)
    jax.block_until_ready(out)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    hlo_text = g.lower(*args).compile().as_text()
    describe = hlo_fusion_index(hlo_text)
    tdir = f"/tmp/trace_in_{label}"
    n = 8
    with jax.profiler.trace(tdir):
        for _ in range(n):
            out = g(*args)
        jax.block_until_ready(out)
        jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    totals = summarize_trace(tdir, n)
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f"== {label}: total {sum(totals.values()):.2f} ms/step", flush=True)
    for name, ms in rows[:12]:
        print(f"{ms:8.2f} ms  {name:32s} {describe(name)}", flush=True)


def main():
    shape = (1, 96, 128, 96, 64)
    mod = _InstanceNorm()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(shape, np.float32), DT)
    params = mod.init(jax.random.key(0), x)

    run("fwd", mod.apply, params, x)
    run("grad", jax.grad(lambda p_, x_: jnp.sum(mod.apply(p_, x_).astype(jnp.float32)), argnums=(0, 1)), params, x)


if __name__ == "__main__":
    main()
