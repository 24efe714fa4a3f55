"""Op-level trace of the BMGAN E-phase grad (post s2d front end).

  python scripts/probe_bmgan_enc_trace.py
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

from cips_tpu.losses import kl_divergence
from cips_tpu.models.bmgan import ResNetEncoder
from trace_util import hlo_fusion_index, summarize_trace

DT = jnp.bfloat16
VOL = (96, 128, 96)


def main():
    e = ResNetEncoder(dtype=DT)
    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.random((2, *VOL, 1), np.float32), DT)
    ep = jax.jit(e.init)(jax.random.key(0), x2)

    def e_loss(ep_):
        mu, logvar = e.apply(ep_, x2)
        mr, mf = jnp.split(mu, 2, 0)
        lr_, lf = jnp.split(logvar, 2, 0)
        return kl_divergence(mr, lr_) + kl_divergence(mf, lf)

    g = jax.jit(jax.grad(e_loss))
    compiled = g.lower(ep).compile()
    describe = hlo_fusion_index(compiled.as_text())
    out = g(ep)
    jax.block_until_ready(out)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    n = 6
    tdir = "/tmp/trace_bmgan_enc"
    with jax.profiler.trace(tdir):
        for _ in range(n):
            out = g(ep)
        jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    totals = summarize_trace(tdir, n)
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f"total device op-time {sum(totals.values()):.1f} ms/step", flush=True)
    for name, ms in rows[:30]:
        print(f"{ms:8.2f} ms  {name:32s} {describe(name)}", flush=True)


if __name__ == "__main__":
    main()
