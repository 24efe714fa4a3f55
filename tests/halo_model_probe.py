"""Subprocess target for the full-model halo-conv equivalence gate.

`CIPS_PACKED_CONV` / `CIPS_HALO_REALIGN` are read once at import
(cips_tpu/ops/s2d.py), so each impl must run in a fresh interpreter: this
script builds a tiny-but-representative s2d-routed AttenUNet (multi-part
skip fusion, fold-tile up path, fold-pool down transitions) and the BMGAN
generator, runs forward + backward, and prints one JSON line of checksums
for the parent test to compare across impls.
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def _perturb(params):
    prng = np.random.default_rng(7)
    return jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(0.02 * prng.standard_normal(a.shape), a.dtype), params
    )


def _checksums(name, out, grads):
    gflat = jax.tree_util.tree_leaves(grads)
    return {
        f"{name}_out": float(jnp.sum(out).astype(jnp.float64)),
        f"{name}_gnorm": float(
            jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float64))) for g in gflat))
        ),
    }


def main():
    rng = np.random.default_rng(0)
    res = {}

    # --- AttenUNet (flagship generator), s2d on, all packed-conv sites ---
    from cips_tpu.models.atten_unet import AttenUNet

    unet = AttenUNet(
        spatial_dims=3,
        in_channels=1,
        out_channels=1,
        num_channels=(8, 16, 32),
        num_res_blocks=1,
        attention_levels=(False, False, True),
        norm_num_groups=8,
        resblock_updown=True,
        num_head_channels=(0, 0, 8),
        with_conditioning=True,
        cross_attention_dim=5,
        s2d=True,
    )
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 1, 5)), jnp.float32)
    params = unet.init(jax.random.key(0), x, ctx)
    # the output conv is zero-init — perturb every leaf deterministically so
    # the forward checksum actually covers the whole graph's values
    params = _perturb(params)

    def loss_u(p):
        return jnp.mean(jnp.abs(unet.apply(p, x, ctx)))

    out, grads = jax.value_and_grad(loss_u)(params)
    res.update(_checksums("atten_unet", out, grads))

    # --- BMGAN dense-UNet generator (toy channels: the reference-sized
    # [128,256,256,512] stack takes minutes per CPU subprocess) ---
    from cips_tpu.models.bmgan import DenseUNetGenerator

    g = DenseUNetGenerator(down_channels=(8, 16, 16, 32), dtype=jnp.float32)
    t1 = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    gp = g.init(jax.random.key(1), t1, z)

    def loss_g(p):
        return jnp.mean(jnp.abs(g.apply(p, t1, z)))

    out, grads = jax.value_and_grad(loss_g)(gp)
    res.update(_checksums("bmgan_g", out, grads))

    print(json.dumps(res))


if __name__ == "__main__":
    main()
