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

# CIPS_PROBE_X64=1 runs the whole probe in float64: the packed-conv family
# is algebraically exact, so impl-vs-dense drift that vanishes at f64
# (rel <= ~1e-12) is f32 reassociation noise by construction, while a real
# tap/realign bug survives the dtype change. Used by the gate's
# noise-vs-bug calibration (VERDICT round 4, weak #1/#7).
_X64 = os.environ.get("CIPS_PROBE_X64", "") == "1"
if _X64:
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

_DTYPE = jnp.float64 if _X64 else jnp.float32


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
    import time

    t0 = time.time()

    def _mark(stage):
        print(f"[probe] {stage} at {time.time() - t0:.0f}s", file=sys.stderr, flush=True)

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
        dtype=_DTYPE,
    )
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)), _DTYPE)
    ctx = jnp.asarray(rng.standard_normal((1, 1, 5)), _DTYPE)
    params = unet.init(jax.random.key(0), x, ctx)
    # the output conv is zero-init — perturb every leaf deterministically so
    # the forward checksum actually covers the whole graph's values
    params = _perturb(params)
    if _X64:
        params = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), params)

    def loss_u(p):
        return jnp.mean(jnp.abs(unet.apply(p, x, ctx)))

    out, grads = jax.value_and_grad(loss_u)(params)
    res.update(_checksums("atten_unet", out, grads))
    _mark("atten_unet")

    # --- BMGAN dense-UNet generator (toy channels: the reference-sized
    # [128,256,256,512] stack takes minutes per CPU subprocess) ---
    from cips_tpu.models.bmgan import DenseUNetGenerator

    # toy widths EVERYWHERE: the default up/middle channels are the
    # production 512/256-wide stack, which made the f64 probe variant time
    # out on the single-core CI box (round-5 gate redesign log)
    g = DenseUNetGenerator(
        down_channels=(8, 16, 16, 32),
        middle_channels=32,
        up_channels=(32, 16, 16, 16, 8),
        input_conv_channel=8,
        output_conv_channel=8,
        dtype=_DTYPE,
    )
    t1 = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)), _DTYPE)
    z = jnp.asarray(rng.standard_normal((1, 8)), _DTYPE)
    gp = g.init(jax.random.key(1), t1, z)
    if _X64:
        gp = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), gp)

    def loss_g(p):
        return jnp.mean(jnp.abs(g.apply(p, t1, z)))

    out, grads = jax.value_and_grad(loss_g)(gp)
    res.update(_checksums("bmgan_g", out, grads))
    _mark("bmgan_g")

    # --- BMGAN ResNet encoder: covers the packed stem + strided packed
    # res-unit front end (ops/s2d.packed_conv_strided), which are
    # production-default in every BMGAN train step (VERDICT round 4 #5) ---
    from cips_tpu.models.bmgan import ResNetEncoder

    # s2d_depth=2 gates the deeper packed front end (re-packed strided
    # res_1) alongside the depth-1 production default — both share the
    # unpacked parameter tree, so one probe covers the candidate flip
    e = ResNetEncoder(
        channels=(16, 16, 16), input_layer_channel=8, s2d_depth=2, dtype=_DTYPE
    )
    pet = jnp.asarray(rng.standard_normal((1, 32, 32, 32, 1)), _DTYPE)
    ep = e.init(jax.random.key(2), pet)
    if _X64:
        ep = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), ep)

    def loss_e(p):
        mu, log_var = e.apply(p, pet)
        return jnp.mean(jnp.abs(mu)) + jnp.mean(jnp.abs(log_var))

    out, grads = jax.value_and_grad(loss_e)(ep)
    res.update(_checksums("bmgan_e", out, grads))
    _mark("bmgan_e")

    print(json.dumps(res))


if __name__ == "__main__":
    main()
