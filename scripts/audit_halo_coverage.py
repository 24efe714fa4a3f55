"""Audit: which conv sites run the halo formulation vs dense k3.

Traces the flagship train step (and optionally the causal/BMGAN steps) on
CPU and histograms every conv_general_dilated by (kernel extent, channels).
Under CIPS_PACKED_CONV=halo every k=3 PACKED site should lower to a
(2,2,2)-extent conv; remaining (3,3,3) convs must be the unpacked coarse
levels / pooled down-transitions only. Run:

    CIPS_PACKED_CONV=halo CIPS_PLATFORM=cpu python scripts/audit_halo_coverage.py [flagship|causal|bmgan]
"""

from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np


def count_convs(jaxpr, hist):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
            dn = eqn.params["dimension_numbers"]
            kshape = tuple(rhs.shape[d] for d in dn.rhs_spec[2:])
            cin = rhs.shape[dn.rhs_spec[1]]
            cout = rhs.shape[dn.rhs_spec[0]]
            hist[(kshape, cin, cout, tuple(lhs.shape))] += 1
        for sub in _subjaxprs(eqn.params):
            count_convs(sub, hist)
    return hist


def _subjaxprs(params):
    out = []

    def walk(v):
        if hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):  # ClosedJaxpr
            out.append(v.jaxpr)
        elif hasattr(v, "eqns"):  # Jaxpr
            out.append(v)
        elif isinstance(v, (tuple, list)):
            for x in v:
                walk(x)

    for v in params.values():
        walk(v)
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "flagship"
    rng = np.random.default_rng(0)
    batch = 2
    vol = (96, 128, 96)

    if which == "flagship":
        import jax.numpy as jnp

        from __graft_entry__ import FLAGSHIP_CFG, N_COVARIATES, TRAIN_CFG
        from cips_tpu.training.unet_synthesis import build_models, init_state, make_train_step

        g, d, p = build_models(
            FLAGSHIP_CFG, n_covariates=N_COVARIATES, dtype=jnp.bfloat16, remat_policy="conv12"
        )
        state = init_state(
            jax.random.key(0), g, d, p, TRAIN_CFG,
            batch_shape=(1, *vol, 1), n_covariates=N_COVARIATES,
        )
        data = {
            "t1": jnp.asarray(rng.random((batch, *vol, 1), np.float32), jnp.bfloat16),
            "pet": jnp.asarray(rng.random((batch, *vol, 1), np.float32), jnp.bfloat16),
            "info": jnp.asarray(rng.random((batch, 1, N_COVARIATES), np.float32), jnp.bfloat16),
        }
        step = make_train_step(g, d, p, TRAIN_CFG, split_d=True)
        closed = jax.make_jaxpr(lambda s, b: step(s, b))(state, data)
    elif which == "bmgan":
        import jax.numpy as jnp

        from cips_tpu.training import bmgan_task

        g, e, d, p = bmgan_task.build_models(dtype=jnp.bfloat16)
        shape = (batch, *vol, 1)
        state = bmgan_task.init_state(jax.random.key(0), g, e, d, p, (1, *vol, 1), perceptual_weight=0.0)
        data = {
            "t1": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
            "pet": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
        }
        step = bmgan_task.make_train_step(g, e, d, p, 20.0, 0.0)
        closed = jax.make_jaxpr(lambda s, b, k: step(s, b, k))(state, data, jax.random.key(1))
    elif which == "causal":
        import jax.numpy as jnp

        from cips_tpu.cli import common
        from cips_tpu.training import causal_task

        cfg = common.load_config(None, "training_causal.json")
        enc, t1_dec, pet_dec, disc, perc = causal_task.build_models(cfg, n_covariates=5, dtype=jnp.bfloat16)
        state = causal_task.init_state(
            jax.random.key(0), enc, t1_dec, pet_dec, disc, perc, cfg["training"], (1, *vol, 1), n_covariates=5
        )
        shape = (batch, *vol, 1)
        data = {
            "t1": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
            "pet": jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16),
            "info": jnp.asarray(rng.random((batch, 1, 5), np.float32), jnp.bfloat16),
        }
        step = causal_task.make_train_step(enc, t1_dec, pet_dec, disc, perc, cfg["training"])
        closed = jax.make_jaxpr(lambda s, b, k: step(s, b, k))(state, data, jax.random.key(1))
    else:
        raise SystemExit(f"unknown target {which}")

    hist = count_convs(closed.jaxpr, collections.Counter())
    total = sum(hist.values())
    print(f"{total} conv sites (jaxpr, fwd only — backward adds transposes):")
    for (kshape, cin, cout, lhs), n in sorted(hist.items(), key=lambda kv: -kv[1]):
        # Halo kernels have extent 2 on every packed axis (3 on unpacked
        # ones); a dense k3 kernel never has a 2 anywhere.
        tag = "k1" if max(kshape) == 1 else ("HALO" if 2 in kshape else "k3")
        print(f"  {n:3d}x {tag:4s} k={kshape} {cin:4d}->{cout:<4d} lhs={lhs}")


if __name__ == "__main__":
    main()
