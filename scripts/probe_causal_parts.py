"""Causal-trio per-component timing on TPU: encoder/decoders/D fwd + grads.

  python scripts/probe_causal_parts.py
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

from cips_tpu.cli import common
from cips_tpu.losses import l1_loss
from cips_tpu.training import causal_task

VOL = (96, 128, 96)


def timeit(fn, *args, n=6):
    out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    return (time.perf_counter() - t0) / n


def main():
    cfg = common.load_config(None, "training_causal.json")
    enc, t1_dec, pet_dec, disc, perc = causal_task.build_models(cfg, n_covariates=5, dtype=jnp.bfloat16)
    shape = (1, *VOL, 1)
    state = causal_task.init_state(
        jax.random.key(0), enc, t1_dec, pet_dec, disc, perc, cfg["training"], shape, n_covariates=5
    )
    gp = state.gen.params
    rng = np.random.default_rng(0)
    t1 = jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)
    pet = jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)
    info = jnp.asarray(rng.random((1, 1, 5), np.float32), jnp.bfloat16)

    enc_fwd = jax.jit(lambda p: enc.apply(p, t1))
    print(f"encoder fwd      {timeit(enc_fwd, gp['encoder'])*1e3:7.1f} ms", flush=True)
    latent = enc_fwd(gp["encoder"])
    z = latent[..., : latent.shape[-1] // 2]

    t1d_fwd = jax.jit(lambda p: t1_dec.apply(p, z))
    print(f"t1 decoder fwd   {timeit(t1d_fwd, gp['t1_decoder'])*1e3:7.1f} ms", flush=True)
    petd_fwd = jax.jit(lambda p: pet_dec.apply(p, z, info))
    print(f"pet decoder fwd  {timeit(petd_fwd, gp['pet_decoder'])*1e3:7.1f} ms", flush=True)

    enc_grad = jax.jit(jax.grad(lambda p: jnp.mean(jnp.square(enc.apply(p, t1).astype(jnp.float32)))))
    print(f"encoder grad     {timeit(enc_grad, gp['encoder'])*1e3:7.1f} ms", flush=True)
    t1d_grad = jax.jit(jax.grad(lambda p: l1_loss(t1_dec.apply(p, z), t1)))
    print(f"t1 decoder grad  {timeit(t1d_grad, gp['t1_decoder'])*1e3:7.1f} ms", flush=True)
    petd_grad = jax.jit(jax.grad(lambda p: l1_loss(pet_dec.apply(p, z, info), pet)))
    print(f"pet decoder grad {timeit(petd_grad, gp['pet_decoder'])*1e3:7.1f} ms", flush=True)

    from cips_tpu.losses import lsgan_discriminator_loss

    def d_loss(dp):
        logits = disc.apply(dp, jnp.concatenate([pet, t1], axis=0))[-1]
        lf, lr_ = jnp.split(logits, 2, 0)
        return lsgan_discriminator_loss(lf, lr_)

    d_grad = jax.jit(jax.grad(d_loss))
    print(f"D grad           {timeit(d_grad, state.d.params)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
