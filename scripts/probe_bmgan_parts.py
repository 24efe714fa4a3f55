"""BMGAN per-component timing on TPU: G fwd, G step, E step, D step.

  python scripts/probe_bmgan_parts.py
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

from cips_tpu.losses import kl_divergence, l1_loss, lsgan_discriminator_loss, patch_adversarial_loss
from cips_tpu.training import bmgan_task

VOL = (96, 128, 96)


def timeit(fn, *args, n=6):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: None, out)
    sync = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(sync.astype(jnp.float32)).item() if hasattr(sync, "astype") else 0.0)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync = jax.tree_util.tree_leaves(out)[0]
    jnp.sum(sync.astype(jnp.float32)).item()
    return (time.perf_counter() - t0) / n


def main():
    g, e, d, p = bmgan_task.build_models(dtype=jnp.bfloat16)
    shape = (1, *VOL, 1)
    state = bmgan_task.init_state(jax.random.key(0), g, e, d, p, shape, perceptual_weight=0.0)
    rng = np.random.default_rng(0)
    t1 = jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)
    pet = jnp.asarray(rng.random(shape, np.float32), jnp.bfloat16)
    z = jnp.asarray(rng.random((1, 8), np.float32), jnp.bfloat16)

    g_fwd = jax.jit(lambda gp: g.apply(gp, t1, z))
    print(f"G fwd            {timeit(g_fwd, state.g.params)*1e3:7.1f} ms", flush=True)

    def g_loss(gp):
        fake = g.apply(gp, t1, z)
        logits = d.apply(state.d.params, fake)
        adv = patch_adversarial_loss(logits, target_is_real=True, for_discriminator=False)
        return adv + 20.0 * l1_loss(fake, pet)

    g_grad = jax.jit(jax.grad(g_loss))
    print(f"G grad           {timeit(g_grad, state.g.params)*1e3:7.1f} ms", flush=True)

    # the honest G step pays lamda_perceptual=8 of LPIPS compute
    # (train_bmgan.py:157,324) — time it separately and inside the G grad
    state_p = bmgan_task.init_state(jax.random.key(0), g, e, d, p, shape, perceptual_weight=8.0)
    if state_p.p_params is not None:
        p_fwd = jax.jit(lambda x, y: p.apply(state_p.p_params, x, y))
        print(f"P fwd            {timeit(p_fwd, pet, t1)*1e3:7.1f} ms", flush=True)

        def g_loss_p(gp):
            fake_ = g.apply(gp, t1, z)
            logits = d.apply(state_p.d.params, fake_)
            adv = patch_adversarial_loss(logits, target_is_real=True, for_discriminator=False)
            return adv + 20.0 * l1_loss(fake_, pet) + 8.0 * p.apply(state_p.p_params, fake_, pet)

        g_grad_p = jax.jit(jax.grad(g_loss_p))
        print(f"G grad +P8       {timeit(g_grad_p, state_p.g.params)*1e3:7.1f} ms", flush=True)

    fake = jax.jit(lambda gp: g.apply(gp, t1, z))(state.g.params)

    def e_loss(ep):
        mu, logvar = e.apply(ep, jnp.concatenate([pet, fake], axis=0))
        mr, mf = jnp.split(mu, 2, 0)
        lr_, lf = jnp.split(logvar, 2, 0)
        return kl_divergence(mr, lr_) + kl_divergence(mf, lf)

    e_grad = jax.jit(jax.grad(e_loss))
    print(f"E grad           {timeit(e_grad, state.e.params)*1e3:7.1f} ms", flush=True)

    def d_loss(dp):
        logits = d.apply(dp, jnp.concatenate([fake, pet], axis=0))
        lf, lr_ = jnp.split(logits, 2, 0)
        return lsgan_discriminator_loss(lf, lr_)

    d_grad = jax.jit(jax.grad(d_loss))
    print(f"D grad           {timeit(d_grad, state.d.params)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
