"""Training losses: L1, KL, LSGAN patch-adversarial.

Semantics match the reference trainers:
  * L1 — `nn.L1Loss()` mean reduction (unet/scripts/train_unet.py:106,149);
  * `kl_divergence(mu, logvar)` — the causal/BMGAN form
    -0.5*sum(1 + logvar - mu^2 - exp(logvar)) / batch
    (causal_synthesis/scripts/train_unify_causal_gen.py:57-73,
     bl_methods/BMGAN/train_bmgan.py:33-40 [per-sample sum, then mean]);
  * `patch_adversarial_loss` — MONAI PatchAdversarialLoss(criterion=
    "least_squares", no_activation_leastsq=True): MSE of raw patch logits
    against 1 (real) / 0 (fake); generator mode targets real on fakes
    (train_unet.py:77,154-157,177-184).

All reductions in fp32 for bf16-safe accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _flat2d(x: jax.Array) -> jax.Array:
    """(B, ..., C) -> (B, prod) view. The f32 convert of a (B,...,1) volume
    otherwise materialises batch-minor under remat — 16 lanes padded to 128,
    an 8x HBM expansion (504 MB at the flagship batch-16 shape, XLA alloc
    dump round 4); a wide minor dim makes the temporary unpadded."""
    return x.reshape(x.shape[0], -1)


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    pred, target = _flat2d(pred), _flat2d(target)
    return jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)).mean()


def l2_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    diff = _flat2d(pred).astype(jnp.float32) - _flat2d(target).astype(jnp.float32)
    return (diff * diff).mean()


def kl_divergence(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """KL(N(mu, exp(logvar)) || N(0, 1)), summed per sample, mean over batch."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    per_sample = -0.5 * jnp.sum(
        1.0 + logvar - jnp.square(mu) - jnp.exp(logvar),
        axis=tuple(range(1, mu.ndim)),
    )
    return per_sample.mean()


def patch_adversarial_loss(
    logits: jax.Array, *, target_is_real: bool, for_discriminator: bool
) -> jax.Array:
    """LSGAN loss on patch logits.

    Generator mode (for_discriminator=False) is only valid with
    target_is_real=True — the generator pushes fakes toward the real label.
    """
    if not for_discriminator and not target_is_real:
        raise ValueError("generator adversarial loss targets the real label")
    target = 1.0 if target_is_real else 0.0
    diff = logits.astype(jnp.float32) - target
    return (diff * diff).mean()


def lsgan_discriminator_loss(logits_fake: jax.Array, logits_real: jax.Array) -> jax.Array:
    """0.5 * (MSE(fake, 0) + MSE(real, 1)) — the reference's two-backward D step
    collapsed into one loss (train_unet.py:177-189)."""
    loss_fake = patch_adversarial_loss(logits_fake, target_is_real=False, for_discriminator=True)
    loss_real = patch_adversarial_loss(logits_real, target_is_real=True, for_discriminator=True)
    return 0.5 * (loss_fake + loss_real)
