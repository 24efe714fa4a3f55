"""BMGAN training — bidirectional-mapping GAN baseline.

TPU re-design of `bl_methods/BMGAN/train_bmgan.py`'s three-optimiser loop
(:140-205): per step,
  G: adv(D(G(t1, z)) -> real) + lamda_l1 * L1 + lamda_perceptual * perceptual
     (:148-161; defaults lamda_l1=20, lamda_perceptual=8, :323-324);
  E: KL(E(real_pet)) + KL(E(fake_pet)) (:163-180, kl_divergence :33-40);
  D: LSGAN 0.5*(MSE(fake->0) + MSE(real->1)) (:183-200).
No covariates (need_values=[], :110-113).

All three updates run inside ONE jitted step with separate optimiser
states; by default the reference's two extra no-grad generator re-forwards
(:169-171, :189-191) are replaced by reusing the stop-gradiented fake —
identical losses, two full G forwards saved per step, one-step-stale
dynamics. ``exact_d_fake=True`` restores the reference's post-update fake
exactly (one extra G forward; measured stale-vs-exact delta in
BENCH_NOTES.md).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from cips_tpu.losses import kl_divergence, l1_loss, lsgan_discriminator_loss, patch_adversarial_loss
from cips_tpu.models.bmgan import BMGANDiscriminator, DenseUNetGenerator, ResNetEncoder
from cips_tpu.models.perceptual import PerceptualLoss
from cips_tpu.training.common import TrainState, adam


@struct.dataclass
class BMGANState:
    g: TrainState
    e: TrainState
    d: TrainState
    p_params: Any
    step: jnp.ndarray


def build_models(dtype=jnp.bfloat16, latent_dim: int = 8, remat: bool = False,
                 remat_policy: str = "conv_all"):
    generator = DenseUNetGenerator(dtype=dtype, latent_dim=latent_dim, remat=remat,
                                   remat_policy=remat_policy)
    # encoder packed-front depth: 1 = stem+res_0 (round-4 default); 2 also
    # runs res_1 strided-packed at (2,1,1). Exact either way; default follows
    # the TPU A/B in BENCH_NOTES round 5 (depth 2: 3.378 vs 3.246/3.258).
    enc_depth = int(os.environ.get("CIPS_BMGAN_ENC_PACK", "2"))
    encoder = ResNetEncoder(dtype=dtype, latent_dim=latent_dim, s2d_depth=enc_depth)
    discriminator = BMGANDiscriminator(dtype=dtype)
    # reference: PerceptualLoss(spatial_dims=3) with no network_type
    # (bl_methods/BMGAN/train_bmgan.py:73) -> the MONAI default, AlexNet LPIPS
    perceptual = PerceptualLoss(spatial_dims=3, network_type="alex", dtype=dtype)
    return generator, encoder, discriminator, perceptual


def init_state(
    rng: jax.Array,
    generator: DenseUNetGenerator,
    encoder: ResNetEncoder,
    discriminator: BMGANDiscriminator,
    perceptual: PerceptualLoss,
    batch_shape: Tuple[int, ...],
    lr: float = 2e-4,
    latent_dim: int = 8,
    perceptual_weight: float = 8.0,
) -> BMGANState:
    rg, re, rd, rp = jax.random.split(rng, 4)
    x = jnp.zeros(batch_shape, jnp.float32)
    z = jnp.zeros((batch_shape[0], latent_dim), jnp.float32)
    g_params = jax.jit(generator.init)(rg, x, z)
    e_params = jax.jit(encoder.init)(re, x)
    d_params = jax.jit(discriminator.init)(rd, x)
    p_params = jax.jit(perceptual.init)(rp, x, x) if perceptual_weight > 0 else None
    return BMGANState(
        g=TrainState.create(g_params, adam(lr)),
        e=TrainState.create(e_params, adam(lr)),
        d=TrainState.create(d_params, adam(lr)),
        p_params=p_params,
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    generator: DenseUNetGenerator,
    encoder: ResNetEncoder,
    discriminator: BMGANDiscriminator,
    perceptual: PerceptualLoss,
    lamda_l1: float = 20.0,
    lamda_perceptual: float = 8.0,
    latent_dim: int = 8,
    exact_d_fake: bool = False,
    d_remat: Optional[bool] = None,
) -> Callable:
    """``exact_d_fake`` reproduces the reference's semantics exactly: the E
    and D phases see the POST-update generator's fake (train_bmgan.py
    :168-169, :188-190 re-forward G with no_grad after the G step) at the
    cost of one extra generator forward per step. Default reuses the
    pre-update fake (one-step stale; same fixed points — module doc).
    ``d_remat`` recomputes the D tower and the LPIPS net inside the G-step
    backward instead of saving their activations (HBM-for-FLOPs; the knob
    that decides the marginal batch)."""
    if d_remat is None:
        d_remat = os.environ.get("CIPS_D_REMAT", "") == "1"

    def train_step(
        state: BMGANState, batch: Mapping[str, jax.Array], rng: jax.Array
    ) -> Tuple[BMGANState, Dict]:
        t1, pet = batch["t1"], batch["pet"]
        z = jax.random.normal(rng, (t1.shape[0], latent_dim), t1.dtype)

        def g_loss_fn(g_params):
            fake = generator.apply(g_params, t1, z)
            d_apply = lambda f: discriminator.apply(state.d.params, f)  # noqa: E731
            if d_remat:
                d_apply = jax.checkpoint(d_apply)
            logits_fake = d_apply(fake)
            adv = patch_adversarial_loss(logits_fake, target_is_real=True, for_discriminator=False)
            rec = l1_loss(fake, pet)
            if lamda_perceptual > 0 and state.p_params is not None:
                p_apply = lambda f: perceptual.apply(state.p_params, f, pet)  # noqa: E731
                if d_remat:
                    p_apply = jax.checkpoint(p_apply)
                p = p_apply(fake)
            else:
                p = jnp.float32(0.0)
            loss = adv + lamda_l1 * rec + lamda_perceptual * p
            return loss, {"l1": rec, "adv": adv, "p": p, "fake": fake}

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(state.g.params)
        new_g = state.g.apply_gradients(g_grads)
        if exact_d_fake:
            fake = jax.lax.stop_gradient(generator.apply(new_g.params, t1, z))
        else:
            fake = jax.lax.stop_gradient(aux["fake"])

        def e_loss_fn(e_params):
            # one batched E pass over [real; fake]
            mu, logvar = encoder.apply(e_params, jnp.concatenate([pet, fake], axis=0))
            mu_r, mu_f = jnp.split(mu, 2, axis=0)
            logvar_r, logvar_f = jnp.split(logvar, 2, axis=0)
            return kl_divergence(mu_r, logvar_r) + kl_divergence(mu_f, logvar_f)

        e_loss, e_grads = jax.value_and_grad(e_loss_fn)(state.e.params)
        new_e = state.e.apply_gradients(e_grads)

        def d_loss_fn(d_params):
            logits = discriminator.apply(d_params, jnp.concatenate([fake, pet], axis=0))
            logits_fake, logits_real = jnp.split(logits, 2, axis=0)
            return lsgan_discriminator_loss(logits_fake, logits_real)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d.params)
        new_d = state.d.apply_gradients(d_grads)

        metrics = {
            "g_loss": g_loss,
            "l1_loss": aux["l1"],
            "adv_loss": aux["adv"],
            "p_loss": aux["p"],
            "e_loss": e_loss,
            "d_loss": d_loss,
        }
        return (
            BMGANState(g=new_g, e=new_e, d=new_d, p_params=state.p_params, step=state.step + 1),
            metrics,
        )

    return train_step


def make_eval_step(generator: DenseUNetGenerator, latent_dim: int = 8) -> Callable:
    """Eval = L1 of a generation with a sampled latent (train_bmgan.py:209-246;
    best.ckpt tracks eval L1 :280-291)."""

    def eval_step(state: BMGANState, batch: Mapping[str, jax.Array], rng: jax.Array) -> Dict:
        t1, pet = batch["t1"], batch["pet"]
        z = jax.random.normal(rng, (t1.shape[0], latent_dim), t1.dtype)
        fake = generator.apply(state.g.params, t1, z)
        return {"l1_loss": l1_loss(fake, pet), "fake": fake}

    return eval_step
