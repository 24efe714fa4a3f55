"""Causal unified generator training — the paper's core model.

TPU re-design of `causal_synthesis/scripts/train_unify_causal_gen.py`:
T1 -> spatial DiffusionModelEncoder -> 2*z-channel map split into
(z_mu, z_sigma) (:213-215); reparameterised samples feed (a) a plain VAE
Decoder reconstructing T1 (:217-218) and (b) a DiffusionModelDecoder
cross-attending to the covariate vector to synthesize PET (:222-224).
Causality factorisation: anatomy lives in the KL-constrained latent;
disease covariates enter only through cross-attention in the PET decoder.

Losses (config training_causal.json:88-94; loop :240-252):
  g_loss  = L1(PET) + 0.02*perceptual + 0.005*adv
  t1_loss = L1(T1) + 0.001*KL(z_mu, z_sigma)   [z_sigma fed as logvar,
            exactly as the reference's kl_divergence(z_mu, z_sigma) does]
  one Adam over encoder + both decoders on (g_loss + t1_loss);
  separate D step (:255-290). The reference re-encodes/decodes with the
  POST-update generator so D sees a fresh fake; by default the pre-update
  fake is reused under stop_gradient — a deliberate one-step-stale
  approximation (different training dynamics, same fixed points) that
  saves a full E+decoder forward per step. ``exact_d_fake=True`` (arg or
  config key) restores the reference's fresh-fake semantics exactly.
The reference's stale-`t1_rec` eval bug (:330) is not replicated.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from cips_tpu.losses import kl_divergence, l1_loss, lsgan_discriminator_loss, patch_adversarial_loss
from cips_tpu.models.autoencoder_kl import Decoder
from cips_tpu.models.decoder import DiffusionModelDecoder
from cips_tpu.models.discriminator import PatchDiscriminator
from cips_tpu.models.encoder import DiffusionModelEncoder
from cips_tpu.models.perceptual import PerceptualLoss
from cips_tpu.training.common import TrainState, adam


@struct.dataclass
class CausalState:
    gen: TrainState  # {"encoder": ..., "t1_decoder": ..., "pet_decoder": ...}
    d: TrainState
    p_params: Any
    step: jnp.ndarray


def build_models(model_cfg: Mapping[str, Any], n_covariates: int, dtype=jnp.bfloat16, remat: bool = True):
    """``remat`` defaults on — the causal trio at the (96,128,96) working
    volume exceeds HBM without per-block rematerialisation."""
    from cips_tpu.ops.s2d import auto_factor

    enc_def = dict(model_cfg["t1_autoencoder_def"]["atten_encoder"])
    enc_def["cross_attention_dim"] = max(n_covariates, 1)
    enc_def.setdefault("remat", remat)
    # the causal trio is mostly UNPACKED, where the "conv" policy saves
    # nothing and the backward re-ran whole blocks (measured grads at
    # 3.9-4.9x fwd); "conv_all" saves the padded unpacked conv outputs too
    # — batch-1/2 HBM affords it (scripts/probe_causal_parts.py).
    # CIPS_CAUSAL_POLICY=enc:POL[,t1:POL][,pet:POL] overrides per model for
    # fit/speed A/Bs (batch 4 is 210 MB over with conv_all everywhere; the
    # encoder's four 576 MB L0 saves are the marginal class — queue_r5 B1).
    pol = dict(
        kv.split(":", 1)  # type: ignore[misc]
        for kv in os.environ.get("CIPS_CAUSAL_POLICY", "").split(",")
        if ":" in kv
    )
    enc_def.setdefault("remat_policy", pol.get("enc", "conv_all"))
    # (2,1,1) packing makes the 64-channel full-resolution level exactly
    # 128 lanes (auto_factor)
    enc_def.setdefault("s2d", enc_def.get("spatial_dims", 3) == 3
                       and enc_def.get("resblock_updown", False)
                       and not list(enc_def.get("attention_levels", [True]))[0]
                       and auto_factor(list(enc_def.get("num_channels", [999]))[0]) is not None)
    encoder = DiffusionModelEncoder(head="spatial", dtype=dtype, **enc_def)

    t1_dec_def = dict(model_cfg["t1_autoencoder_def"]["decoder"])
    t1_dec_def.setdefault("remat", remat)
    t1_dec_def.setdefault("remat_policy", pol.get("t1", "conv_all"))
    # the finest level packs with its auto factor (32ch -> (2,2,1)): the
    # round-1 8x-dense loss at 32 channels is gone with anisotropic factors
    # — measured 1.26 vol/s (batch 1) == unpacked, and batch 2 fits HBM
    t1_dec_def.setdefault("s2d", t1_dec_def.get("spatial_dims", 3) == 3
                           and len(t1_dec_def.get("num_channels", [])) >= 2
                           and auto_factor(min(t1_dec_def.get("num_channels", [999]))) is not None)
    # "all" packs the decoders' attention-free middle levels too ((2,1,1)
    # at 64ch) — measured 2.27 vs 2.19 vol/s/chip over "finest" under the
    # halo conv (BENCH_NOTES round-4); exactness: tests/test_s2d.py:432-498
    s2d_levels = os.environ.get("CIPS_S2D_LEVELS", "all")
    t1_dec_def.setdefault("s2d_levels", s2d_levels)
    t1_decoder = Decoder(dtype=dtype, **t1_dec_def)

    pet_def = dict(model_cfg["pet_decoder_def"])
    pet_def["cross_attention_dim"] = max(n_covariates, 1)
    pet_def.setdefault("remat", remat)
    pet_def.setdefault("remat_policy", pol.get("pet", "conv_all"))
    pet_def.setdefault("s2d", pet_def.get("spatial_dims", 3) == 3
                       and len(pet_def.get("num_channels", [])) >= 2
                       and not list(pet_def.get("attention_levels", [True]))[-1]
                       and auto_factor(list(pet_def.get("num_channels", [999]))[-1]) is not None)
    pet_def.setdefault("s2d_levels", s2d_levels)
    pet_decoder = DiffusionModelDecoder(dtype=dtype, **pet_def)

    discriminator = PatchDiscriminator(dtype=dtype, **model_cfg.get("discriminator", {}))
    perceptual = PerceptualLoss(dtype=dtype, **model_cfg.get("perceptual_network", {}))
    return encoder, t1_decoder, pet_decoder, discriminator, perceptual


def init_state(
    rng: jax.Array,
    encoder: DiffusionModelEncoder,
    t1_decoder: Decoder,
    pet_decoder: DiffusionModelDecoder,
    discriminator: PatchDiscriminator,
    perceptual: Optional[PerceptualLoss],
    train_cfg: Mapping[str, Any],
    batch_shape: Tuple[int, ...],
    n_covariates: int,
) -> CausalState:
    re_, rd_, rp_, rl_ = jax.random.split(rng, 4)
    x = jnp.zeros(batch_shape, jnp.float32)
    ctx = jnp.zeros((batch_shape[0], 1, max(n_covariates, 1)), jnp.float32)

    enc_params = jax.jit(encoder.init)(re_, x)
    latent = jax.eval_shape(lambda p, v: encoder.apply(p, v), enc_params, x)
    z_ch = latent.shape[-1] // 2
    z = jnp.zeros(latent.shape[:-1] + (z_ch,), jnp.float32)
    t1_dec_params = jax.jit(t1_decoder.init)(rl_, z)
    pet_dec_params = jax.jit(pet_decoder.init)(rd_, z, ctx)
    d_params = jax.jit(discriminator.init)(rd_, x)
    p_params = None
    if perceptual is not None and train_cfg.get("perceptual_weight", 0) > 0:
        p_params = jax.jit(perceptual.init)(rp_, x, x)

    gen_params = {"encoder": enc_params, "t1_decoder": t1_dec_params, "pet_decoder": pet_dec_params}
    return CausalState(
        gen=TrainState.create(gen_params, adam(train_cfg.get("base_lr", 1e-4))),
        d=TrainState.create(d_params, adam(train_cfg.get("disc_lr", 1e-3))),
        p_params=p_params,
        step=jnp.zeros((), jnp.int32),
    )


def _split_latent(latent: jax.Array) -> Tuple[jax.Array, jax.Array]:
    z_ch = latent.shape[-1] // 2
    return latent[..., :z_ch], latent[..., z_ch:]


def make_train_step(
    encoder: DiffusionModelEncoder,
    t1_decoder: Decoder,
    pet_decoder: DiffusionModelDecoder,
    discriminator: PatchDiscriminator,
    perceptual: Optional[PerceptualLoss],
    train_cfg: Mapping[str, Any],
    exact_d_fake: Optional[bool] = None,
) -> Callable:
    pw = float(train_cfg.get("perceptual_weight", 0.02))
    aw = float(train_cfg.get("adv_weight", 0.005))
    kw = float(train_cfg.get("kl_weight", 0.001))
    if exact_d_fake is None:
        exact_d_fake = bool(train_cfg.get("exact_d_fake", False))
    # d_remat: recompute the D tower (and the perceptual net) inside the
    # G-step backward instead of saving their activations — trades one extra
    # forward each for the HBM that decides the marginal batch (see
    # unet_synthesis.make_train_step for the flagship numbers).
    d_remat = bool(train_cfg.get("d_remat", os.environ.get("CIPS_D_REMAT", "") == "1"))

    def train_step(
        state: CausalState, batch: Mapping[str, jax.Array], rng: jax.Array
    ) -> Tuple[CausalState, Dict]:
        t1, pet, info = batch["t1"], batch["pet"], batch["info"]
        r_t1, r_pet = jax.random.split(rng)

        def gen_loss_fn(gen_params):
            latent = encoder.apply(gen_params["encoder"], t1)
            z_mu, z_sigma = _split_latent(latent)
            eps_t1 = jax.random.normal(r_t1, z_sigma.shape, z_sigma.dtype)
            t1_rec = t1_decoder.apply(gen_params["t1_decoder"], z_mu + eps_t1 * z_sigma)
            eps_pet = jax.random.normal(r_pet, z_sigma.shape, z_sigma.dtype)
            rec_pet = pet_decoder.apply(gen_params["pet_decoder"], z_mu + eps_pet * z_sigma, info)

            rec_loss_pet = l1_loss(rec_pet, pet)
            rec_loss_t1 = l1_loss(t1_rec, t1)
            kl = kl_divergence(z_mu, z_sigma)  # z_sigma as logvar, reference :240-241
            if pw > 0 and state.p_params is not None:
                p_apply = lambda f: perceptual.apply(state.p_params, f, pet)  # noqa: E731
                if d_remat:
                    p_apply = jax.checkpoint(p_apply)
                p = p_apply(rec_pet)
            else:
                p = jnp.float32(0.0)
            if aw > 0:
                d_apply = lambda f: discriminator.apply(state.d.params, f)[-1]  # noqa: E731
                if d_remat:
                    d_apply = jax.checkpoint(d_apply)
                logits = d_apply(rec_pet)
                adv = patch_adversarial_loss(logits, target_is_real=True, for_discriminator=False)
            else:
                adv = jnp.float32(0.0)
            g_loss = rec_loss_pet + pw * p + aw * adv
            t1_loss = rec_loss_t1 + kw * kl
            aux = {
                "rec_pet_loss": rec_loss_pet,
                "rec_t1_loss": rec_loss_t1,
                "kl_loss": kl,
                "p_loss": p,
                "adv_loss": adv,
                "fake": rec_pet,
            }
            return g_loss + t1_loss, aux

        (total, aux), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(state.gen.params)
        new_gen = state.gen.apply_gradients(grads)

        metrics = {
            "g_loss": total,
            "rec_pet_loss": aux["rec_pet_loss"],
            "rec_t1_loss": aux["rec_t1_loss"],
            "kl_loss": aux["kl_loss"],
            "p_loss": aux["p_loss"] * pw,
            "adv_loss": aux["adv_loss"] * aw,
        }

        if aw > 0:
            if exact_d_fake:
                # reference semantics: D sees a fresh fake from the
                # POST-update encoder/decoder (train_unify_causal_gen.py
                # :255-263 re-runs the generator under no_grad) — costs one
                # extra E + PET-decoder forward per step
                latent = encoder.apply(new_gen.params["encoder"], t1)
                z_mu, z_sigma = _split_latent(latent)
                eps_d = jax.random.normal(r_pet, z_sigma.shape, z_sigma.dtype)
                fake = jax.lax.stop_gradient(
                    pet_decoder.apply(new_gen.params["pet_decoder"], z_mu + eps_d * z_sigma, info)
                )
            else:
                fake = jax.lax.stop_gradient(aux["fake"])

            def d_loss_fn(d_params):
                logits = discriminator.apply(d_params, jnp.concatenate([fake, pet], axis=0))[-1]
                logits_fake, logits_real = jnp.split(logits, 2, axis=0)
                return lsgan_discriminator_loss(logits_fake, logits_real)

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d.params)
            new_d = state.d.apply_gradients(d_grads)
            metrics["d_loss"] = d_loss
        else:
            new_d = state.d
            metrics["d_loss"] = jnp.float32(0.0)

        return CausalState(gen=new_gen, d=new_d, p_params=state.p_params, step=state.step + 1), metrics

    return train_step


def make_eval_step(
    encoder: DiffusionModelEncoder,
    t1_decoder: Decoder,
    pet_decoder: DiffusionModelDecoder,
) -> Callable:
    """Eval losses with fresh reconstructions (fixes the reference's stale
    t1_rec bug, train_unify_causal_gen.py:330)."""

    def eval_step(state: CausalState, batch: Mapping[str, jax.Array], rng: jax.Array) -> Dict:
        t1, pet, info = batch["t1"], batch["pet"], batch["info"]
        latent = encoder.apply(state.gen.params["encoder"], t1)
        z_mu, z_sigma = _split_latent(latent)
        eps = jax.random.normal(rng, z_sigma.shape, z_sigma.dtype)
        t1_rec = t1_decoder.apply(state.gen.params["t1_decoder"], z_mu + eps * z_sigma)
        rec_pet = pet_decoder.apply(state.gen.params["pet_decoder"], z_mu + eps * z_sigma, info)
        return {
            "rec_pet_loss": l1_loss(rec_pet, pet),
            "rec_t1_loss": l1_loss(t1_rec, t1),
            "fake": rec_pet,
            "t1_rec": t1_rec,
        }

    return eval_step


def make_generate_fn(
    encoder: DiffusionModelEncoder, pet_decoder: DiffusionModelDecoder
) -> Callable:
    """Inference path (gen_test_unify_causal.py:116-127): encode T1, sample
    the latent, decode PET conditioned on covariates."""

    def generate(gen_params, batch: Mapping[str, jax.Array], rng: jax.Array) -> jax.Array:
        latent = encoder.apply(gen_params["encoder"], batch["t1"])
        z_mu, z_sigma = _split_latent(latent)
        eps = jax.random.normal(rng, z_sigma.shape, z_sigma.dtype)
        return pet_decoder.apply(gen_params["pet_decoder"], z_mu + eps * z_sigma, batch["info"])

    return generate
