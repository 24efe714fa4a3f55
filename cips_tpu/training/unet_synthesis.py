"""Conditional AttenUNet T1->PET synthesis — the flagship workload.

TPU-native re-design of `unet/scripts/train_unet.py`:
  * G loss = L1 + perceptual_weight * perceptual + adv_weight * LSGAN
    (weights from the training config, unet/config/training.json:52-57;
    reference hot loop :136-168);
  * D loss = 0.5 * (MSE(fake->0) + MSE(real->1)) (:171-193);
  * `requires_grad` gating becomes two value_and_grad computations over
    separate parameter trees inside ONE jitted step;
  * the reference re-runs the generator AFTER the G optimiser step for the
    D phase (:175-176), so D trains on the post-update G's fake. By default
    this step reuses the pre-update fake under stop_gradient — a deliberate
    one-step-stale approximation that saves a full generator forward per
    step (different training dynamics, same fixed points). Set
    ``exact_d_fake=True`` (config key ``exact_d_fake``) to regenerate the
    fake with the updated parameters and match the reference exactly;
  * condition = covariate row as (B, 1, K), or zeros when unconditional
    (:142-145).

Batch layout is channels-last; under a mesh the batch is sharded on the
``data`` axis and XLA inserts the gradient psum (replaces DDP/NCCL).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from cips_tpu.losses import l1_loss, lsgan_discriminator_loss, patch_adversarial_loss
from cips_tpu.models.atten_unet import AttenUNet
from cips_tpu.models.discriminator import PatchDiscriminator
from cips_tpu.models.perceptual import PerceptualLoss
from cips_tpu.training.common import TrainState, adam

VOLUME_SHAPE = (96, 128, 96)


@struct.dataclass
class GANState:
    g: TrainState
    d: TrainState
    p_params: Any  # frozen perceptual-net params (None when weight == 0)
    step: jnp.ndarray


def build_models(
    model_cfg: Mapping[str, Any],
    n_covariates: int,
    dtype=jnp.bfloat16,
    remat: bool = True,
    remat_policy: Optional[str] = "conv12",
    s2d: Optional[bool] = None,
) -> Tuple[AttenUNet, PatchDiscriminator, PerceptualLoss]:
    """Construct G/D/perceptual from a reference-schema config dict
    (train_unet.py:61-77: cross_attention_dim := number of covariates).
    ``remat`` defaults on: at the (96,128,96) working volume the full
    backward's activation set does not fit 16GB HBM without it.
    ``s2d`` (space-to-depth level 0, exact math — BENCH_NOTES.md) defaults
    on whenever the config supports it."""
    unet_def = dict(model_cfg["atten_unet_def"])
    unet_def["cross_attention_dim"] = max(n_covariates, 1)
    unet_def["with_conditioning"] = True
    unet_def.setdefault("remat", remat)
    unet_def.setdefault("remat_policy", remat_policy if remat else None)
    if s2d is None:
        s2d = (
            unet_def.get("spatial_dims", 3) == 3
            and unet_def.get("resblock_updown", False)
            and not list(unet_def.get("attention_levels", [True]))[0]
        )
    unet_def.setdefault("s2d", s2d)
    # CIPS_S2D_FACTORS sweeps per-level packing without a config edit, e.g.
    # "222,221" packs level 0 at (2,2,2) and level 1 at (2,2,1); "0" skips a
    # level. Levels beyond the list stay unpacked (atten_unet.level_factors).
    # Default (no env, no config key): atten_unet.level_factors packs L0 +
    # an attention-free L1 — 16.75 vol/s/chip at the batch-16 optimum on v5e
    # (BENCH_NOTES round-4). At batch <= 8 L0-only measures faster — set
    # CIPS_S2D_FACTORS=222 there.
    sf = os.environ.get("CIPS_S2D_FACTORS")
    if sf and unet_def.get("s2d"):
        unet_def.setdefault(
            "s2d_factors",
            tuple(None if part == "0" else tuple(int(c) for c in part) for part in sf.split(",")),
        )
    generator = AttenUNet(dtype=dtype, **unet_def)
    discriminator = PatchDiscriminator(dtype=dtype, **model_cfg.get("discriminator", {}))
    perceptual = PerceptualLoss(dtype=dtype, **model_cfg.get("perceptual_network", {}))
    return generator, discriminator, perceptual


def init_state(
    rng: jax.Array,
    generator: AttenUNet,
    discriminator: PatchDiscriminator,
    perceptual: Optional[PerceptualLoss],
    train_cfg: Mapping[str, Any],
    batch_shape: Tuple[int, ...] = (1,) + VOLUME_SHAPE + (1,),
    n_covariates: int = 1,
) -> GANState:
    rg, rd, rp = jax.random.split(rng, 3)
    x = jnp.zeros(batch_shape, jnp.float32)
    ctx = jnp.zeros((batch_shape[0], 1, max(n_covariates, 1)), jnp.float32)
    # jitted init: one compiled program instead of thousands of eager dispatches
    g_params = jax.jit(generator.init)(rg, x, ctx)
    d_params = jax.jit(discriminator.init)(rd, x)
    p_params = None
    if perceptual is not None and train_cfg.get("perceptual_weight", 0) > 0:
        p_params = jax.jit(perceptual.init)(rp, x, x)
    return GANState(
        g=TrainState.create(g_params, adam(train_cfg.get("base_lr", 5e-4))),
        d=TrainState.create(d_params, adam(train_cfg.get("disc_lr", 1e-4))),
        p_params=p_params,
        step=jnp.zeros((), jnp.int32),
    )


def _condition(batch: Mapping[str, jax.Array], use_condition: bool) -> jax.Array:
    info = batch["info"]
    if info.shape[-1] == 0:
        info = jnp.zeros(info.shape[:-1] + (1,), jnp.float32)
    return info if use_condition else jnp.zeros_like(info)


def make_train_step(
    generator: AttenUNet,
    discriminator: PatchDiscriminator,
    perceptual: Optional[PerceptualLoss],
    train_cfg: Mapping[str, Any],
    use_condition: bool = True,
    exact_d_fake: Optional[bool] = None,
    split_d: Optional[bool] = None,
) -> Callable:
    pw = float(train_cfg.get("perceptual_weight", 0.0))
    aw = float(train_cfg.get("adv_weight", 0.1))
    if exact_d_fake is None:
        exact_d_fake = bool(train_cfg.get("exact_d_fake", False))
    if split_d is None:
        split_d = bool(train_cfg.get("split_d", False))
    # d_remat: recompute the discriminator tower inside the G-step backward
    # instead of saving its ~1.1 GB of activations at batch 16 full volume
    # (the two 576 MB transpose(jvp(PatchDiscriminator)) temporaries in the
    # L0+L1 OOM dump, BENCH_NOTES round-4) — the HBM enabler for packing
    # level 1; costs one extra D forward per G backward.
    d_remat = bool(train_cfg.get("d_remat", os.environ.get("CIPS_D_REMAT", "") == "1"))

    def train_step(state: GANState, batch: Mapping[str, jax.Array]) -> Tuple[GANState, Dict]:
        t1 = batch["t1"]
        pet = batch["pet"]
        cond = _condition(batch, use_condition)

        def g_loss_fn(g_params):
            fake = generator.apply(g_params, t1, cond)
            rec = l1_loss(fake, pet)
            if pw > 0 and state.p_params is not None:
                p_apply = lambda f: perceptual.apply(state.p_params, f, pet)  # noqa: E731
                if d_remat:
                    p_apply = jax.checkpoint(p_apply)
                p = p_apply(fake)
            else:
                p = jnp.float32(0.0)
            if aw > 0:
                d_apply = lambda f: discriminator.apply(state.d.params, f)[-1]  # noqa: E731
                if d_remat:
                    d_apply = jax.checkpoint(d_apply)
                logits = d_apply(fake)
                adv = patch_adversarial_loss(logits, target_is_real=True, for_discriminator=False)
            else:
                adv = jnp.float32(0.0)
            loss = rec + pw * p + aw * adv
            return loss, {"rec_loss": rec, "p_loss": p, "adv_loss": adv, "fake": fake}

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(state.g.params)
        new_g = state.g.apply_gradients(g_grads)

        metrics = {
            "g_loss": g_loss,
            "rec_loss": aux["rec_loss"],
            "p_loss": aux["p_loss"],
            "adv_loss": aux["adv_loss"] * aw,
        }

        if aw > 0:
            if exact_d_fake:
                # reference semantics: D sees the POST-update generator's
                # output (train_unet.py:175-176) — costs one extra G forward
                fake = jax.lax.stop_gradient(generator.apply(new_g.params, t1, cond))
            else:
                # one-step-stale fake from the pre-update G (see module doc)
                fake = jax.lax.stop_gradient(aux["fake"])

            def d_loss_fn(d_params):
                # PatchGAN is per-sample (convs + InstanceNorm), so batching
                # fake/real together equals the reference's two passes
                # (:175-184). ``split_d`` runs them separately instead —
                # identical math, half the transient D activation peak (the
                # enabler for batch 12 at full volume).
                if split_d:
                    logits_fake = discriminator.apply(d_params, fake)[-1]
                    logits_real = discriminator.apply(d_params, pet)[-1]
                else:
                    logits = discriminator.apply(d_params, jnp.concatenate([fake, pet], axis=0))[-1]
                    logits_fake, logits_real = jnp.split(logits, 2, axis=0)
                return lsgan_discriminator_loss(logits_fake, logits_real)

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d.params)
            new_d = state.d.apply_gradients(d_grads)
            metrics["d_loss"] = d_loss * aw
        else:
            new_d = state.d
            metrics["d_loss"] = jnp.float32(0.0)

        new_state = GANState(g=new_g, d=new_d, p_params=state.p_params, step=state.step + 1)
        return new_state, metrics

    return train_step


def make_eval_step(
    generator: AttenUNet,
    discriminator: PatchDiscriminator,
    perceptual: Optional[PerceptualLoss],
    train_cfg: Mapping[str, Any],
    use_condition: bool = True,
) -> Callable:
    """Per-epoch eval losses (train_unet.py:211-293), no parameter updates."""
    pw = float(train_cfg.get("perceptual_weight", 0.0))
    aw = float(train_cfg.get("adv_weight", 0.1))

    def eval_step(state: GANState, batch: Mapping[str, jax.Array]) -> Dict:
        t1, pet = batch["t1"], batch["pet"]
        cond = _condition(batch, use_condition)
        fake = generator.apply(state.g.params, t1, cond)
        rec = l1_loss(fake, pet)
        p = (
            perceptual.apply(state.p_params, fake, pet)
            if (pw > 0 and state.p_params is not None)
            else jnp.float32(0.0)
        )
        if aw > 0:
            logits = discriminator.apply(state.d.params, fake)[-1]
            adv = patch_adversarial_loss(logits, target_is_real=True, for_discriminator=False)
        else:
            adv = jnp.float32(0.0)
        return {
            "rec_loss": rec,
            "p_loss": p,
            "adv_loss": adv * aw,
            "g_loss": rec + pw * p + aw * adv,
            "fake": fake,
        }

    return eval_step


def make_predict_fn(generator: AttenUNet, use_condition: bool = True) -> Callable:
    """Jitted inference forward (output_predict.py:104-105)."""

    def predict(g_params, batch: Mapping[str, jax.Array]) -> jax.Array:
        return generator.apply(g_params, batch["t1"], _condition(batch, use_condition))

    return predict
