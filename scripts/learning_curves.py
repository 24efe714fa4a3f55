"""Learning-curve regression harness (ROADMAP quality item 9).

Runs every workload's REAL jitted train step at toy scale on fixed
structured synthetic data (pet = clipped affine map of t1 + noise; labels
follow a linear rule on the covariates) and records the full loss
trajectory. Output goes to LEARNING_CURVES.json; when a committed
LEARNING_CURVES_REF.json exists the final losses are compared against it
so a round-over-round change in optimisation *dynamics* — not just
liveness — fails loudly.

Runs on CPU in a couple of minutes:

  python scripts/learning_curves.py            # write + compare
  python scripts/learning_curves.py --update   # re-baseline the REF file

Tolerance is deliberately loose (25% relative on final loss): the point is
catching sign flips, divergence, or silently disabled loss terms, not pinning
floating-point noise across XLA versions.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if not os.environ.get("CIPS_CURVES_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "LEARNING_CURVES.json")
REF = os.path.join(REPO, "LEARNING_CURVES_REF.json")
RTOL = 0.25

VOL = (8, 16, 8)


def _pair_batch(rng, b, k):
    t1 = rng.random((b, *VOL, 1), np.float32)
    pet = np.clip(t1 * 0.8 + 0.1 * rng.random((b, *VOL, 1), np.float32), 0, 1)
    out = {"t1": jnp.asarray(t1), "pet": jnp.asarray(pet)}
    if k:
        out["info"] = jnp.asarray(rng.random((b, 1, k), np.float32))
    return out


EVAL_EVERY = 5


def _eval_metrics(fake, pet):
    """MAE + MS-SSIM (k5 sigma0.5 as in cli.output_predict; scale count
    degrades gracefully at toy volumes) of generated vs target PET."""
    from cips_tpu.ops.metrics import mae, ms_ssim

    return (
        float(mae(fake, pet)),
        float(ms_ssim(fake[..., 0], pet[..., 0], kernel_size=5, sigma=0.5)),
    )


def flagship(steps=30):
    from cips_tpu.training.unet_synthesis import build_models, init_state, make_train_step

    cfg = {
        "atten_unet_def": {
            "spatial_dims": 3, "in_channels": 1, "out_channels": 1,
            "num_channels": [8, 8], "num_res_blocks": 1,
            "attention_levels": [False, True], "norm_num_groups": 8,
            "norm_eps": 1e-6, "resblock_updown": True, "num_head_channels": [0, 4],
        },
        "discriminator": {"num_channels": 8, "num_layers_d": 1},
        "perceptual_network": {"spatial_dims": 3},
    }
    tcfg = {"base_lr": 1e-3, "disc_lr": 1e-4, "perceptual_weight": 0, "adv_weight": 0.1}
    g, d, p = build_models(cfg, n_covariates=3, dtype=jnp.float32)
    state = init_state(jax.random.key(0), g, d, p, tcfg, batch_shape=(2, *VOL, 1), n_covariates=3)
    step = jax.jit(make_train_step(g, d, p, tcfg))
    batch = _pair_batch(np.random.default_rng(0), 2, 3)
    heldout = _pair_batch(np.random.default_rng(100), 2, 3)

    @jax.jit
    def gen(g_params, b):
        return g.apply(g_params, b["t1"], b["info"])

    rec, dl, emae, emsssim = [], [], [], []
    for i in range(steps):
        state, m = step(state, batch)
        rec.append(float(m["rec_loss"]))
        dl.append(float(m["d_loss"]))
        if (i + 1) % EVAL_EVERY == 0:
            a, s = _eval_metrics(gen(state.g.params, heldout), heldout["pet"])
            emae.append(a)
            emsssim.append(s)
    return {"rec_loss": rec, "d_loss": dl, "eval_mae": emae, "eval_ms_ssim": emsssim}


def bmgan(steps=30):
    from cips_tpu.models.bmgan import BMGANDiscriminator, DenseUNetGenerator, ResNetEncoder
    from cips_tpu.models.perceptual import PerceptualLoss
    from cips_tpu.training import bmgan_task

    g = DenseUNetGenerator(input_conv_channel=4, down_channels=(4, 8),
                           middle_channels=8, up_channels=(8, 4, 4))
    e = ResNetEncoder(input_layer_channel=4, channels=(4, 8))
    d = BMGANDiscriminator(num_layers_d=1)
    p = PerceptualLoss(spatial_dims=3)
    shape = (1, 16, 16, 16, 1)
    state = bmgan_task.init_state(jax.random.key(0), g, e, d, p, shape, perceptual_weight=0.0)
    step = jax.jit(bmgan_task.make_train_step(g, e, d, p, lamda_perceptual=0.0))
    rng = np.random.default_rng(1)
    t1 = rng.random(shape, np.float32)
    batch = {"t1": jnp.asarray(t1),
             "pet": jnp.asarray(np.clip(t1 * 0.8 + 0.1 * rng.random(shape, np.float32), 0, 1))}
    ev = jax.jit(bmgan_task.make_eval_step(g))
    rng2 = np.random.default_rng(101)
    t1h = rng2.random(shape, np.float32)
    heldout = {"t1": jnp.asarray(t1h),
               "pet": jnp.asarray(np.clip(t1h * 0.8 + 0.1 * rng2.random(shape, np.float32), 0, 1))}
    l1, dl, el, emae, emsssim = [], [], [], [], []
    for i in range(steps):
        state, m = step(state, batch, jax.random.key(i))
        l1.append(float(m["l1_loss"]))
        dl.append(float(m["d_loss"]))
        el.append(float(m["e_loss"]))
        if (i + 1) % EVAL_EVERY == 0:
            em = ev(state, heldout, jax.random.key(1000))
            a, s = _eval_metrics(em["fake"], heldout["pet"])
            emae.append(a)
            emsssim.append(s)
    return {"l1_loss": l1, "d_loss": dl, "e_loss": el,
            "eval_mae": emae, "eval_ms_ssim": emsssim}


def causal(steps=30):
    from cips_tpu.training import causal_task

    cfg = {
        "t1_autoencoder_def": {
            "atten_encoder": {
                "spatial_dims": 3, "in_channels": 1, "out_channels": 6,
                "num_channels": [8, 8], "num_res_blocks": 1,
                "attention_levels": [False, True], "norm_num_groups": 8,
                "resblock_updown": True, "num_head_channels": [0, 4],
                "with_conditioning": True,
            },
            "decoder": {
                "spatial_dims": 3, "in_channels": 3, "out_channels": 1,
                "num_channels": [8, 8], "num_res_blocks": 1, "norm_num_groups": 8,
                "attention_levels": [False, False],
            },
        },
        "pet_decoder_def": {
            "spatial_dims": 3, "in_channels": 3, "out_channels": 1,
            "num_channels": [8, 8], "num_res_blocks": 1, "norm_num_groups": 8,
            "attention_levels": [True, False], "num_head_channels": [4, 0],
            "with_conditioning": True,
        },
        "discriminator": {"num_channels": 8, "num_layers_d": 1},
        "perceptual_network": {"spatial_dims": 3},
    }
    tcfg = {"base_lr": 1e-3, "disc_lr": 1e-3, "perceptual_weight": 0,
            "adv_weight": 0.005, "kl_weight": 0.001}
    enc, t1_dec, pet_dec, disc, perc = causal_task.build_models(cfg, n_covariates=4, dtype=jnp.float32)
    shape = (2, *VOL, 1)
    state = causal_task.init_state(jax.random.key(0), enc, t1_dec, pet_dec, disc, perc,
                                   tcfg, shape, n_covariates=4)
    step = jax.jit(causal_task.make_train_step(enc, t1_dec, pet_dec, disc, perc, tcfg))
    batch = _pair_batch(np.random.default_rng(2), 2, 4)
    heldout = _pair_batch(np.random.default_rng(102), 2, 4)
    ev = jax.jit(causal_task.make_eval_step(enc, t1_dec, pet_dec))
    pet, t1, emae, emsssim = [], [], [], []
    for i in range(steps):
        state, m = step(state, batch, jax.random.key(i))
        pet.append(float(m["rec_pet_loss"]))
        t1.append(float(m["rec_t1_loss"]))
        if (i + 1) % EVAL_EVERY == 0:
            em = ev(state, heldout, jax.random.key(1000))
            a, s = _eval_metrics(em["fake"], heldout["pet"])
            emae.append(a)
            emsssim.append(s)
    return {"rec_pet_loss": pet, "rec_t1_loss": t1,
            "eval_mae": emae, "eval_ms_ssim": emsssim}


def classifier(steps=40):
    from cips_tpu.training import classifier_task

    cfg = {"atten_encoder_def": {
        "spatial_dims": 3, "in_channels": 2, "out_channels": 2,
        "num_channels": [8, 8], "num_res_blocks": 1,
        "attention_levels": [False, True], "norm_num_groups": 8,
        "resblock_updown": True, "num_head_channels": [0, 4],
    }, "training": {"base_lr": 1e-3}}
    model = classifier_task.build_model(cfg, in_channels=2, n_covariates=3, dtype=jnp.float32)
    shape = (8, *VOL, 2)
    state = classifier_task.init_state(jax.random.key(0), model, shape, n_covariates=3)
    step = jax.jit(classifier_task.make_train_step(model, use_tabular=True))
    rng = np.random.default_rng(3)
    info = rng.random((8, 1, 3), np.float32)
    labels = (info[:, 0, :].sum(-1) > 1.5).astype(np.int32)  # linear rule on covariates
    batch = {
        "imgs": jnp.asarray(rng.random(shape, np.float32)),
        "info": jnp.asarray(info),
        "labels": jnp.asarray(labels),
    }
    ce, acc = [], []
    for i in range(steps):
        state, m = step(state, batch, jax.random.key(i))
        ce.append(float(m["ce_loss"]))
        acc.append(float(m["accuracy"]))
    return {"ce_loss": ce, "accuracy": acc}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true", help="rewrite LEARNING_CURVES_REF.json")
    args = ap.parse_args()

    curves = {}
    for name, fn in (("flagship", flagship), ("bmgan", bmgan),
                     ("causal", causal), ("classifier", classifier)):
        curves[name] = fn()
        finals = {k: round(v[-1], 5) for k, v in curves[name].items()}
        drops = {k: round(v[0] - v[-1], 5) for k, v in curves[name].items()}
        print(f"{name}: final={finals} drop={drops}", flush=True)

    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(curves, f, indent=1)
    print(f"wrote {OUT}")

    if args.update or not os.path.exists(REF):
        with open(REF, "w", encoding="utf-8") as f:
            json.dump(curves, f, indent=1)
        print(f"re-baselined {REF}")
        return 0

    with open(REF, encoding="utf-8") as f:
        ref = json.load(f)
    failures = []
    for name, losses in ref.items():
        for key, traj in losses.items():
            got = curves.get(name, {}).get(key)
            if got is None:
                failures.append(f"{name}.{key}: missing from current run")
                continue
            want = traj[-1]
            if abs(got[-1] - want) > RTOL * max(abs(want), 1e-3):
                failures.append(f"{name}.{key}: final {got[-1]:.5f} vs ref {want:.5f} (> {RTOL:.0%})")
            # primary loss must still be decreasing, not just close
            if got[-1] >= got[0] and traj[-1] < traj[0]:
                failures.append(f"{name}.{key}: no longer decreases ({got[0]:.5f} -> {got[-1]:.5f})")
    if failures:
        print("LEARNING-CURVE REGRESSIONS:")
        for f_ in failures:
            print(" ", f_)
        return 1
    print("learning curves match the reference trajectories")
    return 0


if __name__ == "__main__":
    sys.exit(main())
