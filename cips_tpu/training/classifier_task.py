"""MCI-converter classifier — downstream evaluation of synthesized PET.

TPU re-design of `pet_for_classification/train_atten_encoder_MCI.py`:
DiffusionModelEncoder (mlp head) on PET and/or T1 channels (:80-87,
in_channels 1|2 by modality flags :164-165), optional covariate
cross-attention (`--use_tabular_info`, :85-86), class-weighted CE with
weights [1, 4] (:144,172). The reference's dummy zero-timestep argument
(:169) does not exist here — the vestigial time path was dropped from the
encoder. sklearn epoch metrics live in `cips_tpu/eval/classification.py`.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from cips_tpu.models.encoder import DiffusionModelEncoder
from cips_tpu.training.common import TrainState, adam

CLASS_WEIGHTS = (1.0, 4.0)  # sMCI, pMCI (train_atten_encoder_MCI.py:144)


@struct.dataclass
class ClassifierState:
    model: TrainState
    step: jnp.ndarray


def build_model(
    model_cfg: Mapping[str, Any],
    in_channels: int,
    n_covariates: int = 0,
    dtype=jnp.bfloat16,
) -> DiffusionModelEncoder:
    cfg = dict(model_cfg["atten_encoder_def"])
    cfg["in_channels"] = in_channels
    if n_covariates > 0:
        cfg["with_conditioning"] = True
        cfg["cross_attention_dim"] = n_covariates
    else:
        cfg["with_conditioning"] = False
        cfg.pop("cross_attention_dim", None)
    # space-to-depth level 0 pays off only for narrow first levels
    # (BENCH_NOTES.md); exact math, so enable whenever supported.
    cfg.setdefault(
        "s2d",
        cfg.get("spatial_dims", 3) == 3
        and cfg.get("resblock_updown", False)
        and not list(cfg.get("attention_levels", [True]))[0]
        and list(cfg.get("num_channels", [64]))[0] <= 32,
    )
    return DiffusionModelEncoder(head="mlp", dtype=dtype, **cfg)


def init_state(
    rng: jax.Array,
    model: DiffusionModelEncoder,
    batch_shape: Tuple[int, ...],
    n_covariates: int = 0,
    lr: float = 1e-4,
) -> ClassifierState:
    x = jnp.zeros(batch_shape, jnp.float32)
    ctx = jnp.zeros((batch_shape[0], 1, n_covariates), jnp.float32) if n_covariates else None
    params = jax.jit(model.init)(rng, x, ctx) if ctx is not None else jax.jit(model.init)(rng, x)
    return ClassifierState(model=TrainState.create(params, adam(lr)), step=jnp.zeros((), jnp.int32))


def weighted_cross_entropy(
    logits: jax.Array, labels: jax.Array, weights=CLASS_WEIGHTS
) -> jax.Array:
    """Mean CE with per-class weights, matching torch
    nn.CrossEntropyLoss(weight=...) (weighted mean, not plain mean)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    w = jnp.asarray(weights, jnp.float32)[labels]
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return (w * nll).sum() / jnp.maximum(w.sum(), 1e-12)


def make_train_step(model: DiffusionModelEncoder, use_tabular: bool, dropout: bool = True) -> Callable:
    def train_step(
        state: ClassifierState, batch: Mapping[str, jax.Array], rng: jax.Array
    ) -> Tuple[ClassifierState, Dict]:
        imgs, labels = batch["imgs"], batch["labels"]
        ctx = batch["info"] if use_tabular else None

        def loss_fn(params):
            kwargs = dict(deterministic=not dropout)
            if ctx is not None:
                logits = model.apply(params, imgs, ctx, rngs={"dropout": rng}, **kwargs)
            else:
                logits = model.apply(params, imgs, rngs={"dropout": rng}, **kwargs)
            loss = weighted_cross_entropy(logits, labels)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.model.params)
        new_model = state.model.apply_gradients(grads)
        acc = (jnp.argmax(logits, -1) == labels).mean()
        return (
            ClassifierState(model=new_model, step=state.step + 1),
            {"ce_loss": loss, "accuracy": acc, "logits": logits},
        )

    return train_step


def make_predict_fn(model: DiffusionModelEncoder, use_tabular: bool) -> Callable:
    def predict(params, batch: Mapping[str, jax.Array]) -> jax.Array:
        if use_tabular:
            return model.apply(params, batch["imgs"], batch["info"])
        return model.apply(params, batch["imgs"])

    return predict
