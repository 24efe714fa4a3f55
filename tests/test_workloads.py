"""Workload smoke training: BMGAN, causal generator, MCI classifier (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np

from cips_tpu.eval.classification import classification_metrics, confusion_matrix, metrics_row
from cips_tpu.models.bmgan import BMGANDiscriminator, DenseUNetGenerator, ResNetEncoder
from cips_tpu.models.perceptual import PerceptualLoss
from cips_tpu.training import bmgan_task, causal_task, classifier_task

CAUSAL_CFG = {
    "t1_autoencoder_def": {
        "atten_encoder": {
            "spatial_dims": 3,
            "in_channels": 1,
            "out_channels": 6,
            "num_channels": [8, 8],
            "num_res_blocks": 1,
            "attention_levels": [False, True],
            "norm_num_groups": 8,
            "resblock_updown": True,
            "num_head_channels": [0, 4],
            "with_conditioning": True,
        },
        "decoder": {
            "spatial_dims": 3,
            "in_channels": 3,
            "out_channels": 1,
            "num_channels": [8, 8],
            "num_res_blocks": 1,
            "norm_num_groups": 8,
            "attention_levels": [False, False],
        },
    },
    "pet_decoder_def": {
        "spatial_dims": 3,
        "in_channels": 3,
        "out_channels": 1,
        "num_channels": [8, 8],
        "num_res_blocks": 1,
        "norm_num_groups": 8,
        "attention_levels": [True, False],
        "num_head_channels": [4, 0],
        "with_conditioning": True,
    },
    "discriminator": {"num_channels": 8, "num_layers_d": 1},
    "perceptual_network": {"spatial_dims": 3},
}
CAUSAL_TRAIN = {"base_lr": 1e-3, "disc_lr": 1e-3, "perceptual_weight": 0, "adv_weight": 0.005, "kl_weight": 0.001}


def test_causal_train_step_and_generate():
    enc, t1_dec, pet_dec, disc, perc = causal_task.build_models(
        CAUSAL_CFG, n_covariates=4, dtype=jnp.float32
    )
    shape = (2, 8, 16, 8, 1)
    state = causal_task.init_state(
        jax.random.key(0), enc, t1_dec, pet_dec, disc, perc, CAUSAL_TRAIN, shape, n_covariates=4
    )
    step = jax.jit(causal_task.make_train_step(enc, t1_dec, pet_dec, disc, perc, CAUSAL_TRAIN))
    rng = np.random.default_rng(0)
    batch = {
        "t1": jnp.asarray(rng.random(shape, np.float32)),
        "pet": jnp.asarray(rng.random(shape, np.float32)),
        "info": jnp.asarray(rng.random((2, 1, 4), np.float32)),
    }
    first = last = None
    for i in range(5):
        state, metrics = step(state, batch, jax.random.key(i))
        val = float(metrics["rec_pet_loss"] + metrics["rec_t1_loss"])
        first = first if first is not None else val
        last = val
        assert np.isfinite(float(metrics["g_loss"]))
    assert last < first

    gen = jax.jit(causal_task.make_generate_fn(enc, pet_dec))
    out = gen(state.gen.params, batch, jax.random.key(9))
    assert out.shape == shape

    ev = jax.jit(causal_task.make_eval_step(enc, t1_dec, pet_dec))
    res = ev(state, batch, jax.random.key(10))
    assert res["t1_rec"].shape == shape


def test_bmgan_train_step():
    g = DenseUNetGenerator(
        input_conv_channel=4, down_channels=(4, 8), middle_channels=8, up_channels=(8, 4, 4)
    )
    e = ResNetEncoder(input_layer_channel=4, channels=(4, 8))
    d = BMGANDiscriminator(num_layers_d=1)
    p = PerceptualLoss(spatial_dims=3)
    shape = (1, 16, 16, 16, 1)
    state = bmgan_task.init_state(
        jax.random.key(0), g, e, d, p, shape, perceptual_weight=0.0
    )
    step = jax.jit(bmgan_task.make_train_step(g, e, d, p, lamda_perceptual=0.0))
    rng = np.random.default_rng(1)
    batch = {
        "t1": jnp.asarray(rng.random(shape, np.float32)),
        "pet": jnp.asarray(rng.random(shape, np.float32)),
    }
    first = last = None
    for i in range(8):
        state, metrics = step(state, batch, jax.random.key(i))
        for k in ("g_loss", "e_loss", "d_loss", "l1_loss"):
            assert np.isfinite(float(metrics[k])), k
        first = first if first is not None else float(metrics["l1_loss"])
        last = float(metrics["l1_loss"])
    assert last < first  # learning, not just liveness
    ev = jax.jit(bmgan_task.make_eval_step(g))
    out = ev(state, batch, jax.random.key(5))
    assert out["fake"].shape == shape


def test_bmgan_exact_d_fake_step():
    """exact_d_fake re-forwards the post-update G for the E/D phases
    (reference train_bmgan.py:168-169,188-190); same losses structure,
    different D dynamics than the stale default."""
    g = DenseUNetGenerator(
        input_conv_channel=4, down_channels=(4, 8), middle_channels=8, up_channels=(8, 4, 4)
    )
    e = ResNetEncoder(input_layer_channel=4, channels=(4, 8))
    d = BMGANDiscriminator(num_layers_d=1)
    p = PerceptualLoss(spatial_dims=3)
    shape = (1, 16, 16, 16, 1)
    rng = np.random.default_rng(3)
    batch = {
        "t1": jnp.asarray(rng.random(shape, np.float32)),
        "pet": jnp.asarray(rng.random(shape, np.float32)),
    }
    state0 = bmgan_task.init_state(jax.random.key(0), g, e, d, p, shape, perceptual_weight=0.0)
    stale = jax.jit(bmgan_task.make_train_step(g, e, d, p, lamda_perceptual=0.0))
    exact = jax.jit(
        bmgan_task.make_train_step(g, e, d, p, lamda_perceptual=0.0, exact_d_fake=True)
    )
    _, m_stale = stale(state0, batch, jax.random.key(1))
    _, m_exact = exact(state0, batch, jax.random.key(1))
    for k in ("g_loss", "e_loss", "d_loss"):
        assert np.isfinite(float(m_exact[k])), k
    # the G phase is identical; E/D see a different (post-update) fake
    np.testing.assert_allclose(float(m_stale["g_loss"]), float(m_exact["g_loss"]), rtol=1e-6)
    assert float(m_stale["d_loss"]) != float(m_exact["d_loss"])


def test_causal_exact_d_fake_step():
    enc, t1_dec, pet_dec, disc, perc = causal_task.build_models(
        CAUSAL_CFG, n_covariates=4, dtype=jnp.float32
    )
    shape = (1, 8, 16, 8, 1)
    state0 = causal_task.init_state(
        jax.random.key(0), enc, t1_dec, pet_dec, disc, perc, CAUSAL_TRAIN, shape, n_covariates=4
    )
    rng = np.random.default_rng(4)
    batch = {
        "t1": jnp.asarray(rng.random(shape, np.float32)),
        "pet": jnp.asarray(rng.random(shape, np.float32)),
        "info": jnp.asarray(rng.random((1, 1, 4), np.float32)),
    }
    stale = jax.jit(causal_task.make_train_step(enc, t1_dec, pet_dec, disc, perc, CAUSAL_TRAIN))
    exact = jax.jit(
        causal_task.make_train_step(
            enc, t1_dec, pet_dec, disc, perc, CAUSAL_TRAIN, exact_d_fake=True
        )
    )
    _, m_stale = stale(state0, batch, jax.random.key(1))
    _, m_exact = exact(state0, batch, jax.random.key(1))
    assert np.isfinite(float(m_exact["d_loss"]))
    np.testing.assert_allclose(float(m_stale["g_loss"]), float(m_exact["g_loss"]), rtol=1e-6)
    assert float(m_stale["d_loss"]) != float(m_exact["d_loss"])


CLS_CFG = {
    "atten_encoder_def": {
        "spatial_dims": 3,
        "in_channels": 1,
        "out_channels": 2,
        "num_channels": [8, 8],
        "num_res_blocks": 1,
        "attention_levels": [False, True],
        "norm_num_groups": 8,
        "resblock_updown": True,
        "num_head_channels": [0, 4],
    }
}


def test_classifier_train_and_metrics():
    model = classifier_task.build_model(CLS_CFG, in_channels=2, n_covariates=3, dtype=jnp.float32)
    shape = (4, 8, 8, 8, 2)
    state = classifier_task.init_state(jax.random.key(0), model, shape, n_covariates=3)
    step = jax.jit(classifier_task.make_train_step(model, use_tabular=True))
    rng = np.random.default_rng(2)
    labels = np.array([0, 1, 0, 1])
    batch = {
        "imgs": jnp.asarray(rng.random(shape, np.float32)),
        "info": jnp.asarray(rng.random((4, 1, 3), np.float32)),
        "labels": jnp.asarray(labels),
    }
    first = last = None
    for i in range(6):
        state, metrics = step(state, batch, jax.random.key(i))
        first = first if first is not None else float(metrics["ce_loss"])
        last = float(metrics["ce_loss"])
    assert last < first

    predict = jax.jit(classifier_task.make_predict_fn(model, use_tabular=True))
    logits = np.asarray(predict(state.model.params, batch))
    m = classification_metrics(labels, logits)
    assert set(m) == {"accuracy", "precision", "recall", "f1", "auc"}
    row = metrics_row(m)
    assert row.count("&") == 4

    cm = confusion_matrix(labels, logits.argmax(-1))
    assert cm.sum() == 4


def test_weighted_cross_entropy_matches_torch_semantics():
    logits = jnp.asarray([[2.0, 0.0], [0.0, 2.0]])
    labels = jnp.asarray([0, 1])
    # weighted mean: (w0*ce0 + w1*ce1) / (w0 + w1)
    ce = -np.log(np.exp(2.0) / (np.exp(2.0) + 1.0))
    want = (1.0 * ce + 4.0 * ce) / 5.0
    got = float(classifier_task.weighted_cross_entropy(logits, labels))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_d_remat_equivalence():
    """d_remat (jax.checkpoint around the frozen D tower / LPIPS net inside
    the G loss) is a pure HBM-for-FLOPs trade: one step with it on must
    produce identical metrics and parameters to the default."""
    rng = np.random.default_rng(3)
    shape = (1, 16, 16, 16, 1)
    batch = {
        "t1": jnp.asarray(rng.random(shape, np.float32)),
        "pet": jnp.asarray(rng.random(shape, np.float32)),
    }

    outs = []
    for d_remat in (False, True):
        g = DenseUNetGenerator(
            input_conv_channel=4, down_channels=(4, 8), middle_channels=8, up_channels=(8, 4, 4)
        )
        e = ResNetEncoder(input_layer_channel=4, channels=(4, 8))
        d = BMGANDiscriminator(num_layers_d=1)
        p = PerceptualLoss(spatial_dims=3)
        state = bmgan_task.init_state(jax.random.key(0), g, e, d, p, shape, perceptual_weight=1.0)
        step = jax.jit(bmgan_task.make_train_step(g, e, d, p, lamda_perceptual=1.0, d_remat=d_remat))
        state, m = step(state, batch, jax.random.key(1))
        outs.append((float(m["g_loss"]), float(m["d_loss"]),
                     float(jax.tree_util.tree_reduce(
                         lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float64)), state.g.params, 0.0))))
    # metrics are bit-identical; the f32 param-abs-sum probe reassociates
    # under checkpoint (different fusion order) — allow one-ulp drift
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)

    cfg_train = dict(CAUSAL_TRAIN, perceptual_weight=0.1)
    couts = []
    cbatch = {
        "t1": jnp.asarray(rng.random((2, 8, 16, 8, 1), np.float32)),
        "pet": jnp.asarray(rng.random((2, 8, 16, 8, 1), np.float32)),
        "info": jnp.asarray(rng.random((2, 1, 4), np.float32)),
    }
    for d_remat in (False, True):
        tcfg = dict(cfg_train, d_remat=d_remat)
        enc, t1_dec, pet_dec, disc, perc = causal_task.build_models(CAUSAL_CFG, n_covariates=4, dtype=jnp.float32)
        state = causal_task.init_state(
            jax.random.key(0), enc, t1_dec, pet_dec, disc, perc, tcfg, (2, 8, 16, 8, 1), n_covariates=4
        )
        step = jax.jit(causal_task.make_train_step(enc, t1_dec, pet_dec, disc, perc, tcfg))
        state, m = step(state, cbatch, jax.random.key(2))
        couts.append((float(m["g_loss"]), float(m["p_loss"]),
                      float(jax.tree_util.tree_reduce(
                          lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float64)), state.gen.params, 0.0))))
    np.testing.assert_allclose(couts[0], couts[1], rtol=1e-6)


def test_causal_policy_env_override(monkeypatch):
    """CIPS_CAUSAL_POLICY=enc:POL[,t1:POL][,pet:POL] sets per-model remat
    policies (the batch-4 fit A/B knob, BENCH_NOTES round-5); unset models
    keep the conv_all default, and malformed entries are ignored."""
    monkeypatch.setenv("CIPS_CAUSAL_POLICY", "enc:conv2,pet:conv12,garbage")
    enc, t1_dec, pet_dec, *_ = causal_task.build_models(CAUSAL_CFG, n_covariates=4)
    assert enc.remat_policy == "conv2"
    assert t1_dec.remat_policy == "conv_all"
    assert pet_dec.remat_policy == "conv12"

    monkeypatch.delenv("CIPS_CAUSAL_POLICY")
    enc, t1_dec, pet_dec, *_ = causal_task.build_models(CAUSAL_CFG, n_covariates=4)
    assert enc.remat_policy == t1_dec.remat_policy == pet_dec.remat_policy == "conv_all"
