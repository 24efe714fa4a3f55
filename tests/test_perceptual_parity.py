"""Numerical parity of the perceptual loss vs a torch LPIPS twin.

Builds the torch pipeline the reference depends on — torchvision-style
SqueezeNet-1.1 / AlexNet `.features` + richzhang-LPIPS distance + the MONAI
PerceptualLoss 2.5-D wrapper — with RANDOM weights, converts the torch
state_dict through scripts/convert_lpips_weights.py, and asserts the flax
PerceptualLoss reproduces the torch numbers. This proves the architecture,
the weight converter, and the loss semantics end to end; pretrained weights
later drop in through the identical path.

Reference anchors: unet/scripts/train_unet.py:18,76 (squeeze);
bl_methods/BMGAN/train_bmgan.py:9,73 (alex, MONAI default).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
from convert_lpips_weights import convert_backbone, convert_lins  # noqa: E402

from cips_tpu.models.perceptual import LPIPS, PerceptualLoss, params_from_npz  # noqa: E402

torch.manual_seed(0)


class _TorchFire(tnn.Module):
    def __init__(self, inp, s, e):
        super().__init__()
        self.squeeze = tnn.Conv2d(inp, s, 1)
        self.expand1x1 = tnn.Conv2d(s, e, 1)
        self.expand3x3 = tnn.Conv2d(s, e, 3, padding=1)

    def forward(self, x):
        s = F.relu(self.squeeze(x))
        return torch.cat([F.relu(self.expand1x1(s)), F.relu(self.expand3x3(s))], 1)


def _torch_squeeze_features():
    """torchvision squeezenet1_1().features layer layout (state_dict keys match)."""
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 3, stride=2),
        tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, stride=2, ceil_mode=True),
        _TorchFire(64, 16, 64),
        _TorchFire(128, 16, 64),
        tnn.MaxPool2d(3, stride=2, ceil_mode=True),
        _TorchFire(128, 32, 128),
        _TorchFire(256, 32, 128),
        tnn.MaxPool2d(3, stride=2, ceil_mode=True),
        _TorchFire(256, 48, 192),
        _TorchFire(384, 48, 192),
        _TorchFire(384, 64, 256),
        _TorchFire(512, 64, 256),
    )


def _torch_alex_features():
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2),
        tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, stride=2),
        tnn.Conv2d(64, 192, 5, padding=2),
        tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, stride=2),
        tnn.Conv2d(192, 384, 3, padding=1),
        tnn.ReLU(inplace=True),
        tnn.Conv2d(384, 256, 3, padding=1),
        tnn.ReLU(inplace=True),
        tnn.Conv2d(256, 256, 3, padding=1),
        tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, stride=2),
    )


# lpips.pretrained_networks tap slices per backbone
_TAP_SLICES = {
    "squeeze": [(0, 2), (2, 5), (5, 8), (8, 10), (10, 11), (11, 12), (12, 13)],
    "alex": [(0, 2), (2, 5), (5, 8), (8, 10), (10, 12)],
}


def _torch_lpips(features, lins, a, b, net):
    """richzhang LPIPS forward: per-sample distances (N,). a/b: (N,1,H,W)."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    ha, hb = (a - shift) / scale, (b - shift) / scale
    val = torch.zeros(a.shape[0])
    for i, (lo, hi) in enumerate(_TAP_SLICES[net]):
        for layer in range(lo, hi):
            ha, hb = features[layer](ha), features[layer](hb)
        na = ha / (ha.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = hb / (hb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        val = val + (d * lins[i].view(1, -1, 1, 1)).sum(1).mean(dim=(1, 2))
    return val


def _torch_perceptual_3d(features, lins, pred, target, net, stride=2):
    """MONAI PerceptualLoss fake-3d forward with the deterministic every-k-th
    slice subset (mean over slices per axis, axis losses summed)."""
    total = 0.0
    for axis in (2, 3, 4):  # NCDHW spatial axes
        perm = [axis, 1] + [d for d in (2, 3, 4) if d != axis]
        ps = pred.permute(0, *perm).reshape(-1, 1, *[pred.shape[d] for d in perm[2:]])
        ts = target.permute(0, *perm).reshape(-1, 1, *[target.shape[d] for d in perm[2:]])
        ps, ts = ps[::stride], ts[::stride]
        total = total + _torch_lpips(features, lins, ps, ts, net).mean()
    return float(total)


def _convert(features, net, tmp_path):
    state = {k: v.detach().numpy() for k, v in features.state_dict().items()}
    flat = convert_backbone(state, net)
    n_lins = len(_TAP_SLICES[net])
    gen = torch.Generator().manual_seed(42)
    # random positive lins with torch-lpips-style key names
    taps = {"squeeze": (64, 128, 256, 384, 384, 512, 512), "alex": (64, 192, 384, 256, 256)}[net]
    lin_state = {
        f"lins.{i}.model.1.weight": torch.rand((1, c, 1, 1), generator=gen) for i, c in enumerate(taps)
    }
    flat.update(convert_lins({k: v.numpy() for k, v in lin_state.items()}, net))
    path = tmp_path / f"{net}.npz"
    np.savez(path, **flat)
    lins = [lin_state[f"lins.{i}.model.1.weight"] for i in range(n_lins)]
    return path, lins


@pytest.mark.parametrize("net", ["squeeze", "alex"])
def test_lpips_2d_parity(net, tmp_path):
    features = _torch_squeeze_features() if net == "squeeze" else _torch_alex_features()
    features.eval()
    path, lins = _convert(features, net, tmp_path)

    rng = np.random.default_rng(1)
    a = rng.random((2, 64, 64, 1), np.float32)
    b = rng.random((2, 64, 64, 1), np.float32)
    with torch.no_grad():
        want = _torch_lpips(
            features, lins, torch.from_numpy(a).permute(0, 3, 1, 2), torch.from_numpy(b).permute(0, 3, 1, 2), net
        ).numpy()

    model = LPIPS(network_type=net)
    params = params_from_npz(path)
    # LPIPS is the child module "lpips" of PerceptualLoss in the npz tree
    got = np.asarray(model.apply({"params": params["params"]["lpips"]}, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("net", ["squeeze", "alex"])
def test_perceptual_3d_parity(net, tmp_path):
    features = _torch_squeeze_features() if net == "squeeze" else _torch_alex_features()
    features.eval()
    path, lins = _convert(features, net, tmp_path)

    rng = np.random.default_rng(2)
    pred = rng.random((1, 32, 32, 32, 1), np.float32)
    target = rng.random((1, 32, 32, 32, 1), np.float32)
    with torch.no_grad():
        want = _torch_perceptual_3d(
            features,
            lins,
            torch.from_numpy(pred).permute(0, 4, 1, 2, 3),
            torch.from_numpy(target).permute(0, 4, 1, 2, 3),
            net,
        )

    model = PerceptualLoss(spatial_dims=3, network_type=net)
    got = float(model.apply(params_from_npz(path), jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_perceptual_init_matches_npz_tree(tmp_path):
    """`init` produces the same tree structure the converter emits, so real
    weights are a drop-in replacement for the seeded fallback."""
    features = _torch_squeeze_features()
    path, _ = _convert(features, "squeeze", tmp_path)
    loaded = params_from_npz(path)

    model = PerceptualLoss(spatial_dims=3, network_type="squeeze")
    x = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    params = model.init(jax.random.key(0), x, x)

    paths_init = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(params)}
    paths_npz = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(loaded)}
    assert paths_init == paths_npz
    shapes_init = {
        jax.tree_util.keystr(k): v.shape for k, v in jax.tree_util.tree_leaves_with_path(params)
    }
    for k, v in jax.tree_util.tree_leaves_with_path(loaded):
        assert shapes_init[jax.tree_util.keystr(k)] == v.shape


def test_perceptual_random_subset_mode():
    """rng-threaded MONAI randperm semantics: ratio 1.0 equals the
    deterministic subset exactly (both = all slices); at ratio 0.5 the
    per-key spread quantifies the subset-sampling noise and stays near the
    deterministic value (jit-compatible: gather indices, static sizes)."""
    rng = np.random.default_rng(4)
    # 32^3: alex's tap chain (k11 s4 conv + three pools) needs >= ~32 px
    # slices for non-empty deep feature maps
    x = jnp.asarray(rng.random((1, 32, 32, 32, 1), np.float32))
    y = jnp.asarray(rng.random((1, 32, 32, 32, 1), np.float32))

    full = PerceptualLoss(spatial_dims=3, network_type="alex", fake_3d_ratio=1.0)
    params = full.init(jax.random.key(0), x, x)
    det = float(full.apply(params, x, y))
    rnd = float(full.apply(params, x, y, rng=jax.random.key(1)))
    np.testing.assert_allclose(rnd, det, rtol=1e-5)

    half = PerceptualLoss(spatial_dims=3, network_type="alex", fake_3d_ratio=0.5)
    params = half.init(jax.random.key(0), x, x)
    det = float(half.apply(params, x, y))
    apply = jax.jit(lambda k: half.apply(params, x, y, rng=k))
    vals = [float(apply(jax.random.key(i))) for i in range(4)]
    assert len({round(v, 8) for v in vals}) > 1  # genuinely random subsets
    spread = (max(vals) - min(vals)) / det
    assert spread < 0.5, (vals, det)
    assert abs(np.mean(vals) - det) / det < 0.25, (np.mean(vals), det)


def test_perceptual_grad_flows():
    """The loss is differentiable w.r.t. the prediction (it feeds generator
    training at weight 8 in BMGAN and 0.02 in the causal trainer)."""
    model = PerceptualLoss(spatial_dims=3, network_type="alex")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 32, 32, 32, 1), np.float32))
    y = jnp.asarray(rng.random((1, 32, 32, 32, 1), np.float32))
    params = model.init(jax.random.key(0), x, x)
    g = jax.grad(lambda p_: model.apply(params, p_, y))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0
