"""Golden parity vs the reference's OWN vendored BMGAN torch model.

Loads `/root/reference/bl_methods/BMGAN/bmgan_model.py` (the exact
architecture the reference trains, train_bmgan.py:293-305 checkpoints) with
MONAI `ConvDenseBlock`/`ResidualUnit` stubs rebuilt from MONAI's published
structure (monai/networks/blocks/{convolutions,denseblock}.py: Convolution
= conv + ADN(N=InstanceNorm affine-free, A=act) in NDA order; ResidualUnit
= `subunits` convolutions with stride on the first + residual conv with
MONAI's rkernel rule; ConvDenseBlock = DenseBlock of ResidualUnits whose
forward concatenates input and unit output). Randomised torch weights
transfer through `import_bmgan_generator`/`import_bmgan_encoder` and the
flax forward must match the torch forward — pinning both the name mapping
and the model semantics (incl. the ConvTranspose flip) against the real
reference file.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax.numpy as jnp

from cips_tpu.data.torch_import import import_bmgan_encoder, import_bmgan_generator

REFERENCE_FILE = "/root/reference/bl_methods/BMGAN/bmgan_model.py"


# ---------------------------------------------------------------------------
# MONAI stubs (published structure; state_dict names match MONAI's)
# ---------------------------------------------------------------------------


def _make_act(act):
    if act is None:
        return nn.Identity()
    if isinstance(act, tuple):
        name, kw = act
    else:
        name, kw = act, {}
    name = name.lower()
    if name == "leakyrelu":
        return nn.LeakyReLU(kw.get("negative_slope", 0.01))
    if name == "prelu":
        return nn.PReLU(**kw)
    raise ValueError(name)


class _ADN(nn.Module):
    """MONAI ADN, 'NDA' ordering with no dropout: N then A submodules."""

    def __init__(self, in_channels, act):
        super().__init__()
        self.N = nn.InstanceNorm3d(in_channels)  # affine=False: no params
        self.A = _make_act(act)

    def forward(self, x):
        return self.A(self.N(x))


class _Convolution(nn.Sequential):
    def __init__(self, spatial_dims, in_channels, out_channels, strides=1,
                 kernel_size=3, act="PRELU", norm="INSTANCE", conv_only=False,
                 padding=None, **kw):
        super().__init__()
        assert spatial_dims == 3 and norm == "INSTANCE"
        if padding is None:
            padding = (kernel_size - 1) // 2
        self.add_module(
            "conv", nn.Conv3d(in_channels, out_channels, kernel_size, strides, padding)
        )
        if not conv_only:
            self.add_module("adn", _ADN(out_channels, act))


class _ResidualUnit(nn.Module):
    def __init__(self, spatial_dims, in_channels, out_channels, strides=1,
                 kernel_size=3, subunits=2, act="PRELU", norm="INSTANCE",
                 padding=None, num_res_units=None, dilation=1, **kw):
        super().__init__()
        if padding is None:
            padding = (kernel_size - 1) // 2
        self.conv = nn.Sequential()
        sch, sstr = in_channels, strides
        for su in range(max(1, subunits)):
            self.conv.add_module(
                f"unit{su}",
                _Convolution(spatial_dims, sch, out_channels, strides=sstr,
                             kernel_size=kernel_size, act=act, norm=norm, padding=padding),
            )
            sch, sstr = out_channels, 1
        if np.prod(np.atleast_1d(strides)) != 1 or in_channels != out_channels:
            rkernel, rpad = kernel_size, padding
            if np.prod(np.atleast_1d(strides)) == 1:
                rkernel, rpad = 1, 0
            self.residual = nn.Conv3d(in_channels, out_channels, rkernel, strides, rpad)
        else:
            self.residual = nn.Identity()

    def forward(self, x):
        return self.residual(x) + self.conv(x)


class _ConvDenseBlock(nn.Module):
    """MONAI DenseBlock/ConvDenseBlock: layers{i} children, forward
    concatenates input with each unit's output."""

    def __init__(self, spatial_dims, in_channels, channels, kernel_size=3,
                 num_res_units=0, act="PRELU", norm="INSTANCE", **kw):
        super().__init__()
        l_channels = in_channels
        for i, c in enumerate(channels):
            assert num_res_units > 0, "stub models the reference's res-unit path"
            unit = _ResidualUnit(spatial_dims, l_channels, c, strides=1,
                                 kernel_size=kernel_size, subunits=num_res_units,
                                 act=act, norm=norm)
            self.add_module(f"layers{i}", unit)
            l_channels += c

    def forward(self, x):
        for layer in self.children():
            result = layer(x)
            x = torch.cat([x, result], 1)
        return x


class _StubPatchD(nn.Module):
    def __init__(self, *a, **kw):
        super().__init__()

    def forward(self, x):
        return [x]


@pytest.fixture(scope="module")
def vendored():
    monai = types.ModuleType("monai")
    networks = types.ModuleType("monai.networks")
    blocks = types.ModuleType("monai.networks.blocks")
    blocks.ConvDenseBlock = _ConvDenseBlock
    blocks.ResidualUnit = _ResidualUnit
    monai.networks, networks.blocks = networks, blocks
    md = types.ModuleType("monai_diffusion")
    md_g = types.ModuleType("monai_diffusion.generative")
    md_n = types.ModuleType("monai_diffusion.generative.networks")
    md_nets = types.ModuleType("monai_diffusion.generative.networks.nets")
    md_nets.PatchDiscriminator = _StubPatchD
    md.generative, md_g.networks, md_n.nets = md_g, md_n, md_nets
    mods = {
        "monai": monai, "monai.networks": networks, "monai.networks.blocks": blocks,
        "monai_diffusion": md, "monai_diffusion.generative": md_g,
        "monai_diffusion.generative.networks": md_n,
        "monai_diffusion.generative.networks.nets": md_nets,
    }
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location("ref_bmgan", REFERENCE_FILE)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _randomize(model: nn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.08)


def test_bmgan_generator_golden_parity(vendored):
    """dense_unet_generator (bmgan_model.py:25-101), tiny channels."""
    tmodel = vendored.dense_unet_generator(
        input_channel=9, input_conv_channel=4, output_conv_channel=4,
        down_channels=[4, 8], middle_channels=[8], up_channels=[8, 4, 4],
    )
    _randomize(tmodel, 0)
    tmodel.eval()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 1, 16, 16, 16)).astype(np.float32)
    z = rng.standard_normal((1, 8)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x), torch.from_numpy(z)).numpy()

    from cips_tpu.models.bmgan import DenseUNetGenerator

    fmodel = DenseUNetGenerator(
        input_conv_channel=4, output_conv_channel=4,
        down_channels=(4, 8), middle_channels=8, up_channels=(8, 4, 4),
    )
    params = {"params": import_bmgan_generator(tmodel.state_dict())}
    got = np.asarray(
        fmodel.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), jnp.asarray(z))
    ).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_bmgan_encoder_golden_parity(vendored):
    """ResNet_encoder (bmgan_model.py:103-130) with the linear heads rebuilt
    for the test volume (the vendored file hardcodes 128*8 for the
    reference's own shape)."""
    tmodel = vendored.ResNet_encoder(input_layer_channel=4, channels=[4, 8])
    with torch.no_grad():
        feat = 8 * 4 * 4 * 4  # 16^3 through two stride-2 units, 8 channels
        tmodel.linear1 = nn.Linear(feat, 8)
        tmodel.linear2 = nn.Linear(feat, 8)
    _randomize(tmodel, 2)
    tmodel.eval()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 1, 16, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want_mu, want_lv = tmodel(torch.from_numpy(x))

    from cips_tpu.models.bmgan import ResNetEncoder

    fmodel = ResNetEncoder(input_layer_channel=4, channels=(4, 8), latent_dim=8)
    params = {"params": import_bmgan_encoder(tmodel.state_dict())}
    got_mu, got_lv = fmodel.apply(params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(np.asarray(got_mu), want_mu.numpy(), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got_lv), want_lv.numpy(), atol=2e-4, rtol=2e-4)
