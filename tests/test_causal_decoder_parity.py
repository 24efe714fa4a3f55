"""Torch-twin parity for the causal workload's two decoders.

The reference's `Decoder` (autoencoderkl) and `DiffusionModelDecoder`
(atten_decoder) come from the author's EXTERNAL monai_diffusion package —
not vendored in the reference repo — so, like the PatchDiscriminator test
(test_golden_reference_parity.py:235), parity runs against structure-true
torch twins:

* the DiffusionModelDecoder twin is assembled from the reference's OWN
  vendored blocks (ResnetBlock / SpatialTransformer / Upsample /
  CrossAttnMidBlock from unet/utils/atten_unet_model.py) under the
  AttenUNet family's naming conventions — the block math is literally the
  reference's code;
* the VAE Decoder twin follows the published MONAI-generative
  AutoencoderKL layout (flat ``blocks`` ModuleList; ResBlock =
  norm1/conv1/norm2/conv2/nin_shortcut; Upsample = nearest x2 + conv).

Randomised torch weights transfer through `import_diffusion_decoder` /
`import_vae_decoder` and the flax forwards must match, pinning
`train_unify_causal_gen.py:392-401` checkpoint importability.
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

from cips_tpu.data.torch_import import import_diffusion_decoder, import_vae_decoder
from test_golden_reference_parity import (
    _Convolution,
    _MLPBlock,
    _PoolFactory,
    _ensure_tuple_rep,
    _randomize,
)

REFERENCE_FILE = "/root/reference/unet/utils/atten_unet_model.py"


@pytest.fixture(scope="module")
def vendored():
    monai = types.ModuleType("monai")
    networks = types.ModuleType("monai.networks")
    blocks = types.ModuleType("monai.networks.blocks")
    layers = types.ModuleType("monai.networks.layers")
    factories = types.ModuleType("monai.networks.layers.factories")
    utils = types.ModuleType("monai.utils")
    blocks.Convolution = _Convolution
    blocks.MLPBlock = _MLPBlock
    factories.Pool = _PoolFactory()
    utils.ensure_tuple_rep = _ensure_tuple_rep
    monai.networks, networks.blocks, networks.layers = networks, blocks, layers
    layers.factories = factories
    monai.utils = utils
    mods = {
        "monai": monai, "monai.networks": networks, "monai.networks.blocks": blocks,
        "monai.networks.layers": layers, "monai.networks.layers.factories": factories,
        "monai.utils": utils,
    }
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    try:
        spec = importlib.util.spec_from_file_location("ref_atten_unet_dec", REFERENCE_FILE)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _make_torch_diffusion_decoder(m, *, in_channels, out_channels, num_channels,
                                  attention_levels, num_res_blocks, norm_num_groups,
                                  num_head_channels, cross_attention_dim):
    """Twin from the vendored blocks, AttenUNet naming conventions."""
    n = len(num_channels)

    model = nn.Module()
    model.conv_in = _Convolution(3, in_channels, num_channels[0], strides=1,
                                 kernel_size=3, padding=1, conv_only=True)
    model.middle_block = m.CrossAttnMidBlock(
        spatial_dims=3, in_channels=num_channels[0],
        norm_num_groups=norm_num_groups, num_head_channels=num_head_channels[0],
        cross_attention_dim=cross_attention_dim,
    )
    model.up_blocks = nn.ModuleList()
    prev = num_channels[0]
    for i in range(n):
        ch = num_channels[i]
        blk = nn.Module()
        blk.resnets = nn.ModuleList()
        blk.attentions = nn.ModuleList()
        for j in range(num_res_blocks[i]):
            blk.resnets.append(
                m.ResnetBlock(3, prev if j == 0 else ch, out_channels=ch,
                              norm_num_groups=norm_num_groups)
            )
            if attention_levels[i]:
                blk.attentions.append(
                    m.SpatialTransformer(
                        spatial_dims=3, in_channels=ch,
                        num_attention_heads=ch // num_head_channels[i],
                        num_head_channels=num_head_channels[i], num_layers=1,
                        norm_num_groups=norm_num_groups,
                        cross_attention_dim=cross_attention_dim,
                    )
                )
        if i != n - 1:
            blk.upsampler = m.Upsample(3, ch, use_conv=True, out_channels=ch)
        model.up_blocks.append(blk)
        prev = ch
    model.out = nn.Sequential(
        nn.GroupNorm(norm_num_groups, num_channels[-1], eps=1e-6, affine=True),
        nn.SiLU(),
        _Convolution(3, num_channels[-1], out_channels, strides=1,
                     kernel_size=3, padding=1, conv_only=True),
    )

    def forward(z, context):
        h = model.conv_in(z)
        h = model.middle_block(h, context=context)
        for blk in model.up_blocks:
            for j, res in enumerate(blk.resnets):
                h = res(h)
                if len(blk.attentions):
                    h = blk.attentions[j](h, context=context)
            if hasattr(blk, "upsampler"):
                h = blk.upsampler(h)
        return model.out(h)

    model.forward = forward
    return model


def test_diffusion_decoder_twin_parity(vendored):
    cfg = dict(in_channels=3, out_channels=1, num_channels=(8, 8),
               attention_levels=(True, False), num_res_blocks=(1, 1),
               norm_num_groups=8, num_head_channels=(4, 0),
               cross_attention_dim=5)
    tmodel = _make_torch_diffusion_decoder(vendored, **cfg)
    _randomize(tmodel, 0)
    tmodel.eval()
    rng = np.random.default_rng(1)
    z = rng.standard_normal((1, 3, 4, 8, 4)).astype(np.float32)
    ctx = rng.standard_normal((1, 1, 5)).astype(np.float32)
    with torch.no_grad():
        want = tmodel.forward(torch.from_numpy(z), torch.from_numpy(ctx)).numpy()

    from cips_tpu.models.decoder import DiffusionModelDecoder

    fmodel = DiffusionModelDecoder(
        spatial_dims=3, in_channels=3, out_channels=1, num_channels=(8, 8),
        attention_levels=(True, False), num_res_blocks=(1, 1),
        norm_num_groups=8, num_head_channels=(4, 0),
        with_conditioning=True, cross_attention_dim=5,
    )
    sd = {k: v for k, v in nn.Module.state_dict(tmodel).items()}
    params = {"params": import_diffusion_decoder(sd, num_levels=2)}
    got = np.asarray(
        fmodel.apply(params, jnp.asarray(z.transpose(0, 2, 3, 4, 1)), jnp.asarray(ctx))
    ).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# VAE Decoder twin (published MONAI-generative AutoencoderKL structure)
# ---------------------------------------------------------------------------


class _VAEResBlock(nn.Module):
    def __init__(self, cin, cout, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6, affine=True)
        self.conv1 = _Convolution(3, cin, cout, strides=1, kernel_size=3,
                                  padding=1, conv_only=True)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6, affine=True)
        self.conv2 = _Convolution(3, cout, cout, strides=1, kernel_size=3,
                                  padding=1, conv_only=True)
        if cin != cout:
            self.nin_shortcut = _Convolution(3, cin, cout, strides=1,
                                             kernel_size=1, padding=0, conv_only=True)
        else:
            self.nin_shortcut = nn.Identity()

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        return self.nin_shortcut(x) + h


class _VAEUpsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = _Convolution(3, ch, ch, strides=1, kernel_size=3,
                                 padding=1, conv_only=True)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class TorchVAEDecoder(nn.Module):
    def __init__(self, in_channels, out_channels, num_channels, num_res_blocks, groups):
        super().__init__()
        n = len(num_channels)
        rev = list(reversed(num_channels))
        rev_res = list(reversed(num_res_blocks))
        blocks = [_Convolution(3, in_channels, rev[0], strides=1, kernel_size=3,
                               padding=1, conv_only=True)]
        prev = rev[0]
        for i in range(n):
            for _ in range(rev_res[i]):
                blocks.append(_VAEResBlock(prev, rev[i], groups))
                prev = rev[i]
            if i != n - 1:
                blocks.append(_VAEUpsample(prev))
        blocks.append(nn.GroupNorm(groups, prev, eps=1e-6, affine=True))
        blocks.append(_Convolution(3, prev, out_channels, strides=1, kernel_size=3,
                                   padding=1, conv_only=True))
        self.blocks = nn.ModuleList(blocks)

    def forward(self, x):
        for i, block in enumerate(self.blocks):
            if i == len(self.blocks) - 1:
                x = F.silu(x)  # final norm -> silu -> conv_out
            x = block(x)
        return x


def test_vae_decoder_twin_parity():
    num_channels, num_res_blocks = (8, 16), (1, 2)
    tmodel = TorchVAEDecoder(3, 1, num_channels, num_res_blocks, groups=8)
    _randomize(tmodel, 2)
    tmodel.eval()
    rng = np.random.default_rng(3)
    z = rng.standard_normal((1, 3, 4, 8, 4)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(z)).numpy()

    from cips_tpu.models.autoencoder_kl import Decoder

    fmodel = Decoder(spatial_dims=3, in_channels=3, out_channels=1,
                     num_channels=num_channels, num_res_blocks=num_res_blocks,
                     norm_num_groups=8)
    params = {"params": import_vae_decoder(tmodel.state_dict(), num_channels, num_res_blocks)}
    got = np.asarray(fmodel.apply(params, jnp.asarray(z.transpose(0, 2, 3, 4, 1))))
    np.testing.assert_allclose(got.transpose(0, 4, 1, 2, 3), want, atol=2e-4, rtol=2e-4)
