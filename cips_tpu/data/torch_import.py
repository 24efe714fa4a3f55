"""Import reference (torch) checkpoints into cips_tpu flax models.

The reference saves `torch.save({"unet": ddp.state_dict(), "discriminator":
..., "epoch": ..., ...})` (train_unet.py:295-302) with DDP's `module.`
prefixes. This module maps those state_dicts onto the flax parameter trees
of `AttenUNet` / `DiffusionModelEncoder` / `PatchDiscriminator`, so models
trained with the reference can be served/fine-tuned here.

Name scheme (derived from the vendored architecture,
unet/utils/atten_unet_model.py — MONAI `Convolution(conv_only=True)` is a
Sequential with a single "conv" child, hence `*.conv.weight`):

  torch                                      flax
  ---------------------------------------    -------------------------------
  conv_in.conv.{weight,bias}                 conv_in/{kernel,bias}
  down_blocks.I.resnets.J.norm1.*            down_I/resnet_J/norm1/GroupNorm_0/*
  down_blocks.I.resnets.J.conv1.conv.*       down_I/resnet_J/conv1/*
  down_blocks.I.resnets.J.skip_connection.conv.*  down_I/resnet_J/skip/*
  down_blocks.I.downsampler...               down_I/downsampler/...
  down_blocks.I.attentions.J...              down_I/attn_J/...
  middle_block.resnet_1 / attention / resnet_2    mid/resnet_1|attention|attn.../resnet_2
  up_blocks.I...                             up_I/...
  out.0.* (GroupNorm), out.2.conv.*          out_norm/GroupNorm_0/*, conv_out/*
  attention blocks: to_q/to_k/to_v/proj_attn Linears; CrossAttention
  to_out.0 -> to_out; MLPBlock linear1/linear2 -> ff/proj_in, ff/proj_out.

Conv kernels transpose (out,in,kd,kh,kw) -> (kd,kh,kw,in,out); Linear
weights transpose (out,in) -> (in,out).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def strip_ddp_prefix(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    return {k[len("module."):] if k.startswith("module.") else k: v for k, v in state_dict.items()}


def _conv_w(t):
    w = _np(t)
    # (out, in, *k) -> (*k, in, out)
    axes = tuple(range(2, w.ndim)) + (1, 0)
    return w.transpose(axes)


def _lin_w(t):
    return _np(t).T


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _map_groupnorm(out, prefix_t, prefix_f, sd):
    _set(out, f"{prefix_f}/GroupNorm_0/scale", _np(sd[f"{prefix_t}.weight"]))
    _set(out, f"{prefix_f}/GroupNorm_0/bias", _np(sd[f"{prefix_t}.bias"]))


def _map_conv(out, prefix_t, prefix_f, sd):
    _set(out, f"{prefix_f}/kernel", _conv_w(sd[f"{prefix_t}.conv.weight"]))
    bias_key = f"{prefix_t}.conv.bias"
    if bias_key in sd:
        _set(out, f"{prefix_f}/bias", _np(sd[bias_key]))


def _map_resnet(out, pt, pf, sd):
    _map_groupnorm(out, f"{pt}.norm1", f"{pf}/norm1", sd)
    _map_conv(out, f"{pt}.conv1", f"{pf}/conv1", sd)
    _map_groupnorm(out, f"{pt}.norm2", f"{pf}/norm2", sd)
    _map_conv(out, f"{pt}.conv2", f"{pf}/conv2", sd)
    if f"{pt}.skip_connection.conv.weight" in sd:
        _map_conv(out, f"{pt}.skip_connection", f"{pf}/skip", sd)


def _map_attention_block(out, pt, pf, sd):
    _map_groupnorm(out, f"{pt}.norm", f"{pf}/norm", sd)
    for lin in ("to_q", "to_k", "to_v", "proj_attn"):
        _set(out, f"{pf}/{lin}/kernel", _lin_w(sd[f"{pt}.{lin}.weight"]))
        _set(out, f"{pf}/{lin}/bias", _np(sd[f"{pt}.{lin}.bias"]))


def _map_cross_attention(out, pt, pf, sd):
    for lin in ("to_q", "to_k", "to_v"):
        _set(out, f"{pf}/{lin}/kernel", _lin_w(sd[f"{pt}.{lin}.weight"]))
    _set(out, f"{pf}/to_out/kernel", _lin_w(sd[f"{pt}.to_out.0.weight"]))
    _set(out, f"{pf}/to_out/bias", _np(sd[f"{pt}.to_out.0.bias"]))


def _map_layernorm(out, pt, pf, sd):
    _set(out, f"{pf}/scale", _np(sd[f"{pt}.weight"]))
    _set(out, f"{pf}/bias", _np(sd[f"{pt}.bias"]))


def _map_spatial_transformer(out, pt, pf, sd, num_layers=1):
    _map_groupnorm(out, f"{pt}.norm", f"{pf}/norm", sd)
    _map_conv(out, f"{pt}.proj_in", f"{pf}/proj_in", sd)
    for k in range(num_layers):
        bt = f"{pt}.transformer_blocks.{k}"
        bf = f"{pf}/block_{k}"
        _map_cross_attention(out, f"{bt}.attn1", f"{bf}/attn1", sd)
        _map_cross_attention(out, f"{bt}.attn2", f"{bf}/attn2", sd)
        _map_layernorm(out, f"{bt}.norm1", f"{bf}/norm1", sd)
        _map_layernorm(out, f"{bt}.norm2", f"{bf}/norm2", sd)
        _map_layernorm(out, f"{bt}.norm3", f"{bf}/norm3", sd)
        _set(out, f"{bf}/ff/proj_in/kernel", _lin_w(sd[f"{bt}.ff.linear1.weight"]))
        _set(out, f"{bf}/ff/proj_in/bias", _np(sd[f"{bt}.ff.linear1.bias"]))
        _set(out, f"{bf}/ff/proj_out/kernel", _lin_w(sd[f"{bt}.ff.linear2.weight"]))
        _set(out, f"{bf}/ff/proj_out/bias", _np(sd[f"{bt}.ff.linear2.bias"]))
    _map_conv(out, f"{pt}.proj_out", f"{pf}/proj_out", sd)


def _has(sd, prefix):
    return any(k.startswith(prefix) for k in sd)


def import_atten_unet(state_dict: Mapping[str, Any], num_levels: int, transformer_num_layers: int = 1) -> Dict:
    """torch AttenUNet state_dict -> flax params["params"] subtree."""
    sd = strip_ddp_prefix(state_dict)
    out: Dict = {}
    _map_conv(out, "conv_in", "conv_in", sd)

    for i in range(num_levels):
        bt = f"down_blocks.{i}"
        bf = f"down_{i}"
        j = 0
        while _has(sd, f"{bt}.resnets.{j}."):
            _map_resnet(out, f"{bt}.resnets.{j}", f"{bf}/resnet_{j}", sd)
            j += 1
        j = 0
        while _has(sd, f"{bt}.attentions.{j}."):
            pt = f"{bt}.attentions.{j}"
            pf = f"{bf}/attn_{j}"
            if _has(sd, f"{pt}.transformer_blocks."):
                _map_spatial_transformer(out, pt, pf, sd, transformer_num_layers)
            else:
                _map_attention_block(out, pt, pf, sd)
            j += 1
        if _has(sd, f"{bt}.downsampler.norm1"):
            _map_resnet(out, f"{bt}.downsampler", f"{bf}/downsampler", sd)
        elif _has(sd, f"{bt}.downsampler.op"):
            _map_conv(out, f"{bt}.downsampler.op", f"{bf}/downsampler/op", sd)

    _map_resnet(out, "middle_block.resnet_1", "mid/resnet_1", sd)
    if _has(sd, "middle_block.attention.transformer_blocks."):
        _map_spatial_transformer(out, "middle_block.attention", "mid/attention", sd, transformer_num_layers)
    elif _has(sd, "middle_block.attention."):
        _map_attention_block(out, "middle_block.attention", "mid/attention", sd)
    _map_resnet(out, "middle_block.resnet_2", "mid/resnet_2", sd)

    for i in range(num_levels):
        bt = f"up_blocks.{i}"
        bf = f"up_{i}"
        j = 0
        while _has(sd, f"{bt}.resnets.{j}."):
            _map_resnet(out, f"{bt}.resnets.{j}", f"{bf}/resnet_{j}", sd)
            j += 1
        j = 0
        while _has(sd, f"{bt}.attentions.{j}."):
            pt = f"{bt}.attentions.{j}"
            pf = f"{bf}/attn_{j}"
            if _has(sd, f"{pt}.transformer_blocks."):
                _map_spatial_transformer(out, pt, pf, sd, transformer_num_layers)
            else:
                _map_attention_block(out, pt, pf, sd)
            j += 1
        if _has(sd, f"{bt}.upsampler.norm1"):
            _map_resnet(out, f"{bt}.upsampler", f"{bf}/upsampler", sd)
        elif _has(sd, f"{bt}.upsampler.conv"):
            _map_conv(out, f"{bt}.upsampler.conv", f"{bf}/upsampler/conv", sd)

    _map_groupnorm(out, "out.0", "out_norm", sd)
    _map_conv(out, "out.2", "conv_out", sd)
    return out


def import_diffusion_encoder(
    state_dict: Mapping[str, Any], num_levels: int, transformer_num_layers: int = 1
) -> Dict:
    """torch DiffusionModelEncoder (classifier) state_dict -> flax params.

    Shares AttenUNet's stem/down-block naming; the head is
    Sequential(Linear, ReLU, Dropout, Linear) -> out.0 / out.3
    (atten_unet_model.py:1987 -> fc1 / fc2). The vestigial time_embed
    parameters are ignored (the time path is dead in the reference,
    SURVEY.md §2.3)."""
    sd = strip_ddp_prefix(state_dict)
    out: Dict = {}
    _map_conv(out, "conv_in", "conv_in", sd)
    for i in range(num_levels):
        bt = f"down_blocks.{i}"
        bf = f"down_{i}"
        j = 0
        while _has(sd, f"{bt}.resnets.{j}."):
            _map_resnet(out, f"{bt}.resnets.{j}", f"{bf}/resnet_{j}", sd)
            j += 1
        j = 0
        while _has(sd, f"{bt}.attentions.{j}."):
            pt = f"{bt}.attentions.{j}"
            pf = f"{bf}/attn_{j}"
            if _has(sd, f"{pt}.transformer_blocks."):
                _map_spatial_transformer(out, pt, pf, sd, transformer_num_layers)
            else:
                _map_attention_block(out, pt, pf, sd)
            j += 1
        if _has(sd, f"{bt}.downsampler.norm1"):
            _map_resnet(out, f"{bt}.downsampler", f"{bf}/downsampler", sd)
        elif _has(sd, f"{bt}.downsampler.op"):
            _map_conv(out, f"{bt}.downsampler.op", f"{bf}/downsampler/op", sd)
    if "out.0.weight" in sd:
        # the reference flattens NCDHW features (atten_unet_model.py:2030:
        # h.reshape(N, -1) -> (C, D, H, W) order); flax flattens channels-last
        # (D, H, W, C). Permute fc1's input dim from (C, S) to (S, C) blocks.
        w = _np(sd["out.0.weight"])  # (hidden, C*S)
        c = _last_level_channels(sd, num_levels)
        s = w.shape[1] // c
        w = w.reshape(w.shape[0], c, s).transpose(0, 2, 1).reshape(w.shape[0], -1)
        _set(out, "fc1/kernel", w.T)
        _set(out, "fc1/bias", _np(sd["out.0.bias"]))
        _set(out, "fc2/kernel", _lin_w(sd["out.3.weight"]))
        _set(out, "fc2/bias", _np(sd["out.3.bias"]))
    return out


def _last_level_channels(sd: Mapping[str, Any], num_levels: int) -> int:
    """Output channel count of the deepest down block (= the flattened
    feature's channel axis)."""
    level = num_levels - 1
    j = 0
    while f"down_blocks.{level}.resnets.{j + 1}.conv2.conv.weight" in sd:
        j += 1
    key = f"down_blocks.{level}.resnets.{j}.conv2.conv.weight"
    if f"down_blocks.{level}.downsampler.conv2.conv.weight" in sd:
        key = f"down_blocks.{level}.downsampler.conv2.conv.weight"
    elif f"down_blocks.{level}.downsampler.op.conv.weight" in sd:
        key = f"down_blocks.{level}.downsampler.op.conv.weight"
    return int(_np(sd[key]).shape[0])


def import_patch_discriminator(state_dict: Mapping[str, Any], num_layers_d: int = 3) -> Dict:
    """torch PatchDiscriminator state_dict -> flax params subtree.

    The MONAI-generative source is not vendored in the reference, so this
    mapping is ORDER-based rather than name-based: a PatchGAN is a straight
    conv ladder (initial conv, num_layers_d-1 strided conv+norm pairs, a
    penultimate conv+norm, a 1-channel head — bmgan_model.py:133-144,
    train_unet.py:74), so conv kernels are mapped in state_dict order onto
    conv_0..conv_{n}, conv_penultimate, conv_out, and 1-D affine (weight,
    bias) pairs onto norm_1..norm_penultimate. BatchNorm running statistics
    (running_mean/var), if present, have no counterpart in this package's
    stat-free InstanceNorm and are dropped with a shape check."""
    sd = strip_ddp_prefix(state_dict)
    convs = []
    norms = []
    for k, v in sd.items():
        arr = _np(v)
        if k.endswith("num_batches_tracked") or "running_" in k:
            continue
        if arr.ndim >= 3 and k.endswith("weight"):
            bias = sd.get(k[: -len("weight")] + "bias")
            convs.append((arr, None if bias is None else _np(bias)))
        elif arr.ndim == 1 and k.endswith("weight"):
            norms.append((arr, _np(sd[k[: -len("weight")] + "bias"])))
    conv_names = (
        ["conv_0"]
        + [f"conv_{i}" for i in range(1, num_layers_d)]
        + ["conv_penultimate", "conv_out"]
    )
    norm_names = [f"norm_{i}" for i in range(1, num_layers_d)] + ["norm_penultimate"]
    if len(convs) != len(conv_names):
        raise ValueError(f"expected {len(conv_names)} convs, found {len(convs)}")
    out: Dict = {}
    for name, (w, b) in zip(conv_names, convs):
        _set(out, f"{name}/kernel", _conv_w(w))
        # bias=False convs (MONAI normed layers) -> zero bias in our template
        _set(out, f"{name}/bias", b if b is not None else np.zeros(w.shape[0], np.float32))
    if norms:
        if len(norms) != len(norm_names):
            raise ValueError(f"expected {len(norm_names)} norms, found {len(norms)}")
        for name, (scale, bias) in zip(norm_names, norms):
            _set(out, f"{name}/scale", scale)
            _set(out, f"{name}/bias", bias)
    return out


# ---------------------------------------------------------------------------
# Causal decoders (train_unify_causal_gen.py:392-401 checkpoints the VAE
# `Decoder` and the `DiffusionModelDecoder`). Their torch sources are the
# author's external monai_diffusion package (NOT vendored in the reference),
# so these mappings follow the published MONAI-generative structure: the
# AutoencoderKL Decoder is a flat `blocks` ModuleList (conv_in, ResBlocks
# with norm1/conv1/norm2/conv2/nin_shortcut, Upsample with a post conv,
# final GroupNorm + conv), and the atten_decoder follows the vendored
# AttenUNet family's naming (conv_in / middle_block / up_blocks / out) —
# verified against structure-true torch twins built from the reference's
# own vendored blocks (tests/test_causal_decoder_parity.py).
# ---------------------------------------------------------------------------


def _tuplify_cfg(v, n):
    return (v,) * n if isinstance(v, int) else tuple(v)


def _map_vae_resblock(out, pt, pf, sd):
    """MONAI-generative AEKL ResBlock -> flax ResnetBlock names."""
    _map_groupnorm(out, f"{pt}.norm1", f"{pf}/norm1", sd)
    _map_conv(out, f"{pt}.conv1", f"{pf}/conv1", sd)
    _map_groupnorm(out, f"{pt}.norm2", f"{pf}/norm2", sd)
    _map_conv(out, f"{pt}.conv2", f"{pf}/conv2", sd)
    if f"{pt}.nin_shortcut.conv.weight" in sd:
        _map_conv(out, f"{pt}.nin_shortcut", f"{pf}/skip", sd)


def import_vae_decoder(
    state_dict: Mapping[str, Any],
    num_channels,
    num_res_blocks,
    with_decoder_nonlocal_attn: bool = False,
) -> Dict:
    """torch AutoencoderKL ``Decoder`` state_dict -> flax Decoder params.

    Walks the flat ``blocks.{k}`` ModuleList in construction order:
    conv_in, [mid ResBlock/Attention/ResBlock], per level (coarse-to-fine)
    ResBlocks then an Upsample, final GroupNorm, conv_out.
    """
    sd = strip_ddp_prefix(state_dict)
    out: Dict = {}
    n = len(num_channels)
    rev_res = list(reversed(_tuplify_cfg(num_res_blocks, n)))
    k = 0
    _map_conv(out, f"blocks.{k}", "conv_in", sd)
    k += 1
    if with_decoder_nonlocal_attn:
        _map_vae_resblock(out, f"blocks.{k}", "mid_res_1", sd)
        _map_attention_block(out, f"blocks.{k + 1}", "mid_attn", sd)
        _map_vae_resblock(out, f"blocks.{k + 2}", "mid_res_2", sd)
        k += 3
    for i in range(n):
        for j in range(rev_res[i]):
            _map_vae_resblock(out, f"blocks.{k}", f"up_{i}_res_{j}", sd)
            k += 1
        if i != n - 1:
            _map_conv(out, f"blocks.{k}.conv", f"up_{i}_us/conv", sd)
            k += 1
    _map_groupnorm(out, f"blocks.{k}", "out_norm", sd)
    _map_conv(out, f"blocks.{k + 1}", "conv_out", sd)
    return out


def import_diffusion_decoder(
    state_dict: Mapping[str, Any], num_levels: int, transformer_num_layers: int = 1
) -> Dict:
    """torch DiffusionModelDecoder (atten_decoder) state_dict -> flax params.

    AttenUNet-family naming: conv_in, middle_block.{resnet_1,attention,
    resnet_2}, up_blocks.{i}.{resnets,attentions,upsampler}, out.0/out.2.
    """
    sd = strip_ddp_prefix(state_dict)
    out: Dict = {}
    _map_conv(out, "conv_in", "conv_in", sd)
    _map_resnet(out, "middle_block.resnet_1", "mid/resnet_1", sd)
    if _has(sd, "middle_block.attention.transformer_blocks."):
        _map_spatial_transformer(
            out, "middle_block.attention", "mid/attention", sd, transformer_num_layers
        )
    elif _has(sd, "middle_block.attention."):
        _map_attention_block(out, "middle_block.attention", "mid/attention", sd)
    _map_resnet(out, "middle_block.resnet_2", "mid/resnet_2", sd)
    for i in range(num_levels):
        bt, bf = f"up_blocks.{i}", f"up_{i}"
        j = 0
        while _has(sd, f"{bt}.resnets.{j}."):
            _map_resnet(out, f"{bt}.resnets.{j}", f"{bf}_resnet_{j}", sd)
            j += 1
        j = 0
        while _has(sd, f"{bt}.attentions.{j}."):
            pt, pf = f"{bt}.attentions.{j}", f"{bf}_attn_{j}"
            if _has(sd, f"{pt}.transformer_blocks."):
                _map_spatial_transformer(out, pt, pf, sd, transformer_num_layers)
            else:
                _map_attention_block(out, pt, pf, sd)
            j += 1
        if _has(sd, f"{bt}.upsampler.norm1"):
            _map_resnet(out, f"{bt}.upsampler", f"{bf}_upsampler", sd)
        elif _has(sd, f"{bt}.upsampler.conv"):
            _map_conv(out, f"{bt}.upsampler.conv", f"{bf}_upsampler/conv", sd)
    _map_groupnorm(out, "out.0", "out_norm", sd)
    _map_conv(out, "out.2", "conv_out", sd)
    return out


# ---------------------------------------------------------------------------
# BMGAN (bl_methods/BMGAN/bmgan_model.py) — name-structured import from the
# vendored torch Sequential layout. The reference's InstanceNorms are
# affine=False (no parameters); our _InstanceNorm templates fill scale=1 /
# bias=0, which computes the identical normalisation.
# ---------------------------------------------------------------------------


def _map_raw_conv(out, kt, pf, sd, transposed=False):
    """A bare nn.Conv3d / nn.ConvTranspose3d ``kt``.{weight,bias} pair."""
    w = _np(sd[f"{kt}.weight"])
    if transposed:
        # torch ConvTranspose(k,s,p=1) == flax ConvTranspose('SAME') with the
        # spatial axes flipped; layout (in,out,*k) -> (*k,in,out). Verified
        # numerically (tests/test_bmgan_golden_parity.py).
        flip = (slice(None), slice(None)) + (slice(None, None, -1),) * (w.ndim - 2)
        w = np.ascontiguousarray(w[flip].transpose(tuple(range(2, w.ndim)) + (0, 1)))
    else:
        w = _conv_w(w)
    _set(out, f"{pf}/kernel", w)
    if f"{kt}.bias" in sd:
        _set(out, f"{pf}/bias", _np(sd[f"{kt}.bias"]))


def _fill_in_norm(out, pf, c):
    """affine-free torch InstanceNorm -> identity affine in our template."""
    _set(out, f"{pf}/scale", np.ones(c, np.float32))
    _set(out, f"{pf}/bias", np.zeros(c, np.float32))


def _map_dense_block(out, pt, pf, sd):
    """reference get_dense_block (bmgan_model.py:12-23): two rounds of
    [ConvDenseBlock(num_res_units=1) -> fuse conv -> InstanceNorm -> LReLU]
    onto our _DenseBlock's unit_{j}/fuse_{j}/norm_{j}."""
    for j, base in enumerate((0, 4)):
        uc = f"{pt}.{base}.layers0.conv.unit0.conv"
        _map_raw_conv(out, uc, f"{pf}/unit_{j}/conv", sd)
        c_unit = int(_np(sd[f"{uc}.weight"]).shape[0])
        _fill_in_norm(out, f"{pf}/unit_{j}/norm", c_unit)
        if f"{pt}.{base}.layers0.residual.weight" in sd:
            _map_raw_conv(out, f"{pt}.{base}.layers0.residual", f"{pf}/unit_{j}/skip", sd)
        fc = f"{pt}.{base + 1}"
        _map_raw_conv(out, fc, f"{pf}/fuse_{j}", sd)
        _fill_in_norm(out, f"{pf}/norm_{j}", int(_np(sd[f"{fc}.weight"]).shape[0]))


def import_bmgan_generator(state_dict: Mapping[str, Any]) -> Dict:
    """torch dense_unet_generator state_dict -> flax DenseUNetGenerator params
    (bmgan_model.py:25-101; checkpointed at train_bmgan.py:293-305)."""
    sd = strip_ddp_prefix(state_dict)
    out: Dict = {}
    _map_raw_conv(out, "input_layer.0", "stem_0", sd)
    _fill_in_norm(out, "stem_norm_0", int(_np(sd["input_layer.0.weight"]).shape[0]))
    _map_raw_conv(out, "input_layer.3", "stem_1", sd)
    _fill_in_norm(out, "stem_norm_1", int(_np(sd["input_layer.3.weight"]).shape[0]))
    _map_raw_conv(out, "input_layer.6", "stem_down", sd)
    _fill_in_norm(out, "stem_down_norm", int(_np(sd["input_layer.6.weight"]).shape[0]))

    i = 0
    while _has(sd, f"down_layers.{i}."):
        _map_dense_block(out, f"down_layers.{i}", f"down_dense_{i}", sd)
        _map_raw_conv(out, f"down_layers.{i}.8", f"down_conv_{i}", sd)
        _fill_in_norm(out, f"down_norm_{i}", int(_np(sd[f"down_layers.{i}.8.weight"]).shape[0]))
        i += 1

    _map_dense_block(out, "middle_layers", "middle", sd)

    i = 0
    while _has(sd, f"up_layers.{i}."):
        _map_dense_block(out, f"up_layers.{i}", f"up_dense_{i}", sd)
        _map_raw_conv(out, f"up_layers.{i}.8", f"up_tconv_{i}", sd, transposed=True)
        _fill_in_norm(out, f"up_norm_{i}", int(_np(sd[f"up_layers.{i}.8.weight"]).shape[1]))
        i += 1

    _map_raw_conv(out, "output_layer.0", "head_0", sd)
    _fill_in_norm(out, "head_norm_0", int(_np(sd["output_layer.0.weight"]).shape[0]))
    _map_raw_conv(out, "output_layer.3", "head_1", sd)
    _fill_in_norm(out, "head_norm_1", int(_np(sd["output_layer.3.weight"]).shape[0]))
    _map_raw_conv(out, "output_layer.6", "head_out", sd)
    return out


def import_bmgan_encoder(state_dict: Mapping[str, Any]) -> Dict:
    """torch ResNet_encoder state_dict -> flax ResNetEncoder params
    (bmgan_model.py:103-130: MONAI ResidualUnit stride 2, subunits=2,
    PReLU; linear heads permuted for the NCDHW->NDHWC flatten)."""
    sd = strip_ddp_prefix(state_dict)
    out: Dict = {}
    _map_raw_conv(out, "input_layer.0", "stem", sd)
    _fill_in_norm(out, "stem_norm", int(_np(sd["input_layer.0.weight"]).shape[0]))
    i = 0
    last_c = None
    while _has(sd, f"resblocks.{i}."):
        pt, pf = f"resblocks.{i}", f"res_{i}"
        _map_raw_conv(out, f"{pt}.conv.unit0.conv", f"{pf}/conv", sd)
        c = int(_np(sd[f"{pt}.conv.unit0.conv.weight"]).shape[0])
        _fill_in_norm(out, f"{pf}/norm", c)
        _set(out, f"{pf}/prelu_0", _np(sd[f"{pt}.conv.unit0.adn.A.weight"]).reshape(1))
        _map_raw_conv(out, f"{pt}.conv.unit1.conv", f"{pf}/conv_1", sd)
        _fill_in_norm(out, f"{pf}/norm_1", c)
        _set(out, f"{pf}/prelu_1", _np(sd[f"{pt}.conv.unit1.adn.A.weight"]).reshape(1))
        if f"{pt}.residual.weight" in sd:
            _map_raw_conv(out, f"{pt}.residual", f"{pf}/skip", sd)
        last_c = c
        i += 1
    for t, f in (("linear1", "mu"), ("linear2", "log_var")):
        w = _np(sd[f"{t}.weight"])  # (latent, C*S) over (C, D, H, W) flatten
        s = w.shape[1] // last_c
        w = w.reshape(w.shape[0], last_c, s).transpose(0, 2, 1).reshape(w.shape[0], -1)
        _set(out, f"{f}/kernel", w.T)
        _set(out, f"{f}/bias", _np(sd[f"{t}.bias"]))
    return out


def import_checkpoint(path: str, num_levels: int, transformer_num_layers: int = 1) -> Dict[str, Any]:
    """Load a reference .ckpt; returns {"unet": flax_params_subtree,
    "epoch": int, "raw": full torch dict}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out: Dict[str, Any] = {"raw": ckpt, "epoch": ckpt.get("epoch")}
    if "unet" in ckpt:
        out["unet"] = {"params": import_atten_unet(ckpt["unet"], num_levels, transformer_num_layers)}
    if "discriminator" in ckpt:
        try:
            out["discriminator"] = {"params": import_patch_discriminator(ckpt["discriminator"])}
        except ValueError:
            pass  # non-default ladder depth; import explicitly with num_layers_d
    return out
