"""Torch-checkpoint importer round trip.

Builds a reference-style torch state_dict FROM a flax AttenUNet's params via
the inverse name/layout mapping, imports it, and checks the result
reproduces the original parameter tree exactly. This pins the bijection
between the reference's module names (unet/utils/atten_unet_model.py) and
the cips_tpu tree.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cips_tpu.data.torch_import import import_atten_unet
from cips_tpu.models.atten_unet import AttenUNet

SEGMENT_MAP = [
    ("down_", "down_blocks."),
    ("up_", "up_blocks."),
    ("mid", "middle_block"),
    ("resnet_", "resnets."),
    ("attn_", "attentions."),
    ("block_", "transformer_blocks."),
    ("out_norm", "out.0"),
    ("conv_out", "out.2"),
    ("skip", "skip_connection"),
]


def _torch_segment(seg: str, parent: str) -> str:
    if seg == "mid":
        return "middle_block"
    if seg in ("resnet_1", "resnet_2") and parent == "mid":
        return seg  # middle_block.resnet_1 / resnet_2 keep their names
    if seg == "attention" and parent == "mid":
        return "attention"
    for pre, rep in SEGMENT_MAP:
        if seg.startswith(pre) and seg[len(pre):].isdigit():
            return rep + seg[len(pre):]
    if seg == "out_norm":
        return "out.0"
    if seg == "conv_out":
        return "out.2"
    if seg == "skip":
        return "skip_connection"
    if seg == "ff":
        return "ff"
    return seg


def flax_to_torch_sd(params):
    """Inverse of the importer: flax params -> torch-style state_dict."""
    sd = {}
    flat = jax.tree_util.tree_leaves_with_path(params["params"])
    for path, leaf in flat:
        segs = [p.key for p in path]
        leaf = np.asarray(leaf)
        parent = segs[-3] if len(segs) >= 3 else ""
        torch_segs = []
        for i, s in enumerate(segs[:-1]):
            torch_segs.append(_torch_segment(s, segs[i - 1] if i else ""))
        name = segs[-1]
        joined = ".".join(t for t in torch_segs if t != "GroupNorm_0")

        is_groupnorm = "GroupNorm_0" in segs
        in_transformer_ln = name in ("scale", "bias") and not is_groupnorm and segs[-2].startswith("norm")
        if is_groupnorm or in_transformer_ln:
            key = f"{joined}.{'weight' if name == 'scale' else 'bias'}"
            sd[key] = torch.from_numpy(leaf.copy())
        elif name == "kernel" and leaf.ndim >= 4:
            # conv: flax (*k, in, out) -> torch (out, in, *k), MONAI wraps as .conv
            axes = (leaf.ndim - 1, leaf.ndim - 2) + tuple(range(leaf.ndim - 2))
            sd[f"{joined}.conv.weight"] = torch.from_numpy(leaf.transpose(axes).copy())
        elif name == "kernel":
            # linear
            if segs[-2] == "to_out":
                sd[f"{joined}.0.weight"] = torch.from_numpy(leaf.T.copy())
            elif segs[-2] == "proj_in" and segs[-3] == "ff":
                sd[f"{'.'.join(t for t in torch_segs[:-1])}.linear1.weight"] = torch.from_numpy(leaf.T.copy())
            elif segs[-2] == "proj_out" and segs[-3] == "ff":
                sd[f"{'.'.join(t for t in torch_segs[:-1])}.linear2.weight"] = torch.from_numpy(leaf.T.copy())
            else:
                sd[f"{joined}.weight"] = torch.from_numpy(leaf.T.copy())
        elif name == "bias":
            parent_seg = segs[-2]
            if parent_seg == "to_out":
                sd[f"{joined}.0.bias"] = torch.from_numpy(leaf.copy())
            elif parent_seg == "proj_in" and segs[-3] == "ff":
                sd[f"{'.'.join(t for t in torch_segs[:-1])}.linear1.bias"] = torch.from_numpy(leaf.copy())
            elif parent_seg == "proj_out" and segs[-3] == "ff":
                sd[f"{'.'.join(t for t in torch_segs[:-1])}.linear2.bias"] = torch.from_numpy(leaf.copy())
            elif leaf.ndim == 1 and _is_conv_bias(params, segs):
                sd[f"{joined}.conv.bias"] = torch.from_numpy(leaf.copy())
            else:
                sd[f"{joined}.bias"] = torch.from_numpy(leaf.copy())
        else:
            raise AssertionError(f"unhandled leaf {segs}")
    return sd


def _is_conv_bias(params, segs):
    node = params["params"]
    for s in segs[:-1]:
        node = node[s]
    return "kernel" in node and np.asarray(node["kernel"]).ndim >= 4


def test_import_round_trip():
    model = AttenUNet(
        spatial_dims=3,
        num_res_blocks=1,
        num_channels=(8, 8),
        norm_num_groups=8,
        attention_levels=(False, True),
        num_head_channels=(0, 4),
        resblock_updown=True,
        with_conditioning=True,
        cross_attention_dim=3,
    )
    x = jnp.ones((1, 8, 8, 8, 1))
    ctx = jnp.ones((1, 1, 3))
    params = model.init(jax.random.key(0), x, ctx)

    sd = flax_to_torch_sd(params)
    # DDP prefix handling
    sd = {f"module.{k}": v for k, v in sd.items()}
    imported = {"params": import_atten_unet(sd, num_levels=2)}

    flat_orig = {jax.tree_util.keystr(k): np.asarray(v)
                 for k, v in jax.tree_util.tree_leaves_with_path(params)}
    flat_imp = {jax.tree_util.keystr(k): np.asarray(v)
                for k, v in jax.tree_util.tree_leaves_with_path(imported)}
    assert set(flat_orig) == set(flat_imp), (
        set(flat_orig) ^ set(flat_imp)
    )
    for k in flat_orig:
        np.testing.assert_array_equal(flat_imp[k], flat_orig[k], err_msg=k)

    # imported params drive the model
    y = model.apply(imported, x, ctx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(model.apply(params, x, ctx)), atol=1e-6)


def test_import_encoder_round_trip():
    from cips_tpu.data.torch_import import import_diffusion_encoder
    from cips_tpu.models.encoder import DiffusionModelEncoder

    model = DiffusionModelEncoder(
        in_channels=2,
        out_channels=2,
        num_channels=(8, 8),
        num_res_blocks=1,
        attention_levels=(False, True),
        norm_num_groups=8,
        num_head_channels=(0, 4),
        resblock_updown=True,
        head="mlp",
    )
    x = jnp.ones((1, 8, 8, 8, 2))
    params = model.init(jax.random.key(0), x)

    sd = flax_to_torch_sd(params)
    # rename the flax head (fc1/fc2) to the reference's Sequential indices
    renames = {"fc1.weight": "out.0.weight", "fc1.bias": "out.0.bias",
               "fc2.weight": "out.3.weight", "fc2.bias": "out.3.bias"}
    sd = {renames.get(k, k): v for k, v in sd.items()}
    # fc1's input is flattened (D,H,W,C) on the flax side but (C,D,H,W) in
    # the reference (atten_unet_model.py:2030) — emit torch ordering so the
    # importer's permutation round-trips
    w = sd["out.0.weight"].numpy()  # (hidden, S*C)
    c = 8  # num_channels[-1]
    s = w.shape[1] // c
    sd["out.0.weight"] = torch.from_numpy(
        w.reshape(w.shape[0], s, c).transpose(0, 2, 1).reshape(w.shape[0], -1).copy()
    )
    imported = {"params": import_diffusion_encoder(sd, num_levels=2)}

    flat_orig = {jax.tree_util.keystr(k): np.asarray(v)
                 for k, v in jax.tree_util.tree_leaves_with_path(params)}
    flat_imp = {jax.tree_util.keystr(k): np.asarray(v)
                for k, v in jax.tree_util.tree_leaves_with_path(imported)}
    assert set(flat_orig) == set(flat_imp)
    for k in flat_orig:
        np.testing.assert_array_equal(flat_imp[k], flat_orig[k], err_msg=k)
    y = model.apply(imported, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(model.apply(params, x)), atol=1e-6)
