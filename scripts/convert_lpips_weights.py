"""Convert torch LPIPS weights to the cips_tpu perceptual-loss .npz format.

Offline tool (torch required; run wherever the pretrained checkpoints are
available — this environment has no network egress, so the conversion is
validated on randomly initialised state_dicts by
tests/test_perceptual_parity.py and real weights drop in later).

Inputs:
  --backbone  state_dict of torchvision `squeezenet1_1().features` /
              `alexnet().features` (or of the full model; the `features.`
              prefix is stripped automatically), saved with torch.save.
  --lpips     (optional) state_dict of richzhang `lpips.LPIPS(net=...)`,
              supplying the pretrained `lin*.model.1.weight` calibration
              convs. Without it the lins default to the uniform average 1/C
              (what `PerceptualLoss.init` also produces).

Output: .npz with flat "/"-joined flax paths under the `PerceptualLoss`
module tree, loadable via cips_tpu.models.perceptual.params_from_npz.

Usage:
  python scripts/convert_lpips_weights.py --net squeeze \
      --backbone squeezenet1_1.pth [--lpips lpips_squeeze.pth] -o squeeze.npz
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cips_tpu.models.perceptual import ALEX_TAP_CHANNELS, SQUEEZE_TAP_CHANNELS

# torchvision features.<idx> -> flax module name
SQUEEZE_LAYER_NAMES = {
    0: "conv0",
    3: "fire3",
    4: "fire4",
    6: "fire6",
    7: "fire7",
    9: "fire9",
    10: "fire10",
    11: "fire11",
    12: "fire12",
}
ALEX_LAYER_NAMES = {0: "conv0", 3: "conv3", 6: "conv6", 8: "conv8", 10: "conv10"}


def _t2f(w: np.ndarray) -> np.ndarray:
    """torch conv weight (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convert_backbone(state: dict, net: str) -> dict:
    """torch `.features` state_dict -> flat flax paths under lpips/net."""
    names = SQUEEZE_LAYER_NAMES if net == "squeeze" else ALEX_LAYER_NAMES
    out = {}
    for key, value in state.items():
        key = key.removeprefix("features.")
        parts = key.split(".")
        idx = int(parts[0])
        if idx not in names:  # classifier / pooling layers carry no params
            continue
        name = names[idx]
        value = np.asarray(value, np.float32)
        if len(parts) == 2:  # plain conv: "<idx>.weight"
            leaf = "kernel" if parts[1] == "weight" else "bias"
            out[f"lpips/net/{name}/{leaf}"] = _t2f(value) if leaf == "kernel" else value
        else:  # fire: "<idx>.squeeze.weight" etc.
            sub, leaf = parts[1], "kernel" if parts[2] == "weight" else "bias"
            out[f"lpips/net/{name}/{sub}/{leaf}"] = _t2f(value) if leaf == "kernel" else value
    return out


def convert_lins(state: dict, net: str, strict: bool = False) -> dict:
    """richzhang lpips.LPIPS state_dict -> lpips/lin{i} (C, 1) arrays.

    Checkpoints saved with use_dropout=True store the conv at ``model.1``;
    with use_dropout=False it is ``model.0`` — both layouts are accepted.
    With ``strict`` (set when --lpips was explicitly supplied) a tap with no
    matching key raises instead of silently falling back to 1/C calibration.
    """
    taps = SQUEEZE_TAP_CHANNELS if net == "squeeze" else ALEX_TAP_CHANNELS
    out = {}
    for i, c in enumerate(taps):
        candidates = (
            f"lins.{i}.model.1.weight",
            f"lin{i}.model.1.weight",
            f"lins.{i}.model.0.weight",
            f"lin{i}.model.0.weight",
        )
        for key in candidates:
            if key in state:
                w = np.asarray(state[key], np.float32)  # (1, C, 1, 1)
                out[f"lpips/lin{i}"] = w.reshape(1, c).T.copy()
                break
        else:
            if strict:
                raise KeyError(
                    f"--lpips state_dict has no lin weight for tap {i} "
                    f"(tried {candidates}); keys present: {sorted(state)[:8]}..."
                )
            out[f"lpips/lin{i}"] = np.full((c, 1), 1.0 / c, np.float32)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", choices=["squeeze", "alex"], required=True)
    ap.add_argument("--backbone", required=True, help="torch .pth state_dict of the features")
    ap.add_argument("--lpips", default=None, help="optional lpips.LPIPS state_dict for the lins")
    ap.add_argument("-o", "--out", required=True)
    args = ap.parse_args(argv)

    import torch

    backbone = torch.load(args.backbone, map_location="cpu", weights_only=True)
    flat = convert_backbone({k: v.numpy() for k, v in backbone.items()}, args.net)
    lins = {}
    if args.lpips:
        lp = torch.load(args.lpips, map_location="cpu", weights_only=True)
        lins = {k: v.numpy() for k, v in lp.items()}
    flat.update(convert_lins(lins, args.net, strict=bool(args.lpips)))
    np.savez(args.out, **flat)
    print(f"wrote {len(flat)} arrays -> {args.out}")


if __name__ == "__main__":
    main()
