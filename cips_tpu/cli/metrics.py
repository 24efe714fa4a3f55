"""Folder-pair metric tool CLI (== unet/scripts/metrics.py).

Single-root mode (the tree `cli.output_predict` writes):
  python -m cips_tpu.cli.metrics --root /path/to/predict
Two-tree mode (reference signature — separate real and synthesized trees,
first file per session dir, metrics.py:11,24-46):
  python -m cips_tpu.cli.metrics --root SYS_TREE --real_root REAL_TREE

Mean-intensity matching (`sys / mean(sys) * mean(real)`, metrics.py:51-52)
is ON by default like the reference's ``set_mean=True``; disable with
--no_intensity_match.
"""

from __future__ import annotations

import argparse
import json

from cips_tpu.eval.pair_metrics import METRIC_SHAPE, folder_pair_metrics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True,
                   help="tree of {subject}/{date}/ with both volumes, or the "
                        "synthesized tree when --real_root is given")
    p.add_argument("--real_root", default=None,
                   help="separate real-volume tree (reference two-folder mode)")
    p.add_argument("--real_name", default="ori.nii.gz")
    p.add_argument("--rec_name", default="rec.nii.gz")
    p.add_argument("--no_intensity_match", action="store_true",
                   help="disable sys->real mean matching (set_mean=False)")
    p.add_argument("--metric_shape", type=int, nargs=3, default=list(METRIC_SHAPE))
    args = p.parse_args(argv)
    out = folder_pair_metrics(
        args.root,
        real_name=args.real_name,
        rec_name=args.rec_name,
        real_root=args.real_root,
        metric_shape=tuple(args.metric_shape),
        intensity_match=not args.no_intensity_match,
    )
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
