"""Folder-pair metric tool CLI (== unet/scripts/metrics.py).

  python -m cips_tpu.cli.metrics --root /path/to/predict [--intensity_match]
"""

from __future__ import annotations

import argparse
import json

from cips_tpu.eval.pair_metrics import METRIC_SHAPE, folder_pair_metrics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True, help="tree of {subject}/{date}/{ori,rec}.nii.gz")
    p.add_argument("--real_name", default="ori.nii.gz")
    p.add_argument("--rec_name", default="rec.nii.gz")
    p.add_argument("--intensity_match", action="store_true",
                   help="scale rec to real's mean intensity (metrics.py:51-52)")
    p.add_argument("--metric_shape", type=int, nargs=3, default=list(METRIC_SHAPE))
    args = p.parse_args(argv)
    out = folder_pair_metrics(
        args.root,
        real_name=args.real_name,
        rec_name=args.rec_name,
        metric_shape=tuple(args.metric_shape),
        intensity_match=args.intensity_match,
    )
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
