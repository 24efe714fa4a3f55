"""Segmentation drivers — FastSurfer/iBEAT orchestration.

The reference drives FastSurfer per subject/date through a singularity
container (`proprocess/fastsurfer_t1.py:25-31`, `run_fastsurfer.sh
--seg_only`). That container is an external clinical tool, not something to
re-implement; this module keeps the same orchestration contract (walk the
{root}/{Subject}/{date}/ tree, skip completed sessions, invoke the
container per T1) with the runner injectable so environments without
singularity can plug their own.

Segmentation *outputs* (aseg.mgz / iBEAT NIfTIs) are consumed natively by
`cips_tpu.data.mgz.read_segmentation` + `cips_tpu.ops.suvr`.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Callable, List, Optional, Sequence, Tuple

from cips_tpu.data.manifest import scan_session_dirs


def default_fastsurfer_command(
    t1_path: str, out_dir: str, subject_id: str, sif_path: str = "fastsurfer.sif"
) -> List[str]:
    """singularity invocation mirroring fastsurfer_t1.py:25-31 (--seg_only)."""
    return [
        "singularity", "exec", "--nv",
        "-B", f"{os.path.dirname(t1_path)}:/data",
        "-B", f"{out_dir}:/output",
        sif_path,
        "/fastsurfer/run_fastsurfer.sh",
        "--t1", f"/data/{os.path.basename(t1_path)}",
        "--sid", subject_id,
        "--sd", "/output",
        "--seg_only",
    ]


def segment_tree(
    t1_root: str,
    out_root: str,
    runner: Optional[Callable[[Sequence[str]], int]] = None,
    command_builder: Callable = default_fastsurfer_command,
    done_marker: str = "aparc.DKTatlas+aseg.deep.mgz",
) -> Tuple[int, int]:
    """Run segmentation for every T1 session lacking a completed output.

    Returns (n_run, n_skipped). ``runner`` defaults to subprocess.run and
    must return the process return code; sessions already holding
    ``done_marker`` are skipped (the reference's idempotency guard).
    """
    if runner is None:
        if shutil.which("singularity") is None:
            raise RuntimeError(
                "singularity not available; pass a custom runner or use "
                "precomputed segmentations"
            )
        runner = lambda cmd: subprocess.run(cmd).returncode  # noqa: E731

    n_run = n_skip = 0
    for subject, dates in scan_session_dirs(t1_root).items():
        for date in dates:
            session_out = os.path.join(out_root, subject, date)
            sid = f"{subject}_{date}"
            if _session_done(session_out, sid, done_marker):
                n_skip += 1
                continue
            t1_dir = os.path.join(t1_root, subject, date)
            files = [f for f in sorted(os.listdir(t1_dir)) if f.endswith((".nii", ".nii.gz"))]
            if not files:
                continue
            os.makedirs(session_out, exist_ok=True)
            cmd = command_builder(os.path.join(t1_dir, files[0]), session_out, sid)
            if runner(cmd) == 0:
                n_run += 1
    return n_run, n_skip


def _session_done(session_out: str, sid: str, marker: str) -> bool:
    for root in (os.path.join(session_out, sid, "mri"), session_out):
        if os.path.isfile(os.path.join(root, marker)):
            return True
    return False


def find_segmentation(
    seg_root: str, subject: str, near_date: str
) -> Optional[str]:
    """Nearest-date segmentation file for a subject (appy_iBEAT.py:126-132)."""
    from cips_tpu.data.manifest import days_between

    subj_dir = os.path.join(seg_root, subject)
    if not os.path.isdir(subj_dir):
        return None
    dates = [d for d in sorted(os.listdir(subj_dir)) if os.path.isdir(os.path.join(subj_dir, d))]
    if not dates:
        return None
    best = min(dates, key=lambda d: days_between(d, near_date))
    d = os.path.join(subj_dir, best)
    for f in sorted(os.listdir(d)):
        if f.endswith((".mgz", ".nii", ".nii.gz")) and ("seg" in f or "aseg" in f):
            return os.path.join(d, f)
    for f in sorted(os.listdir(d)):
        if f.endswith((".mgz", ".nii", ".nii.gz")):
            return os.path.join(d, f)
    return None
