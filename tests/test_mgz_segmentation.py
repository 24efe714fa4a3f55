"""MGZ reader + segmentation driver tests."""

import gzip
import os
import struct

import numpy as np

from cips_tpu.data.mgz import read_mgz, read_segmentation
from cips_tpu.data.segmentation import find_segmentation, segment_tree


def _write_mgz(path, vol, spacing=(1.0, 1.0, 1.0)):
    """Minimal MGH writer for tests (big-endian, version 1)."""
    depth, height, width = vol.shape  # our z, y, x
    dtype_code = {np.dtype(np.uint8): 0, np.dtype(np.int32): 1,
                  np.dtype(np.float32): 3, np.dtype(np.int16): 4}[vol.dtype]
    hdr = bytearray(284)
    struct.pack_into(">7i", hdr, 0, 1, width, height, depth, 1, dtype_code, 0)
    struct.pack_into(">h", hdr, 28, 1)
    struct.pack_into(">3f", hdr, 30, *spacing)
    be = vol.astype(vol.dtype.newbyteorder(">"))
    payload = bytes(hdr) + be.tobytes()  # [z][y][x], x fastest
    with gzip.open(path, "wb") as f:
        f.write(payload)


def test_read_mgz_roundtrip(tmp_path):
    vol = np.arange(2 * 3 * 4, dtype=np.int32).reshape(2, 3, 4)
    p = str(tmp_path / "aseg.mgz")
    _write_mgz(p, vol, spacing=(1.5, 1.0, 2.0))
    back, spacing = read_mgz(p)
    np.testing.assert_array_equal(back, vol)
    assert spacing == (1.5, 1.0, 2.0)
    seg = read_segmentation(p)
    assert seg.dtype == np.int32


def test_segment_tree_with_mock_runner(tmp_path):
    from cips_tpu.data import nifti

    t1_root = tmp_path / "t1"
    out_root = tmp_path / "seg"
    for subj, date in (("s1", "2011-01-01"), ("s2", "2012-01-01")):
        d = t1_root / subj / date
        d.mkdir(parents=True)
        nifti.write(str(d / "t1.nii.gz"), np.zeros((4, 4, 4), np.float32))
    # pre-complete s1 so it's skipped
    done = out_root / "s1" / "2011-01-01"
    done.mkdir(parents=True)
    (done / "aparc.DKTatlas+aseg.deep.mgz").write_bytes(b"")

    calls = []

    def runner(cmd):
        calls.append(cmd)
        return 0

    n_run, n_skip = segment_tree(str(t1_root), str(out_root), runner=runner)
    assert n_run == 1 and n_skip == 1
    assert any("run_fastsurfer.sh" in part for part in calls[0])


def test_find_segmentation_nearest_date(tmp_path):
    seg_root = tmp_path / "seg"
    for date in ("2011-01-01", "2013-01-01"):
        d = seg_root / "s1" / date
        d.mkdir(parents=True)
        (d / "aseg.mgz").write_bytes(b"")
    got = find_segmentation(str(seg_root), "s1", "2012-10-01")
    assert got is not None and "2013-01-01" in got
