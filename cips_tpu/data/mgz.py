"""FreeSurfer MGH/MGZ reader (pure numpy).

The reference converts FastSurfer's `aseg.mgz` to NIfTI with FreeSurfer's
`mri_convert` before computing SUVR (proprocess/apply_surfurseg_to_PET.py:
119-121). This reader consumes .mgz directly, removing the FreeSurfer
binary dependency from the clinical-validation chain.

MGH format: big-endian; 284-byte header (version, width, height, depth,
nframes, type, dof, goodRASFlag, spacing + direction cosines), voxel data
x-fastest. Types: 0=uint8, 1=int32, 3=float32, 4=int16.
"""

from __future__ import annotations

import gzip
import struct
from typing import Tuple

import numpy as np

_DATA_OFFSET = 284
_TYPES = {0: np.uint8, 1: np.dtype(">i4"), 3: np.dtype(">f4"), 4: np.dtype(">i2")}


def read_mgz(path: str) -> Tuple[np.ndarray, Tuple[float, float, float]]:
    """Returns (volume, spacing). Volume is (z, y, x)[, frames] — the same
    z-major convention as cips_tpu.data.nifti."""
    opener = gzip.open if path.endswith((".mgz", ".gz")) else open
    with opener(path, "rb") as f:
        raw = f.read()
    version, width, height, depth, nframes, dtype_code, _dof = struct.unpack_from(">7i", raw, 0)
    if version != 1:
        raise ValueError(f"{path}: unsupported MGH version {version}")
    if dtype_code not in _TYPES:
        raise ValueError(f"{path}: unsupported MGH dtype code {dtype_code}")
    good_ras = struct.unpack_from(">h", raw, 28)[0]
    spacing = (1.0, 1.0, 1.0)
    if good_ras > 0:
        sx, sy, sz = struct.unpack_from(">3f", raw, 30)
        spacing = (float(sx), float(sy), float(sz))

    dt = np.dtype(_TYPES[dtype_code])
    count = width * height * depth * nframes
    data = np.frombuffer(raw, dtype=dt, count=count, offset=_DATA_OFFSET)
    # x fastest: stored as [frame][z][y][x]
    data = data.reshape(nframes, depth, height, width)
    if nframes == 1:
        data = data[0]
    # native byte order for downstream math
    return np.ascontiguousarray(data.astype(dt.newbyteorder("="))), spacing


def read_segmentation(path: str) -> np.ndarray:
    """Read a FastSurfer/FreeSurfer segmentation (.mgz or .nii[.gz]) as an
    int32 (z, y, x) label volume."""
    if path.endswith(".mgz"):
        vol, _ = read_mgz(path)
    else:
        from cips_tpu.data import nifti

        vol = nifti.read_array(path)
    return np.asarray(vol, np.int32)
