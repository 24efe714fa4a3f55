"""ctypes bindings + build for the native C++ data-loading runtime.

`build()` compiles cips_tpu/runtime/nifti_loader.cpp into libcips_runtime.so
(g++ -O3, linked against zlib); `load()` returns the ctypes handle, building
on demand. `decode` and `NativePrefetcher` are the user-facing API; callers
fall back to the pure-Python path (cips_tpu/data/nifti.py) when the
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "nifti_loader.cpp")
_BUILD_DIR = os.path.join(_DIR, "build")
_LIB = os.path.join(_BUILD_DIR, "libcips_runtime.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the runtime library if needed. Returns the .so path."""
    if not force and os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB, _SRC, "-lz", "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(build())
            lib.cips_nifti_decode.restype = ctypes.c_int
            lib.cips_nifti_decode.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ]
            lib.cips_nifti_shape.restype = ctypes.c_int
            lib.cips_nifti_shape.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
            lib.cips_prefetcher_create.restype = ctypes.c_void_p
            lib.cips_prefetcher_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int64,
            ]
            lib.cips_prefetcher_submit.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64
            ]
            lib.cips_prefetcher_next.restype = ctypes.c_int64
            lib.cips_prefetcher_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
            lib.cips_prefetcher_errors.restype = ctypes.c_int64
            lib.cips_prefetcher_errors.argtypes = [ctypes.c_void_p]
            lib.cips_prefetcher_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
    return _lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def decode(path: str, shape: Sequence[int], normalize: bool = True) -> np.ndarray:
    """Decode + fused pad/crop/max-normalise into a (z, y, x) float32 array."""
    lib = load()
    tz, ty, tx = (int(s) for s in shape)
    out = np.empty((tz, ty, tx), np.float32)
    rc = lib.cips_nifti_decode(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), tz, ty, tx,
        1 if normalize else 0,
    )
    if rc != 0:
        raise IOError(f"native NIfTI decode failed: {path}")
    return out


def nifti_shape(path: str) -> tuple:
    lib = load()
    zyx = (ctypes.c_int64 * 3)()
    if lib.cips_nifti_shape(path.encode(), zyx) != 0:
        raise IOError(f"native NIfTI header parse failed: {path}")
    return (zyx[0], zyx[1], zyx[2])


class NativePrefetcher:
    """Background decode of (t1, pet) path pairs into (2, z, y, x) samples."""

    def __init__(
        self,
        t1_paths: Sequence[str],
        pet_paths: Sequence[str],
        shape: Sequence[int],
        normalize: bool = True,
        n_threads: int = 2,
        capacity: int = 8,
    ):
        assert len(t1_paths) == len(pet_paths)
        self._lib = load()
        self.shape = tuple(int(s) for s in shape)
        self.n = len(t1_paths)
        self._t1 = (ctypes.c_char_p * self.n)(*[p.encode() for p in t1_paths])
        self._pet = (ctypes.c_char_p * self.n)(*[p.encode() for p in pet_paths])
        self._handle = self._lib.cips_prefetcher_create(
            self._t1, self._pet, self.n, *self.shape, 1 if normalize else 0,
            n_threads, capacity,
        )
        if not self._handle:
            raise RuntimeError("failed to create native prefetcher")

    def submit(self, indices: Sequence[int]) -> None:
        arr = (ctypes.c_int64 * len(indices))(*[int(i) for i in indices])
        self._lib.cips_prefetcher_submit(self._handle, arr, len(indices))

    def next(self) -> tuple:
        """(index, (2, z, y, x) float32) — blocks until a sample is decoded.

        Returns (-1, None) when the queue is fully drained (pending,
        in-flight and ready all empty), and (index, None) when that sample's
        decode FAILED — the caller must skip it (never train on it)."""
        out = np.empty((2,) + self.shape, np.float32)
        idx = int(self._lib.cips_prefetcher_next(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        ))
        if idx == -1:
            return -1, None
        if idx <= -2:  # -2 - sample_index encodes a per-sample decode failure
            return -2 - idx, None
        return idx, out

    @property
    def errors(self) -> int:
        return int(self._lib.cips_prefetcher_errors(self._handle))

    def close(self) -> None:
        if self._handle:
            self._lib.cips_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
