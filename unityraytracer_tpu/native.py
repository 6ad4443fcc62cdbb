"""ctypes bindings for the native (C++) host runtime.

The reference's host-side heavy lifting (BVH build, geometry flattening) runs
as compiled C# inside Unity; our analog is a small C++ library
(``csrc/lbvh.cpp``) built with g++ into ``_urt_native.so`` and loaded here via
ctypes. Every entry point has a pure numpy/Python fallback so the framework
works without the extension; the native path matters for large-scene rebuild
latency (dynamic scenes rebuild their LBVH per frame, mirroring the
dirty-flag rebuild at RayTraceMaster.cs:850).

Build: ``make -C unityraytracer_tpu/csrc`` (or ``python -m
unityraytracer_tpu.native`` which shells out to make).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_LIB_PATH = os.path.join(_CSRC, "_urt_native.so")
_lib = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.urt_radix_tree.restype = ctypes.c_int
        lib.urt_radix_tree.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.urt_morton_sort.restype = ctypes.c_int
        lib.urt_morton_sort.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_int64),
        ]
        try:   # stale .so built before the PIZ entry point: skip, keep rest
            lib.urt_huf_decode.restype = ctypes.c_int
            lib.urt_huf_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
            ]
        except AttributeError:
            pass
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def build(verbose: bool = False) -> bool:
    """Compile the native library in place. Returns success."""
    try:
        out = subprocess.run(["make", "-C", _CSRC], capture_output=True, text=True)
        if verbose or out.returncode != 0:
            sys.stderr.write(out.stdout + out.stderr)
        global _load_failed, _lib
        _load_failed, _lib = False, None
        return out.returncode == 0 and _load() is not None
    except FileNotFoundError:
        return False


def radix_tree(keys_sorted: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Karras radix tree over sorted unique uint64 keys.

    Returns (left, right) int32 arrays of length C-1, or None when the native
    library is unavailable (caller falls back to the Python builder).
    """
    lib = _load()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys_sorted, np.uint64)
    n = len(keys)
    if n < 2:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    left = np.empty(n - 1, np.int32)
    right = np.empty(n - 1, np.int32)
    rc = lib.urt_radix_tree(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n,
        left.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        right.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        return None
    return left, right


def morton_sort(points01: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Morton codes + argsort order for (N, 3) points in [0,1]^3, or None."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points01, np.float32)
    n = len(pts)
    codes = np.empty(n, np.uint64)
    order = np.empty(n, np.int64)
    rc = lib.urt_morton_sort(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        return None
    return codes, order


def huf_decode(blob: bytes, pos: int, n_bits: int, lengths: np.ndarray,
               rlc: int, n_out: int) -> Optional[np.ndarray]:
    """Canonical-Huffman decode of an EXR PIZ symbol stream (hot loop of
    4K-HDRI loading), or None when the native library is unavailable
    (models/piz.py falls back to the Python decoder)."""
    lib = _load()
    if lib is None or not hasattr(lib, "urt_huf_decode"):
        return None
    data = np.frombuffer(blob, np.uint8)
    lens = np.ascontiguousarray(lengths, np.int32)
    out = np.empty(n_out, np.uint16)
    rc = lib.urt_huf_decode(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(pos), int(n_bits),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), int(rlc),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), n_out)
    if rc != 0:
        raise ValueError(f"corrupt huffman stream (native rc={rc})")
    return out


if __name__ == "__main__":
    ok = build(verbose=True)
    print(f"native build: {'ok' if ok else 'FAILED'}; available={available()}")
