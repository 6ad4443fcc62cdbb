"""ctypes bridge to the system OpenEXR C RGBA API — a test ORACLE only.

The package's EXR codecs (models/exr.py, models/piz.py, models/b44.py,
models/dwa.py) are self-contained reimplementations of the OpenEXR v2
scanline formats (reference behavior: the skybox loads of
RayTraceMaster.cs:761-792 accept any Unity-importable EXR). This module
lets the tests cross-validate them against the AUTHORITATIVE
implementation (libOpenEXR's ImfCRgbaFile.h C API) when the shared
library is present: real files in -> our decoder; our writer's files ->
real decoder. Tests import this lazily and skip when the library is
missing, so the suite stays hermetic.
"""
from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

COMP = {"none": 0, "rle": 1, "zips": 2, "zip": 3, "piz": 4,
        "pxr24": 5, "b44": 6, "b44a": 7, "dwaa": 8, "dwab": 9}

_lib = None


def load_lib():
    """Load libOpenEXR (the C++ lib exports the C RGBA API) or None."""
    global _lib
    if _lib is not None:
        return _lib
    for name in ("libOpenEXR-3_1.so.30", "libOpenEXR-3_1.so",
                 "libOpenEXR.so", ctypes.util.find_library("OpenEXR")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            for fn in ("ImfNewHeader", "ImfOpenOutputFile",
                       "ImfOpenInputFile", "ImfInputHeader",
                       "ImfOpenTiledOutputFile"):
                getattr(lib, fn).restype = ctypes.c_void_p
            _lib = lib
            return lib
        except OSError:
            continue
    return None


def available() -> bool:
    return load_lib() is not None


def _halves(img: np.ndarray) -> np.ndarray:
    """(H, W, 3|4) float -> (H, W, 4) float16 with alpha defaulted to 1."""
    h, w = img.shape[:2]
    out = np.ones((h, w, 4), np.float16)
    out[:, :, : img.shape[2]] = img.astype(np.float16)
    return out


def write_rgba(path: str, img: np.ndarray, compression: str) -> None:
    """Write (H, W, 3|4) float data as a half RGBA EXR via libOpenEXR."""
    lib = load_lib()
    assert lib is not None
    h, w = img.shape[:2]
    buf = _halves(img)  # ImfHalf == uint16, same layout as float16
    hdr = ctypes.c_void_p(lib.ImfNewHeader())
    try:
        lib.ImfHeaderSetDataWindow(hdr, 0, 0, w - 1, h - 1)
        lib.ImfHeaderSetDisplayWindow(hdr, 0, 0, w - 1, h - 1)
        lib.ImfHeaderSetCompression(hdr, COMP[compression])
        out = ctypes.c_void_p(
            lib.ImfOpenOutputFile(path.encode(), hdr, 0x0F))  # WRITE_RGBA
        if not out:
            raise OSError("ImfOpenOutputFile failed")
        base = buf.ctypes.data_as(ctypes.c_void_p)
        if not lib.ImfOutputSetFrameBuffer(
                out, base, ctypes.c_size_t(1), ctypes.c_size_t(w)):
            raise OSError("ImfOutputSetFrameBuffer failed")
        if not lib.ImfOutputWritePixels(out, h):
            raise OSError("ImfOutputWritePixels failed")
    finally:
        if "out" in dir() and out:
            lib.ImfCloseOutputFile(out)
        lib.ImfDeleteHeader(hdr)


def write_rgba_tiled(path: str, img: np.ndarray, compression: str,
                     tile=(16, 16)) -> None:
    """Write a ONE_LEVEL tiled half RGBA EXR via libOpenEXR."""
    lib = load_lib()
    assert lib is not None
    h, w = img.shape[:2]
    buf = _halves(img)
    hdr = ctypes.c_void_p(lib.ImfNewHeader())
    try:
        lib.ImfHeaderSetDataWindow(hdr, 0, 0, w - 1, h - 1)
        lib.ImfHeaderSetDisplayWindow(hdr, 0, 0, w - 1, h - 1)
        lib.ImfHeaderSetCompression(hdr, COMP[compression])
        out = ctypes.c_void_p(lib.ImfOpenTiledOutputFile(
            path.encode(), hdr, 0x0F, tile[0], tile[1], 0, 0))
        if not out:
            raise OSError("ImfOpenTiledOutputFile failed")
        base = buf.ctypes.data_as(ctypes.c_void_p)
        if not lib.ImfTiledOutputSetFrameBuffer(
                out, base, ctypes.c_size_t(1), ctypes.c_size_t(w)):
            raise OSError("ImfTiledOutputSetFrameBuffer failed")
        ntx = (w + tile[0] - 1) // tile[0]
        nty = (h + tile[1] - 1) // tile[1]
        if not lib.ImfTiledOutputWriteTiles(
                out, 0, ntx - 1, 0, nty - 1, 0, 0):
            raise OSError("ImfTiledOutputWriteTiles failed")
    finally:
        if "out" in dir() and out:
            lib.ImfCloseTiledOutputFile(out)
        lib.ImfDeleteHeader(hdr)


def read_rgba(path: str) -> np.ndarray:
    """Read any EXR libOpenEXR can open -> (H, W, 4) float32."""
    lib = load_lib()
    assert lib is not None
    fin = ctypes.c_void_p(lib.ImfOpenInputFile(path.encode()))
    if not fin:
        raise OSError("ImfOpenInputFile failed")
    try:
        hdr = ctypes.c_void_p(lib.ImfInputHeader(fin))
        x0 = ctypes.c_int()
        y0 = ctypes.c_int()
        x1 = ctypes.c_int()
        y1 = ctypes.c_int()
        lib.ImfHeaderDataWindow(hdr, ctypes.byref(x0), ctypes.byref(y0),
                                ctypes.byref(x1), ctypes.byref(y1))
        w = x1.value - x0.value + 1
        h = y1.value - y0.value + 1
        buf = np.zeros((h, w, 4), np.float16)
        # base points at the would-be (0, 0) pixel: shift by the window min.
        base = ctypes.c_void_p(
            buf.ctypes.data - (y0.value * w + x0.value) * 8)
        if not lib.ImfInputSetFrameBuffer(
                fin, base, ctypes.c_size_t(1), ctypes.c_size_t(w)):
            raise OSError("ImfInputSetFrameBuffer failed")
        if not lib.ImfInputReadPixels(fin, y0.value, y1.value):
            raise OSError("ImfInputReadPixels failed")
        return buf.astype(np.float32)
    finally:
        lib.ImfCloseInputFile(fin)
