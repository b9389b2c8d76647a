"""ctypes bindings for the native host-runtime library (native/stroke_io.cpp).

Loads ``native/libstroke_io.so``; if the shared object is missing and a
toolchain is available, builds it once via ``make -C native``.  All entry
points return None/False gracefully when the library is unavailable, so the
pure-Python NIfTI codec (utils/nifti.py) remains the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libstroke_io.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(
            os.path.join(_NATIVE_DIR, "Makefile")):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.sp_nifti_header.restype = ctypes.c_int
    lib.sp_nifti_header.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64)]
    lib.sp_nifti_read_f32.restype = ctypes.c_int
    lib.sp_nifti_read_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.sp_nifti_write_f32.restype = ctypes.c_int
    lib.sp_nifti_write_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def read_nifti(path: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Returns (data (X, Y, Z[, T]) float32, affine 4x4) or None."""
    lib = _load()
    if lib is None:
        return None
    dims = (ctypes.c_int64 * 8)()
    aff = (ctypes.c_float * 12)()
    voxels = ctypes.c_int64()
    if lib.sp_nifti_header(path.encode(), dims, aff, ctypes.byref(voxels)):
        return None
    ndim = int(dims[0])
    shape = tuple(int(dims[i + 1]) for i in range(ndim))
    out = np.empty(int(voxels.value), np.float32)
    if lib.sp_nifti_read_f32(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            voxels):
        return None
    data = out.reshape(shape, order="F")
    affine = np.eye(4, dtype=np.float32)
    affine[:3, :] = np.frombuffer(aff, np.float32).reshape(3, 4)
    return data, affine


def write_nifti(path: str, data: np.ndarray,
                affine: Optional[np.ndarray] = None) -> bool:
    lib = _load()
    if lib is None:
        return False
    data = np.asfortranarray(np.asarray(data, np.float32))
    if affine is None:
        affine = np.eye(4, dtype=np.float32)
    aff12 = np.ascontiguousarray(np.asarray(affine, np.float32)[:3, :]).ravel()
    dims = (ctypes.c_int64 * 7)(*(list(data.shape) + [1] * (7 - data.ndim)))
    level = 6 if path.endswith(".gz") else 0
    # Fortran-order flat buffer
    flat = data.ravel(order="F")
    rc = lib.sp_nifti_write_f32(
        path.encode(), flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dims, data.ndim,
        aff12.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), level)
    return rc == 0
