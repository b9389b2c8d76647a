"""NIfTI-1 I/O (host layer) + volume layout helpers.

The reference delegates NIfTI I/O to nibabel (common/data.py:65-69,
testers).  This environment has no nibabel, so the framework ships its own
minimal, format-compatible NIfTI-1 reader/writer (gzip'd ``.nii.gz`` and
plain ``.nii``): 348-byte header, sform affine, float32/uint8/int16/int8
dtypes, Fortran voxel order — everything the stroke pipeline needs.
nibabel is used transparently when available.

Testers dump per-case volumes back to native resolution reusing the source
affines (reference: tester/UnetSegmentationTester.py:31-39,
tester/CaeReconstructionTester.py:28-44).
"""

from __future__ import annotations

import gzip
import struct
from typing import Optional, Tuple

import numpy as np

try:
    import nibabel as _nib
except ImportError:
    _nib = None

_DTYPES = {2: np.uint8, 4: np.int16, 8: np.int32, 16: np.float32,
           64: np.float64, 256: np.int8, 512: np.uint16}
_CODES = {np.dtype(np.uint8): 2, np.dtype(np.int16): 4,
          np.dtype(np.int32): 8, np.dtype(np.float32): 16,
          np.dtype(np.float64): 64, np.dtype(np.int8): 256,
          np.dtype(np.uint16): 512}


def _open(path: str, mode: str):
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def write_nifti(path: str, data: np.ndarray,
                affine: Optional[np.ndarray] = None) -> None:
    """Write an (X, Y, Z[, T]) array as NIfTI-1 single-file (.nii[.gz])."""
    data = np.asarray(data)
    if data.dtype == np.bool_:
        data = data.astype(np.uint8)
    if data.dtype not in _CODES:
        data = data.astype(np.float32)
    if affine is None:
        affine = np.eye(4, dtype=np.float32)
    affine = np.asarray(affine, np.float32)

    dims = list(data.shape)
    ndim = len(dims)
    dim = [ndim] + dims + [1] * (7 - ndim)
    pixdim = [0.0] + [float(np.linalg.norm(affine[:3, i]) or 1.0)
                      for i in range(min(3, ndim))] + [1.0] * (7 - min(3, ndim))

    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)                       # sizeof_hdr
    struct.pack_into("<8h", hdr, 40, *dim)                    # dim
    struct.pack_into("<h", hdr, 70, _CODES[data.dtype])       # datatype
    struct.pack_into("<h", hdr, 72, data.dtype.itemsize * 8)  # bitpix
    struct.pack_into("<8f", hdr, 76, *pixdim)                 # pixdim
    struct.pack_into("<f", hdr, 108, 352.0)                   # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)                     # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)                     # scl_inter
    struct.pack_into("<h", hdr, 252, 1)                       # qform_code
    struct.pack_into("<h", hdr, 254, 1)                       # sform_code
    # qform: identity quaternion + affine translation
    struct.pack_into("<6f", hdr, 256, 0.0, 0.0, 0.0,
                     affine[0, 3], affine[1, 3], affine[2, 3])
    struct.pack_into("<4f", hdr, 280, *affine[0])             # srow_x
    struct.pack_into("<4f", hdr, 296, *affine[1])             # srow_y
    struct.pack_into("<4f", hdr, 312, *affine[2])             # srow_z
    hdr[344:348] = b"n+1\x00"                                 # magic

    with _open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(b"\x00\x00\x00\x00")                          # extensions
        f.write(np.asfortranarray(data).tobytes(order="F"))


def read_nifti(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read a NIfTI-1 file -> (data in (X, Y, Z[, T]) order, affine)."""
    with _open(path, "rb") as f:
        raw = f.read()
    hdr = raw[:348]
    (sizeof_hdr,) = struct.unpack_from("<i", hdr, 0)
    endian = "<"
    if sizeof_hdr != 348:
        endian = ">"
    dim = struct.unpack_from(endian + "8h", hdr, 40)
    (datatype,) = struct.unpack_from(endian + "h", hdr, 70)
    (vox_offset,) = struct.unpack_from(endian + "f", hdr, 108)
    (scl_slope,) = struct.unpack_from(endian + "f", hdr, 112)
    (scl_inter,) = struct.unpack_from(endian + "f", hdr, 116)
    (sform_code,) = struct.unpack_from(endian + "h", hdr, 254)
    ndim = dim[0]
    shape = tuple(dim[1:1 + ndim])
    dtype = np.dtype(_DTYPES[datatype]).newbyteorder(endian)
    count = int(np.prod(shape))
    off = int(vox_offset)
    data = np.frombuffer(raw, dtype=dtype, count=count, offset=off)
    data = data.reshape(shape, order="F")
    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        slope = scl_slope if scl_slope != 0.0 else 1.0
        data = data * slope + scl_inter
    affine = np.eye(4, dtype=np.float32)
    if sform_code > 0:
        affine[0] = struct.unpack_from(endian + "4f", hdr, 280)
        affine[1] = struct.unpack_from(endian + "4f", hdr, 296)
        affine[2] = struct.unpack_from(endian + "4f", hdr, 312)
    return np.ascontiguousarray(data), affine


def load_volume(path: str) -> np.ndarray:
    """(X, Y, Z) float32 volume from a NIfTI file (native C++ codec when
    built, then nibabel, then the pure-Python reader)."""
    from stroke_prediction_tpu.utils import native_io
    r = native_io.read_nifti(path)
    if r is not None:
        return np.ascontiguousarray(r[0], dtype=np.float32)
    if _nib is not None:
        return np.asarray(_nib.load(path).get_fdata(), dtype=np.float32)
    data, _ = read_nifti(path)
    return np.asarray(data, np.float32)


def load_affine(path: str) -> np.ndarray:
    from stroke_prediction_tpu.utils import native_io
    r = native_io.read_nifti(path)
    if r is not None:
        return r[1]
    if _nib is not None:
        return _nib.load(path).affine
    _, affine = read_nifti(path)
    return affine


def save_nifti(path: str, vol_xyz: np.ndarray, affine=None) -> None:
    vol_xyz = np.asarray(vol_xyz)
    from stroke_prediction_tpu.utils import native_io
    if native_io.write_nifti(path, vol_xyz, affine):
        return
    if _nib is not None:
        if affine is None:
            affine = np.eye(4, dtype=np.float32)
        _nib.save(_nib.Nifti1Image(vol_xyz, affine), path)
        return
    write_nifti(path, vol_xyz, affine)


def dhw_to_xyz(vol_dhw: np.ndarray) -> np.ndarray:
    """(D, H, W) device layout -> (X, Y, Z) NIfTI layout."""
    return np.transpose(np.asarray(vol_dhw), (2, 1, 0))


def zoom2x_inplane_xyz(vol_xyz: np.ndarray, order: int = 1) -> np.ndarray:
    """x2 in-plane zoom of an (X, Y, Z) volume back to native resolution
    (the testers' ``ndi.zoom(image, (2, 2, 1))``)."""
    import jax
    from stroke_prediction_tpu.ops.resize import zoom_inplane
    v = np.transpose(vol_xyz, (2, 0, 1))[..., None]   # (Z, X, Y, 1)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        out = np.asarray(zoom_inplane(v, 2.0, order=order))
    return np.transpose(out[..., 0], (1, 2, 0))
