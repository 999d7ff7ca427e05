"""Native NIfTI-1 reader/writer (no SimpleITK/nibabel dependency).

The reference delegates image IO to SimpleITK (``experiments/utils.py:260-270``
``read_img``, ``:234-257`` ``save_output``). This framework implements the
NIfTI-1 format directly in numpy:

  * arrays are returned in (z, y, x) index order, matching
    ``sitk.GetArrayFromImage`` so downstream code (normalization, metrics,
    label handling) is drop-in compatible;
  * spacing is exposed in (x, y, z) order, matching ``img.GetSpacing()``;
  * the writer emits gzip-compressed .nii.gz with the ITK LPS->RAS sign
    convention on the affine so files round-trip with ITK-based tools.

Supports the datatypes that occur in medical segmentation corpora
(uint8/int16/uint16/int32/float32/float64), scl_slope/inter scaling, and
both .nii and .nii.gz.
"""
from __future__ import annotations

import gzip
import os
import struct
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["NiftiImage", "read_image", "read_images", "read_img",
           "write_image", "get_spacing", "read_shape"]

_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
    1024: np.int64,
    1280: np.uint64,
}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


@dataclass
class NiftiImage:
    """A loaded NIfTI volume.

    Attributes:
        array: voxel data in (z, y, x) (or (y, x) for 2D) index order.
        spacing: voxel spacing in (x, y, z) order (sitk convention).
        origin: image origin (x, y, z) (sitk LPS convention).
    """
    array: np.ndarray
    spacing: Tuple[float, ...] = (1.0, 1.0, 1.0)
    origin: Tuple[float, ...] = (0.0, 0.0, 0.0)


def _open_maybe_gzip(filename, mode="rb"):
    if str(filename).endswith(".gz"):
        return gzip.open(filename, mode)
    return open(filename, mode)


def _read_raw(filename):
    """Whole-file bytes, decompressed: native zlib (gzread, ~2-4x Python's
    gzip) with transparent fallback."""
    if str(filename).endswith(".gz"):
        from . import native
        buf = native.gunzip(filename)
        if buf is not None:
            return buf
    with _open_maybe_gzip(filename) as f:
        return f.read()


def read_image(filename) -> NiftiImage:
    """Read a .nii / .nii.gz file."""
    raw = _read_raw(filename)
    return _parse_nifti(raw, filename)


def read_images(filenames):
    """Read many files with the native parallel decompressor (one OpenMP
    task per file, GIL released for the whole batch); per-file fallback to
    the serial reader. Returns a list of NiftiImage."""
    from . import native
    gz_idx = [i for i, fn in enumerate(filenames)
              if str(fn).endswith(".gz")]
    raws = [None] * len(filenames)
    if gz_idx:
        batch = native.gunzip_batch([filenames[i] for i in gz_idx])
        if batch is not None:
            for i, buf in zip(gz_idx, batch):
                raws[i] = buf
    out = []
    for fn, raw in zip(filenames, raws):
        if raw is None:
            out.append(read_image(fn))
        else:
            out.append(_parse_nifti(raw, fn))
    return out


def _parse_nifti(raw, filename) -> NiftiImage:
    if len(raw) < 352:
        raise ValueError(f"{filename}: too short for a NIfTI-1 file")

    sizeof_hdr = struct.unpack_from("<i", raw, 0)[0]
    if sizeof_hdr == 348:
        bo = "<"
    elif struct.unpack_from(">i", raw, 0)[0] == 348:
        bo = ">"
    else:
        raise ValueError(f"{filename}: not a NIfTI-1 file")

    dim = struct.unpack_from(bo + "8h", raw, 40)
    datatype = struct.unpack_from(bo + "h", raw, 70)[0]
    pixdim = struct.unpack_from(bo + "8f", raw, 76)
    vox_offset = int(struct.unpack_from(bo + "f", raw, 108)[0])
    scl_slope = struct.unpack_from(bo + "f", raw, 112)[0]
    scl_inter = struct.unpack_from(bo + "f", raw, 116)[0]
    qoffset = struct.unpack_from(bo + "3f", raw, 268)
    srow_x = struct.unpack_from(bo + "4f", raw, 280)
    srow_y = struct.unpack_from(bo + "4f", raw, 296)
    srow_z = struct.unpack_from(bo + "4f", raw, 312)
    sform_code = struct.unpack_from(bo + "h", raw, 254)[0]
    magic = bytes(raw[344:348])
    if magic not in (b"n+1\x00", b"ni1\x00", b"n+2\x00"):
        raise ValueError(f"{filename}: bad NIfTI magic {magic!r}")

    ndim = dim[0]
    if not 1 <= ndim <= 7:
        raise ValueError(f"{filename}: bad ndim {ndim}")
    shape_xyz = tuple(int(d) for d in dim[1:1 + ndim])
    # squeeze trailing singleton dims (e.g. 4D with T=1)
    while len(shape_xyz) > 3 and shape_xyz[-1] == 1:
        shape_xyz = shape_xyz[:-1]

    if datatype not in _DTYPES:
        raise ValueError(f"{filename}: unsupported datatype code {datatype}")
    dt = np.dtype(_DTYPES[datatype]).newbyteorder(bo)

    count = int(np.prod(shape_xyz))
    data = np.frombuffer(raw, dtype=dt, count=count, offset=vox_offset)
    # NIfTI stores x-fastest (Fortran); produce (z, y, x) like sitk
    arr = data.reshape(shape_xyz[::-1])

    if scl_slope not in (0.0, 1.0) or (scl_slope == 1.0 and scl_inter != 0.0):
        arr = arr * scl_slope + scl_inter

    n_sp = min(len(shape_xyz), 3)
    spacing = tuple(float(abs(p)) if p != 0 else 1.0
                    for p in pixdim[1:1 + n_sp])
    if sform_code > 0:
        # ITK reads origin from the affine, flipping RAS->LPS on x, y
        origin = (-srow_x[3], -srow_y[3], srow_z[3])
    else:
        origin = (-qoffset[0], -qoffset[1], qoffset[2])

    return NiftiImage(array=np.asarray(arr), spacing=spacing,
                      origin=tuple(float(o) for o in origin[:n_sp]))


def read_img(filename) -> np.ndarray:
    """Read an image as float32 (z, y, x) — drop-in for the reference's
    SimpleITK ``read_img`` (``experiments/utils.py:260-270``)."""
    return read_image(filename).array.astype(np.float32)


def get_spacing(filename) -> Tuple[float, ...]:
    """Spacing in (x, y, z), like ``sitk.ReadImage(fn).GetSpacing()``."""
    return read_image(filename).spacing


def read_shape(filename) -> Tuple[int, ...]:
    """Volume shape in (z, y, x) from the 348-byte header alone — for
    .gz only the first deflate block streams, so probing shapes does not
    decompress whole volumes (InputData startup probes every split)."""
    with _open_maybe_gzip(filename) as f:
        raw = f.read(352)
    if len(raw) < 348:
        raise ValueError(f"{filename}: too short for a NIfTI-1 file")
    if struct.unpack_from("<i", raw, 0)[0] == 348:
        bo = "<"
    elif struct.unpack_from(">i", raw, 0)[0] == 348:
        bo = ">"
    else:
        raise ValueError(f"{filename}: not a NIfTI-1 file")
    dim = struct.unpack_from(bo + "8h", raw, 40)
    ndim = dim[0]
    if not 1 <= ndim <= 7:
        raise ValueError(f"{filename}: bad ndim {ndim}")
    shape_xyz = tuple(int(d) for d in dim[1:1 + ndim])
    while len(shape_xyz) > 3 and shape_xyz[-1] == 1:
        shape_xyz = shape_xyz[:-1]
    return shape_xyz[::-1]


def write_image(array: np.ndarray, filename,
                spacing: Optional[Sequence[float]] = None,
                origin: Optional[Sequence[float]] = None) -> None:
    """Write a (z, y, x) array to .nii / .nii.gz.

    ``origin`` follows the sitk ``SetOrigin`` convention (x, y, z) used by
    the reference's ``save_output`` (``experiments/utils.py:248-257``).
    """
    arr = np.asarray(array)
    if arr.dtype == np.bool_:
        arr = arr.astype(np.uint8)
    if arr.dtype not in _DTYPE_CODES:
        arr = arr.astype(np.float32)
    ndim = arr.ndim
    assert 2 <= ndim <= 3, "writer supports 2D/3D volumes"
    shape_xyz = arr.shape[::-1]
    spacing = tuple(float(s) for s in (spacing or (1.0,) * ndim))
    origin = tuple(float(o) for o in (origin or (0.0,) * ndim))
    spacing3 = (spacing + (1.0,) * 3)[:3]
    origin3 = (origin + (0.0,) * 3)[:3]

    header = bytearray(352)
    struct.pack_into("<i", header, 0, 348)
    dim = [ndim] + list(shape_xyz) + [1] * (7 - ndim)
    struct.pack_into("<8h", header, 40, *dim)
    struct.pack_into("<h", header, 70, _DTYPE_CODES[arr.dtype])
    struct.pack_into("<h", header, 72, arr.dtype.itemsize * 8)
    pixdim = [1.0] + list(spacing3) + [0.0] * (7 - 3)
    struct.pack_into("<8f", header, 76, *pixdim)
    struct.pack_into("<f", header, 108, 352.0)  # vox_offset
    struct.pack_into("<f", header, 112, 1.0)    # scl_slope
    # qform + sform, identity direction with ITK's LPS->RAS sign flips
    struct.pack_into("<h", header, 252, 1)      # qform_code
    struct.pack_into("<h", header, 254, 1)      # sform_code
    # quaternion (b, c, d) = (0, 0, 1) encodes diag(-1, -1, 1)
    struct.pack_into("<3f", header, 256, 0.0, 0.0, 1.0)
    struct.pack_into("<3f", header, 268,
                     -origin3[0], -origin3[1], origin3[2])
    struct.pack_into("<4f", header, 280, -spacing3[0], 0.0, 0.0, -origin3[0])
    struct.pack_into("<4f", header, 296, 0.0, -spacing3[1], 0.0, -origin3[1])
    struct.pack_into("<4f", header, 312, 0.0, 0.0, spacing3[2], origin3[2])
    header[344:348] = b"n+1\x00"

    # NIfTI stores x-fastest; a C-contiguous (z, y, x) array already is.
    payload = bytes(header) + np.ascontiguousarray(arr).tobytes()

    os.makedirs(os.path.dirname(os.fspath(filename)) or ".", exist_ok=True)
    with _open_maybe_gzip(filename, "wb") as f:
        f.write(payload)
