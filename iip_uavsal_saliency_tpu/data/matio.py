"""MATLAB .mat I/O without hdf5storage.

The reference stores all GT and results as MATLAB v7.3 files via hdf5storage
(`fixMap`/`fixLoc`/`salmap`/`PriorMaps`/`iscore` keys; e.g. reference:
Demo_Test.py:95, utils_data.py:457). v7.3 MAT == HDF5 with a 512-byte MATLAB
userblock and column-major (reversed-axis) dataset layout, which we read and
write directly with h5py:

- `savemat` writes each array transposed (axis-reversed) with the
  `MATLAB_class` attribute, and stamps the MATLAB 7.3 userblock so MATLAB
  itself (and hdf5storage) can open the files.
- `loadmat` transposes back on read, so round-trips preserve Python layout
  and files written by the reference pipeline load with identical shapes
  (e.g. fixMap (H, W, 1, T)).
- v5 files (scipy-written fixation maps, key "I"; reference dataset.py:73)
  fall back to scipy.io.loadmat transparently.
"""

from __future__ import annotations

import struct
import time
from typing import Any, Mapping

import numpy as np

_MATLAB_CLASS = {
    np.dtype(np.uint8): b"uint8",
    np.dtype(np.int8): b"int8",
    np.dtype(np.uint16): b"uint16",
    np.dtype(np.int16): b"int16",
    np.dtype(np.uint32): b"uint32",
    np.dtype(np.int32): b"int32",
    np.dtype(np.uint64): b"uint64",
    np.dtype(np.int64): b"int64",
    np.dtype(np.float32): b"single",
    np.dtype(np.float64): b"double",
    np.dtype(np.bool_): b"logical",
}


def _userblock() -> bytes:
    text = (
        "MATLAB 7.3 MAT-file, Platform: GLNXA64, Created on: "
        + time.strftime("%a %b %d %H:%M:%S %Y")
        + " HDF5 schema 1.00 ."
    ).encode("ascii")
    header = text[:116].ljust(116, b" ")
    header += b"\x00" * 8  # subsystem data offset
    header += struct.pack("<H", 0x0200)  # version
    header += b"IM"  # little-endian indicator
    return header.ljust(512, b"\x00")


def _write_h5(group, key: str, value) -> None:
    if isinstance(value, Mapping):
        # MATLAB scalar struct: a group whose members are the fields
        # (hdf5storage layout; e.g. the reference's per-method score files,
        # utils_score.py:490 `{'scores': {video: (T, 7) array}}`)
        g = group.create_group(key)
        g.attrs["MATLAB_class"] = np.bytes_(b"struct")
        for k, v in value.items():
            _write_h5(g, k, v)
        return
    arr = np.asarray(value)
    if arr.dtype == np.bool_:
        arr = arr.astype(np.uint8)
        mat_class = b"logical"
    else:
        mat_class = _MATLAB_CLASS.get(arr.dtype)
        if mat_class is None:
            raise TypeError(f"unsupported dtype for .mat: {arr.dtype}")
    # gzip like hdf5storage (its default compresses datasets over
    # 16 KiB): per-video salmaps are large smooth uint8 tensors that
    # shrink 10-50x; tiny arrays skip the filter overhead. Level 4
    # compresses nearly as well as hdf5storage's 7 at ~2x the speed.
    kw = (
        dict(compression="gzip", compression_opts=4, chunks=True)
        if arr.ndim and arr.nbytes >= 16384
        else {}
    )
    ds = group.create_dataset(key, data=arr.T if arr.ndim else arr, **kw)
    ds.attrs["MATLAB_class"] = np.bytes_(mat_class)
    if mat_class == b"logical":
        ds.attrs["MATLAB_int_decode"] = np.int32(1)


def savemat(path: str, data: Mapping[str, Any]) -> None:
    """Write a MATLAB v7.3 (HDF5) file. Arrays are stored axis-reversed with
    MATLAB_class attrs; dict values become MATLAB structs; round-trips with
    `loadmat` and with MATLAB/hdf5storage."""
    import h5py

    with h5py.File(path, "w", userblock_size=512) as f:
        for key, value in data.items():
            _write_h5(f, key, value)
    with open(path, "r+b") as f:
        f.write(_userblock())


def loadmat(path: str, key: str | None = None) -> Any:
    """Read a MATLAB file (v7.3 via h5py; v5 via scipy). Returns the dict of
    variables, or the single variable when `key` is given."""
    import h5py

    try:
        with h5py.File(path, "r") as f:
            if key is not None:
                return _read_h5(f[key])
            return {k: _read_h5(f[k]) for k in f.keys() if not k.startswith("#")}
    except OSError:
        import scipy.io

        md = scipy.io.loadmat(path)
        if key is not None:
            return md[key]
        return {k: v for k, v in md.items() if not k.startswith("__")}


def _read_h5(ds):
    import h5py

    if isinstance(ds, h5py.Group):  # MATLAB struct -> dict of fields
        return {k: _read_h5(ds[k]) for k in ds.keys()}
    arr = np.asarray(ds)
    return arr.T if arr.ndim > 1 else arr
