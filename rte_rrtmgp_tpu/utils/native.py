"""ctypes binding for the native NetCDF classic codec (src_native/ncio.cc).

The native library is the data-loader analog of the reference's C++
``Netcdf_interface`` (``include_test/Netcdf_interface.h:31-110``). It is
compiled on demand with g++ into ``build/librrtmgp_ncio.so`` (cached; rebuilt
when the source is newer). All entry points degrade gracefully: callers
check :func:`available` and fall back to the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "src_native", "ncio.cc")
_LIB = os.path.join(_REPO_ROOT, "build", "librrtmgp_ncio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

# NetCDF external type <-> numpy dtype
_NC2NP = {
    1: np.dtype(np.int8), 2: np.dtype("S1"), 3: np.dtype(np.int16),
    4: np.dtype(np.int32), 5: np.dtype(np.float32), 6: np.dtype(np.float64),
    7: np.dtype(np.uint8), 8: np.dtype(np.uint16), 9: np.dtype(np.uint32),
    10: np.dtype(np.int64), 11: np.dtype(np.uint64),
}
_NP2NC = {v: k for k, v in _NC2NP.items()}


def _build() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SRC):
        return None
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        os.makedirs(os.path.dirname(_LIB), exist_ok=True)
        try:
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-fPIC", "-Wall", "-shared",
                 "-o", _LIB, _SRC],
                check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None

    lib.rrtmgp_nc_open.restype = ctypes.c_void_p
    lib.rrtmgp_nc_open.argtypes = [ctypes.c_char_p]
    lib.rrtmgp_nc_close.argtypes = [ctypes.c_void_p]
    lib.rrtmgp_nc_num_vars.argtypes = [ctypes.c_void_p]
    lib.rrtmgp_nc_num_dims.argtypes = [ctypes.c_void_p]
    lib.rrtmgp_nc_var_name.restype = ctypes.c_char_p
    lib.rrtmgp_nc_var_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rrtmgp_nc_dim_name.restype = ctypes.c_char_p
    lib.rrtmgp_nc_dim_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rrtmgp_nc_dim_len.restype = ctypes.c_longlong
    lib.rrtmgp_nc_dim_len.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rrtmgp_nc_find_var.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.rrtmgp_nc_var_type.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rrtmgp_nc_var_ndims.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rrtmgp_nc_var_shape.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_longlong)]
    lib.rrtmgp_nc_read_var.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_longlong]
    lib.rrtmgp_nc_att_text.restype = ctypes.c_char_p
    lib.rrtmgp_nc_att_text.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p]

    lib.rrtmgp_ncw_create.restype = ctypes.c_void_p
    lib.rrtmgp_ncw_create.argtypes = [ctypes.c_char_p]
    lib.rrtmgp_ncw_def_dim.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_longlong]
    lib.rrtmgp_ncw_def_var.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.rrtmgp_ncw_put_att_text.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p]
    lib.rrtmgp_ncw_put_var.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_longlong]
    lib.rrtmgp_ncw_close.argtypes = [ctypes.c_void_p]
    lib.rrtmgp_ncw_abort.argtypes = [ctypes.c_void_p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if not _tried:
            _tried = True
            _lib = _build()
        return _lib


def available() -> bool:
    return get_lib() is not None


class NativeNcFile:
    """Read-only handle over a classic NetCDF file via the native codec."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native ncio library unavailable")
        self._lib = lib
        self._h = lib.rrtmgp_nc_open(path.encode())
        if not self._h:
            raise OSError(f"native ncio failed to open {path!r}")

    def close(self):
        if self._h:
            self._lib.rrtmgp_nc_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def variables(self):
        n = self._lib.rrtmgp_nc_num_vars(self._h)
        return [self._lib.rrtmgp_nc_var_name(self._h, i).decode()
                for i in range(n)]

    def dims(self) -> dict:
        n = self._lib.rrtmgp_nc_num_dims(self._h)
        return {self._lib.rrtmgp_nc_dim_name(self._h, i).decode():
                int(self._lib.rrtmgp_nc_dim_len(self._h, i))
                for i in range(n)}

    def has(self, name: str) -> bool:
        return self._lib.rrtmgp_nc_find_var(self._h, name.encode()) >= 0

    def read(self, name: str) -> np.ndarray:
        vid = self._lib.rrtmgp_nc_find_var(self._h, name.encode())
        if vid < 0:
            raise KeyError(name)
        nd = self._lib.rrtmgp_nc_var_ndims(self._h, vid)
        shape = (ctypes.c_longlong * max(nd, 1))()
        self._lib.rrtmgp_nc_var_shape(self._h, vid, shape)
        shp = tuple(int(shape[i]) for i in range(nd))
        dtype = _NC2NP[self._lib.rrtmgp_nc_var_type(self._h, vid)]
        out = np.empty(shp, dtype=dtype)
        rc = self._lib.rrtmgp_nc_read_var(
            self._h, vid, out.ctypes.data_as(ctypes.c_void_p), out.nbytes)
        if rc != 0:
            raise IOError(f"native read of {name!r} failed (rc={rc})")
        return out

    def att_text(self, var: Optional[str], att: str) -> Optional[str]:
        vid = -1
        if var is not None:
            vid = self._lib.rrtmgp_nc_find_var(self._h, var.encode())
            if vid < 0:
                return None
        res = self._lib.rrtmgp_nc_att_text(self._h, vid, att.encode())
        return res.decode() if res is not None else None


class NativeNcWriter:
    """CDF-2 writer via the native codec (fixed-size variables)."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native ncio library unavailable")
        self._lib = lib
        self._h = lib.rrtmgp_ncw_create(path.encode())
        self._closed = False

    def def_dim(self, name: str, size: int) -> int:
        rc = self._lib.rrtmgp_ncw_def_dim(self._h, name.encode(), size)
        if rc < 0:
            raise ValueError(f"dim {name!r} redefined with different size")
        return rc

    def write(self, name: str, data: np.ndarray, dims: Sequence[str],
              attrs: Optional[dict] = None):
        data = np.ascontiguousarray(data)
        if data.dtype == np.bool_:
            data = data.astype(np.int8)
        if data.dtype in (np.dtype(np.int64), np.dtype(np.uint64)):
            # The native writer emits CDF-2, where NC_INT64/NC_UINT64 are
            # invalid (CDF-5-only type codes); downcast with a range check.
            if (data.min(initial=0) < np.iinfo(np.int32).min
                    or data.max(initial=0) > np.iinfo(np.int32).max):
                raise ValueError(
                    f"variable {name!r}: int64 values out of int32 range; "
                    "CDF-2 output cannot represent them")
            data = data.astype(np.int32)
        if data.dtype not in _NP2NC:
            data = data.astype(np.float64)
        dimids = (ctypes.c_int * max(len(dims), 1))()
        for i, (dn, size) in enumerate(zip(dims, data.shape)):
            dimids[i] = self.def_dim(dn, size)
        vid = self._lib.rrtmgp_ncw_def_var(
            self._h, name.encode(), _NP2NC[data.dtype], data.ndim, dimids)
        if vid < 0:
            raise ValueError(f"def_var {name!r} failed")
        rc = self._lib.rrtmgp_ncw_put_var(
            self._h, vid, data.ctypes.data_as(ctypes.c_void_p), data.nbytes)
        if rc != 0:
            raise IOError(f"put_var {name!r} failed (rc={rc})")
        for k, v in (attrs or {}).items():
            self._lib.rrtmgp_ncw_put_att_text(
                self._h, vid, str(k).encode(), str(v).encode())

    def close(self):
        if not self._closed:
            self._closed = True
            rc = self._lib.rrtmgp_ncw_close(self._h)
            if rc != 0:
                raise IOError(f"native NetCDF write failed (rc={rc})")

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            self.close()
        elif not self._closed:
            self._closed = True
            self._lib.rrtmgp_ncw_abort(self._h)
