"""Minimal NetCDF interface (read + write) on top of h5py / scipy.

The execution image has no ``netCDF4``/``xarray``; NetCDF4 files are HDF5
underneath, so ``h5py`` reads them directly (the one data file shipped with
the reference, ``data/aerosol_optics.nc``, is HDF5 — verified by magic bytes).
Classic NetCDF3 files are read through ``scipy.io.netcdf_file``.

This is the TPU-native equivalent of the reference's RAII NetCDF C wrapper
(``include_test/Netcdf_interface.h:31-110``): named-variable reads with
automatic char-array -> str decoding, and a writer that produces HDF5-backed
NetCDF4 files with proper dimension scales so external netCDF tools can read
our outputs.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional, Sequence

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

_HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"


def _is_hdf5(path: str) -> bool:
    with open(path, "rb") as f:
        return f.read(8) == _HDF5_MAGIC


def _decode_strings(arr: np.ndarray) -> np.ndarray:
    """Decode a NetCDF char array (..., string_len) of S1 into str objects."""
    if arr.dtype.kind == "S" and arr.dtype.itemsize == 1 and arr.ndim >= 1:
        flat = arr.reshape(-1, arr.shape[-1])
        out = np.array(
            [b"".join(row).decode("ascii", "replace").strip("\x00").strip() for row in flat],
            dtype=object,
        )
        return out.reshape(arr.shape[:-1])
    if arr.dtype.kind == "S":
        return np.array([s.decode("ascii", "replace").strip() for s in arr.reshape(-1)],
                        dtype=object).reshape(arr.shape)
    return arr


class NcReader:
    """Read-only NetCDF handle (NetCDF4/HDF5 via h5py, NetCDF3 via scipy)."""

    def __init__(self, path: str, group: Optional[str] = None):
        self.path = path
        self._nat = None
        if _is_hdf5(path):
            if h5py is None:
                raise RuntimeError("h5py required to read NetCDF4 files")
            self._h5 = h5py.File(path, "r")
            self._root = self._h5[group] if group else self._h5
            self._sp = None
        else:
            if group:
                raise ValueError("groups are not supported for NetCDF3 files")
            self._h5 = None
            self._root = None
            self._sp = None
            # Prefer the native C++ classic codec (src_native/ncio.cc);
            # scipy.io.netcdf_file is the pure-Python fallback.
            from . import native

            if native.available():
                try:
                    self._nat = native.NativeNcFile(path)
                except OSError:
                    self._nat = None
            if self._nat is None:
                from scipy.io import netcdf_file

                self._sp = netcdf_file(path, "r", mmap=False)

    # -- introspection ------------------------------------------------------
    def has(self, name: str) -> bool:
        if self._h5 is not None:
            return name in self._root and isinstance(self._root[name], h5py.Dataset)
        if self._nat is not None:
            return self._nat.has(name)
        return name in self._sp.variables

    def group(self, name: str) -> "NcReader":
        if self._h5 is None:
            raise ValueError("groups are not supported for NetCDF3 files")
        return NcReader(self.path, group=name)

    def has_group(self, name: str) -> bool:
        return (self._h5 is not None and name in self._root
                and isinstance(self._root[name], h5py.Group))

    def dim(self, name: str) -> int:
        """Dimension size by name (works for both backends)."""
        if self._h5 is not None:
            if name in self._root:
                ds = self._root[name]
                if ds.attrs.get("CLASS", b"") == b"DIMENSION_SCALE" or ds.ndim == 1:
                    return ds.shape[0]
            # Fall back: scan variables for a matching dimension label.
            for ds in self._root.values():
                if not isinstance(ds, h5py.Dataset):
                    continue
                for i, dimname in enumerate(_h5_dim_names(ds)):
                    if dimname == name:
                        return ds.shape[i]
            raise KeyError(f"dimension {name!r} not found in {self.path}")
        if self._nat is not None:
            dims = self._nat.dims()
            if name not in dims:
                raise KeyError(f"dimension {name!r} not found in {self.path}")
            return dims[name]
        size = self._sp.dimensions.get(name)
        if size is None:
            # Unlimited dims report None; measure from a variable.
            for var in self._sp.variables.values():
                if name in var.dimensions:
                    return var.shape[var.dimensions.index(name)]
            raise KeyError(f"dimension {name!r} not found in {self.path}")
        return size

    # -- reads --------------------------------------------------------------
    def read(self, name: str, dtype=None) -> np.ndarray:
        if self._h5 is not None:
            arr = np.asarray(self._root[name][()])
        elif self._nat is not None:
            arr = self._nat.read(name)
        else:
            arr = np.asarray(self._sp.variables[name][:]).copy()
        if arr.dtype.kind in "SU" or (arr.dtype.kind == "S"):
            return arr
        return arr.astype(dtype) if dtype is not None else arr

    def read_strings(self, name: str) -> list:
        return list(_decode_strings(self.read(name)).reshape(-1))

    def read_scalar(self, name: str, dtype=float):
        return dtype(np.asarray(self.read(name)).reshape(-1)[0])

    def read_optional(self, name: str, dtype=None):
        return self.read(name, dtype) if self.has(name) else None

    def variables(self) -> Iterable[str]:
        if self._h5 is not None:
            return [k for k, v in self._root.items() if isinstance(v, h5py.Dataset)]
        if self._nat is not None:
            return self._nat.variables()
        return list(self._sp.variables)

    def close(self):
        if self._h5 is not None:
            self._h5.close()
        elif self._nat is not None:
            self._nat.close()
        else:
            self._sp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _h5_dim_names(ds) -> list:
    names = []
    for i in range(ds.ndim):
        try:
            dim = ds.dims[i]
            names.append(dim[0].name.rsplit("/", 1)[-1] if len(dim) else None)
        except Exception:
            names.append(None)
    return names


class NcWriter:
    """Write NetCDF4 (HDF5) files with dimension scales.

    Usage::

        with NcWriter(path) as nc:
            nc.def_dim("lay", 60)
            nc.write("p_lay", data, ("lay", "col"))
            nc.write_strings("gas_names", names, "absorber", string_len=32)
    """

    def __init__(self, path: str):
        if h5py is None:
            raise RuntimeError("h5py required to write NetCDF4 files")
        if os.path.exists(path):
            os.remove(path)
        self._h5 = h5py.File(path, "w")
        self._dims: Dict[str, int] = {}

    def def_dim(self, name: str, size: int):
        if name in self._dims:
            assert self._dims[name] == size, f"dim {name} redefined: {size}"
            return
        self._dims[name] = int(size)
        ds = self._h5.create_dataset(name, shape=(size,), dtype="f4")
        ds.make_scale(name)

    def write(self, name: str, data, dims: Sequence[str], attrs: Optional[dict] = None):
        data = np.asarray(data)
        assert data.ndim == len(dims), f"{name}: {data.shape} vs dims {dims}"
        for d, s in zip(dims, data.shape):
            self.def_dim(d, s)
        if name in self._dims:
            # A variable sharing a dimension name: overwrite the scale values.
            ds = self._h5[name]
            ds[...] = data.astype(ds.dtype)
        else:
            ds = self._h5.create_dataset(name, data=data)
            for i, d in enumerate(dims):
                ds.dims[i].attach_scale(self._h5[d])
        for k, v in (attrs or {}).items():
            ds.attrs[k] = v

    def write_scalar(self, name: str, value, dtype="f8"):
        self._h5.create_dataset(name, data=np.asarray(value, dtype=dtype))

    def write_strings(self, name: str, strings: Sequence[str], dim: str, string_len: int = 32):
        n = len(strings)
        self.def_dim(dim, n)
        self.def_dim("string_len", string_len)
        arr = np.zeros((n, string_len), dtype="S1")
        for i, s in enumerate(strings):
            b = s.encode("ascii")[:string_len]
            arr[i, : len(b)] = np.frombuffer(b, dtype="S1")
        ds = self._h5.create_dataset(name, data=arr)
        ds.dims[0].attach_scale(self._h5[dim])
        ds.dims[1].attach_scale(self._h5["string_len"])

    def group(self, name: str) -> "NcWriter":
        sub = object.__new__(NcWriter)
        sub._h5 = self._h5.require_group(name)
        sub._dims = {}
        return sub

    def close(self):
        if isinstance(self._h5, h5py.File):
            self._h5.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
