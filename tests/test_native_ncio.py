"""Native C++ NetCDF classic codec (src_native/ncio.cc) tests.

Round-trip through the native writer/reader, cross-validation against
scipy's independent pure-Python implementation in both directions, and the
NcReader integration path (classic files must route through the native
backend when it is available).
"""

import os

import numpy as np
import pytest

from rte_rrtmgp_tpu.utils import native
from rte_rrtmgp_tpu.utils.ncio import NcReader

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native ncio library failed to build")


@pytest.fixture
def sample_arrays():
    rng = np.random.default_rng(0)
    return {
        "tau": rng.random((3, 5, 7)),                       # f8
        "ssa": rng.random((5, 7)).astype(np.float32),       # f4
        "counts": rng.integers(0, 100, (7,)).astype(np.int32),
        "small": rng.integers(-5, 5, (3,)).astype(np.int16),
    }


def _write_native(path, arrays):
    dims = {"tau": ("a", "b", "c"), "ssa": ("b", "c"),
            "counts": ("c",), "small": ("a",)}
    with native.NativeNcWriter(path) as w:
        for name, arr in arrays.items():
            w.write(name, arr, dims[name],
                    attrs={"long_name": name} if name == "tau" else None)


def test_native_roundtrip(tmp_path, sample_arrays):
    path = str(tmp_path / "rt.nc")
    _write_native(path, sample_arrays)
    with native.NativeNcFile(path) as f:
        assert set(f.variables()) == set(sample_arrays)
        assert f.dims() == {"a": 3, "b": 5, "c": 7}
        for name, arr in sample_arrays.items():
            got = f.read(name)
            assert got.dtype == arr.dtype
            np.testing.assert_array_equal(got, arr)
        assert f.att_text("tau", "long_name") == "tau"
        assert f.att_text("tau", "missing") is None


def test_scipy_reads_native_output(tmp_path, sample_arrays):
    from scipy.io import netcdf_file

    path = str(tmp_path / "interop.nc")
    _write_native(path, sample_arrays)
    nc = netcdf_file(path, "r", mmap=False)
    try:
        for name, arr in sample_arrays.items():
            np.testing.assert_array_equal(nc.variables[name][:], arr)
        assert nc.variables["tau"].long_name == b"tau"
    finally:
        nc.close()


def test_native_reads_scipy_output(tmp_path):
    from scipy.io import netcdf_file

    path = str(tmp_path / "sp.nc")
    data = np.arange(30.0).reshape(2, 3, 5)
    rec = np.arange(20.0).reshape(4, 5)     # record (unlimited) variable
    f = netcdf_file(path, "w")
    f.createDimension("t", None)
    f.createDimension("x", 2)
    f.createDimension("y", 3)
    f.createDimension("z", 5)
    v = f.createVariable("v", "f8", ("x", "y", "z"))
    v[:] = data
    r = f.createVariable("r", "f8", ("t", "z"))
    r[:] = rec
    f.flush()
    f.close()

    with native.NativeNcFile(path) as g:
        np.testing.assert_array_equal(g.read("v"), data)
        np.testing.assert_array_equal(g.read("r"), rec)
        assert g.dims() == {"t": 4, "x": 2, "y": 3, "z": 5}


def test_ncreader_uses_native_backend(tmp_path, sample_arrays):
    path = str(tmp_path / "via_reader.nc")
    _write_native(path, sample_arrays)
    with NcReader(path) as nc:
        assert nc._nat is not None, "classic file should use the native codec"
        assert nc.dim("b") == 5
        assert nc.has("ssa") and not nc.has("nope")
        np.testing.assert_array_equal(nc.read("tau"), sample_arrays["tau"])
        got = nc.read("ssa", dtype=np.float64)
        assert got.dtype == np.float64


def test_large_offsets_many_vars(tmp_path):
    """Vars past 4 GiB would need CDF-2 64-bit begins; simulate with many
    small vars to at least exercise multi-variable layout arithmetic."""
    path = str(tmp_path / "many.nc")
    arrays = {f"v{i:03d}": np.full((11,), float(i)) for i in range(100)}
    with native.NativeNcWriter(path) as w:
        for name, arr in arrays.items():
            w.write(name, arr, ("n",))
    with native.NativeNcFile(path) as f:
        for name, arr in arrays.items():
            np.testing.assert_array_equal(f.read(name), arr)


def _pack_cdf5(path, arrays):
    """Hand-construct a CDF-5 file (8-byte NON_NEG fields everywhere,
    including per-variable dimids) so the reader's width handling is
    exercised against an independent encoding of the spec."""
    import struct

    def be(fmt, *v):
        return struct.pack(">" + fmt, *v)

    def name(s):
        b = s.encode()
        return be("q", len(b)) + b + b"\x00" * (-len(b) % 4)

    dims = []          # (name, len)
    dim_ids = {}
    for arr_dims, arr in arrays.values():
        for dn, sz in zip(arr_dims, arr.shape):
            if dn not in dim_ids:
                dim_ids[dn] = len(dims)
                dims.append((dn, sz))

    hdr = b"CDF\x05" + be("q", 0)                       # magic + numrecs
    hdr += be("i", 0x0A) + be("q", len(dims))           # dim_list
    for dn, sz in dims:
        hdr += name(dn) + be("q", sz)
    hdr += be("i", 0) + be("q", 0)                      # gatt_list absent
    hdr += be("i", 0x0B) + be("q", len(arrays))         # var_list

    NP2NC = {np.dtype(np.float64): 6, np.dtype(np.int64): 10,
             np.dtype(np.float32): 5}
    bodies, var_hdrs = [], []
    for vn, (arr_dims, arr) in arrays.items():
        vh = name(vn) + be("q", len(arr_dims))
        for dn in arr_dims:
            vh += be("q", dim_ids[dn])                  # 8-byte dimids!
        vh += be("i", 0) + be("q", 0)                   # vatt_list absent
        vh += be("i", NP2NC[arr.dtype])
        payload = arr.astype(arr.dtype.newbyteorder(">")).tobytes()
        payload += b"\x00" * (-len(payload) % 4)
        vh += be("q", len(payload))                     # vsize
        var_hdrs.append(vh)
        bodies.append(payload)

    fixed = len(hdr) + sum(len(v) + 8 for v in var_hdrs)  # +8 per begin
    at, out = fixed, hdr
    for vh, body in zip(var_hdrs, bodies):
        out += vh + be("q", at)
        at += len(body)
    with open(path, "wb") as fp:
        fp.write(out + b"".join(bodies))


def test_cdf5_reader(tmp_path):
    """CDF-5 dimensioned variables: per-var dimids are 8 bytes on disk."""
    path = str(tmp_path / "v5.nc")
    rng = np.random.default_rng(3)
    arrays = {
        "tau": (("lay", "gpt"), rng.random((6, 16))),
        "idx": (("gpt",), rng.integers(0, 9, (16,)).astype(np.int64)),
        "t": (("lay",), rng.random((6,)).astype(np.float32)),
    }
    _pack_cdf5(path, arrays)
    with native.NativeNcFile(path) as f:
        assert f.dims() == {"lay": 6, "gpt": 16}
        for vn, (_, arr) in arrays.items():
            got = f.read(vn)
            assert got.dtype == arr.dtype
            np.testing.assert_array_equal(got, arr)


def test_writer_rejects_unrepresentable_int64(tmp_path):
    """CDF-2 output: int64 within int32 range downcasts, overflow raises."""
    path = str(tmp_path / "i64.nc")
    with native.NativeNcWriter(path) as w:
        w.write("ok", np.array([1, -2, 3], dtype=np.int64), ("n",))
        with pytest.raises(ValueError, match="int32 range"):
            w.write("bad", np.array([2**40], dtype=np.int64), ("m",))
        w.write("m_fill", np.array([0], dtype=np.int32), ("m",))
    with native.NativeNcFile(path) as f:
        got = f.read("ok")
        assert got.dtype == np.int32
        np.testing.assert_array_equal(got, [1, -2, 3])


def test_unaligned_payload_padding(tmp_path):
    """int16 arrays with odd element counts exercise the 4-byte padding."""
    path = str(tmp_path / "pad.nc")
    a = np.arange(7, dtype=np.int16)
    b = np.arange(9, dtype=np.int8)
    with native.NativeNcWriter(path) as w:
        w.write("a", a, ("x",))
        w.write("b", b, ("y",))
    with native.NativeNcFile(path) as f:
        np.testing.assert_array_equal(f.read("a"), a)
        np.testing.assert_array_equal(f.read("b"), b)
