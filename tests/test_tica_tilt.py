"""TICA tilt preprocessing."""

import numpy as np

from rte_rrtmgp_tpu.tools.tica_tilt import tilted_path, tilt_field, tica_tilt

NX, NY, NZ = 8, 8, 12
DX = DY = 500.0
DZ = 400.0
XH = np.arange(NX + 1) * DX
YH = np.arange(NY + 1) * DY
ZH = np.arange(NZ + 1) * DZ
Z = 0.5 * (ZH[1:] + ZH[:-1])


def test_vertical_sun_is_identity():
    path, zh_t = tilted_path(XH, YH, ZH, sza=0.0, azi=0.0)
    assert len(path) == NZ
    assert all(p[:2] == (0, 0) for p in path)
    np.testing.assert_allclose(zh_t, ZH, atol=1e-6)

    rng = np.random.default_rng(0)
    var = rng.uniform(size=(NX * NY, NZ))
    np.testing.assert_allclose(tilt_field(var, path, NX, NY), var)


def test_slant_path_conserves_vertical_extent():
    path, zh_t = tilted_path(XH, YH, ZH, sza=np.deg2rad(50.0),
                             azi=np.deg2rad(30.0))
    assert len(path) > NZ  # slant path crosses more cells
    # dz segments accumulate to the domain height.
    np.testing.assert_allclose(zh_t[-1], ZH[-1], rtol=1e-6)
    assert np.all(np.diff(zh_t) >= -1e-9)
    # k indices are monotonically nondecreasing and span all layers.
    ks = [p[2] for p in path]
    assert ks[0] == 0 and max(ks) == NZ - 1
    assert all(b - a in (0, 1) for a, b in zip(ks, ks[1:]))


def test_tilt_samples_shifted_columns():
    """At 45 deg towards +x, upper layers sample cells shifted in x."""
    path, _ = tilted_path(XH, YH, ZH, sza=np.deg2rad(45.0),
                          azi=np.deg2rad(90.0))  # azi 90 -> +x direction
    dis = [p[0] for p in path]
    assert max(dis) >= 1  # x offsets appear
    var = np.zeros((NX * NY, NZ))
    var[:, :] = np.arange(NX)[None, :].repeat(NY, 0).reshape(-1, 1)  # = ix
    tilted = tilt_field(var, path, NX, NY)
    # Segment with offset di samples ix+di (mod NX).
    for s, (di, dj, k) in enumerate(path):
        np.testing.assert_allclose(tilted[0, s], di % NX)


def _case(nbkg=4, seed=1):
    rng = np.random.default_rng(seed)
    nlay = NZ + nbkg
    ncol = NX * NY
    z_full = np.concatenate([Z, ZH[-1] + (np.arange(nbkg) + 0.5) * 2000.0])
    p_lay = 1e5 * np.exp(-z_full / 8000.0)[None, :].repeat(ncol, 0)
    t_lay = (290.0 - 0.006 * z_full)[None, :].repeat(ncol, 0)
    zl_full = np.concatenate([ZH, ZH[-1] + (np.arange(nbkg) + 1) * 2000.0])
    p_lev = 1e5 * np.exp(-zl_full / 8000.0)[None, :].repeat(ncol, 0)
    t_lev = (290.0 - 0.006 * zl_full)[None, :].repeat(ncol, 0)
    lwp = rng.uniform(0, 10, (ncol, nlay))
    return p_lay, t_lay, p_lev, t_lev, lwp


def test_tica_tilt_full_case():
    rng = np.random.default_rng(1)
    nlay = NZ + 4  # 4 background layers above the domain
    ncol = NX * NY
    z_full = np.concatenate([Z, ZH[-1] + (np.arange(4) + 0.5) * 2000.0])
    p_lay = 1e5 * np.exp(-z_full / 8000.0)[None, :].repeat(ncol, 0)
    t_lay = (290.0 - 0.006 * z_full)[None, :].repeat(ncol, 0)
    zl_full = np.concatenate([ZH, ZH[-1] + (np.arange(4) + 1) * 2000.0])
    p_lev = 1e5 * np.exp(-zl_full / 8000.0)[None, :].repeat(ncol, 0)
    t_lev = (290.0 - 0.006 * zl_full)[None, :].repeat(ncol, 0)
    lwp = rng.uniform(0, 10, (ncol, nlay))

    out = tica_tilt(np.deg2rad(40.0), 0.0, NX, NY, XH, YH, ZH, Z,
                    {"lwp": lwp}, p_lay, t_lay, p_lev, t_lev)
    n_tilt = out["n_tilt"]
    # Compression maps the tilted domain back to the ORIGINAL layer count
    # (compress_fields; tilt_utils.cpp:596-662).
    assert n_tilt == NZ
    assert out["n_tilt_raw"] > NZ
    assert out["p_lay"].shape == p_lay.shape
    assert out["p_lev"].shape == p_lev.shape
    # Background layers restored untouched.
    np.testing.assert_allclose(out["p_lay"][:, n_tilt:], p_lay[:, NZ:])
    np.testing.assert_allclose(out["fields"]["lwp"][:, n_tilt:], lwp[:, NZ:])
    # Pressure decreases monotonically along the tilted column.
    assert np.all(np.diff(out["p_lay"], axis=1) < 0)
    assert np.all(np.diff(out["p_lev"], axis=1) < 0)


def test_tica_water_path_conservation_homogeneous():
    """For a horizontally homogeneous cloud field, each tilted segment of
    layer k contributes its vertical extent through k, so the per-column
    water path is conserved exactly by the density->tilt->sum scheme
    (tilt_utils.cpp:985-1055)."""
    p_lay, t_lay, p_lev, t_lev, _ = _case()
    ncol, nlay = p_lay.shape
    prof = np.linspace(5.0, 0.5, NZ)
    lwp = np.zeros((ncol, nlay))
    lwp[:, :NZ] = prof[None, :]
    rel = np.full((ncol, nlay), 10.0)

    out = tica_tilt(np.deg2rad(35.0), np.deg2rad(25.0), NX, NY, XH, YH,
                    ZH, Z, {"lwp": lwp, "rel": rel}, p_lay, t_lay,
                    p_lev, t_lev)
    got = out["fields"]["lwp"][:, :NZ].sum(axis=1)
    np.testing.assert_allclose(got, prof.sum(), rtol=1e-10)
    # rel is water-weighted: uniform field stays uniform.
    np.testing.assert_allclose(out["fields"]["rel"][:, :NZ], 10.0, rtol=1e-12)


def test_tica_vertical_sun_identity():
    """sza -> 0: the tilted path is the column itself and compression is a
    no-op, so every output equals the input (VERDICT convergence check)."""
    p_lay, t_lay, p_lev, t_lev, lwp = _case()
    rng = np.random.default_rng(3)
    ncol, nlay = p_lay.shape
    vmr = rng.uniform(1e-6, 1e-3, (ncol, nlay))
    out = tica_tilt(0.0, 0.0, NX, NY, XH, YH, ZH, Z,
                    {"lwp": lwp, "vmr_h2o": vmr}, p_lay, t_lay,
                    p_lev, t_lev)
    assert out["n_tilt"] == NZ and out["n_tilt_raw"] == NZ
    np.testing.assert_allclose(out["fields"]["vmr_h2o"], vmr, rtol=1e-12)
    np.testing.assert_allclose(out["fields"]["lwp"], lwp, rtol=1e-12)
    np.testing.assert_allclose(out["t_lay"][:, :NZ], t_lay[:, :NZ], rtol=5e-3)
    np.testing.assert_allclose(out["p_lay"][:, :NZ], p_lay[:, :NZ], rtol=5e-3)


def test_tica_compression_weighted_avg_exact():
    """Hand-checked pair-merge: uniform Δp -> plain mean of merged layers."""
    from rte_rrtmgp_tpu.tools.tica_tilt import (
        compress_columns_weighted_avg, compress_start_index)

    n_tilt, nz = 8, 6
    start = compress_start_index(n_tilt, nz)   # idx_hold=4 -> start=4
    assert start == 4
    var = np.arange(8, dtype=np.float64)[None, :]
    plev = np.linspace(1e5, 2e4, 9)[None, :]   # uniform dp
    out = compress_columns_weighted_avg(var, plev, start, nz)
    np.testing.assert_allclose(out[0], [0, 1, 2, 3, 4.5, 6.5])
