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
    assert out["p_lay"].shape == (ncol, n_tilt + 4)
    assert out["p_lev"].shape == (ncol, n_tilt + 4 + 1)
    # Background layers restored untouched.
    np.testing.assert_allclose(out["p_lay"][:, n_tilt:], p_lay[:, NZ:])
    np.testing.assert_allclose(out["fields"]["lwp"][:, n_tilt:], lwp[:, NZ:])
    # Pressure decreases monotonically along the tilted column.
    assert np.all(np.diff(out["p_lay"], axis=1) < 0)
