"""System tests for the RadiationSolver driver layer: spectral chunking
consistency, by-band/broadband agreement, orientation invariance, cloud and
aerosol effects."""

import numpy as np
import pytest

from rte_rrtmgp_tpu.data import synthetic
from rte_rrtmgp_tpu.models import (AerosolLUT, CloudLUT, KDist,
                                   RadiationSolverLW, RadiationSolverSW)
from rte_rrtmgp_tpu.cases.profiles import make_atmosphere

from helpers import GASES

NCOL, NLAY = 8, 24


def _luts(longwave):
    import tempfile, os
    kd = KDist.from_raw(synthetic.make_kdist_raw(longwave, gpt_per_band=4),
                        GASES, dtype=np.float64)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "c.nc")
        synthetic.write_cloud_nc(p, synthetic.make_cloud_raw(longwave))
        clut = CloudLUT.from_netcdf(p, dtype=np.float64)
        a = os.path.join(d, "a.nc")
        synthetic.write_aerosol_nc(a, synthetic.make_aerosol_raw())
        alut = AerosolLUT.from_netcdf(a, dtype=np.float64)
    return kd, clut, alut


def _atm():
    return make_atmosphere(NCOL, NLAY, seed=2)


@pytest.mark.slow
def test_lw_chunked_equals_unchunked():
    kd, clut, _ = _luts(True)
    atm = _atm()
    solver = RadiationSolverLW(kd, clut)
    emis = np.full((NCOL, kd.nbnd), 0.98)
    kwargs = dict(gas_concs=atm["gas_concs"], p_lay=atm["p_lay"],
                  p_lev=atm["p_lev"], t_lay=atm["t_lay"], t_lev=atm["t_lev"],
                  t_sfc=atm["t_sfc"], emis_sfc=emis,
                  lwp=atm["lwp"], iwp=atm["iwp"], rel=atm["rel"], dei=atm["dei"])
    full = solver.solve(**kwargs)
    chunked = solver.solve(**kwargs, gpt_chunk=12)  # not a divisor of 64
    for k in full:
        np.testing.assert_allclose(np.asarray(chunked[k]), np.asarray(full[k]),
                                   rtol=1e-11, err_msg=k)
    # Fluxes are physical.
    assert np.asarray(full["lw_flux_up"]).min() >= 0
    assert np.isfinite(np.asarray(full["lw_flux_net"])).all()


@pytest.mark.slow
def test_lw_byband_sums_to_broadband():
    kd, clut, _ = _luts(True)
    atm = _atm()
    solver = RadiationSolverLW(kd, clut)
    emis = np.full((NCOL, kd.nbnd), 0.95)
    out = solver.solve(gas_concs=atm["gas_concs"], p_lay=atm["p_lay"],
                       p_lev=atm["p_lev"], t_lay=atm["t_lay"],
                       t_lev=atm["t_lev"], t_sfc=atm["t_sfc"], emis_sfc=emis,
                       output_bnd_fluxes=True, gpt_chunk=20)
    np.testing.assert_allclose(
        np.asarray(out["lw_bnd_flux_up"]).sum(-1), np.asarray(out["lw_flux_up"]),
        rtol=1e-11)
    np.testing.assert_allclose(
        np.asarray(out["lw_bnd_flux_dn"]).sum(-1), np.asarray(out["lw_flux_dn"]),
        rtol=1e-11)


@pytest.mark.slow
def test_lw_orientation_invariance():
    """Flipping the vertical axis of all inputs must flip the outputs."""
    kd, clut, _ = _luts(True)
    atm = _atm()
    emis = np.full((NCOL, kd.nbnd), 0.98)
    solver = RadiationSolverLW(kd, clut)
    base = dict(gas_concs=atm["gas_concs"], t_sfc=atm["t_sfc"], emis_sfc=emis)
    out1 = solver.solve(p_lay=atm["p_lay"], p_lev=atm["p_lev"],
                        t_lay=atm["t_lay"], t_lev=atm["t_lev"], **base)

    flip = lambda a: np.ascontiguousarray(a[:, ::-1])
    gc2 = atm["gas_concs"]
    import copy
    gc_f = copy.deepcopy(gc2)
    for name in gc_f.names():
        v = gc_f.get_vmr(name)
        if v.ndim == 2:
            gc_f.set_vmr(name, flip(v))
    out2 = RadiationSolverLW(kd, clut).solve(
        gas_concs=gc_f, p_lay=flip(atm["p_lay"]), p_lev=flip(atm["p_lev"]),
        t_lay=flip(atm["t_lay"]), t_lev=flip(atm["t_lev"]),
        t_sfc=atm["t_sfc"], emis_sfc=emis)
    np.testing.assert_allclose(np.asarray(out2["lw_flux_up"]),
                               flip(np.asarray(out1["lw_flux_up"])), rtol=1e-11)
    np.testing.assert_allclose(np.asarray(out2["lw_flux_dn"]),
                               flip(np.asarray(out1["lw_flux_dn"])), rtol=1e-11)


@pytest.mark.slow
def test_sw_chunked_clouds_aerosols():
    kd, clut, alut = _luts(False)
    atm = _atm()
    solver = RadiationSolverSW(kd, clut, alut)
    alb = np.full((NCOL, kd.nbnd), 0.06)
    kwargs = dict(gas_concs=atm["gas_concs"], p_lay=atm["p_lay"],
                  p_lev=atm["p_lev"], t_lay=atm["t_lay"], mu0=atm["mu0"],
                  sfc_alb_dir=alb, sfc_alb_dif=alb,
                  lwp=atm["lwp"], iwp=atm["iwp"], rel=atm["rel"], dei=atm["dei"],
                  rh=atm["rh"], aermr=atm["aermr"],
                  delta_cloud=True, delta_aerosol=True)
    full = solver.solve(**kwargs, output_bnd_fluxes=True)
    chunked = solver.solve(**kwargs, gpt_chunk=8)
    for k in ("sw_flux_up", "sw_flux_dn", "sw_flux_dn_dir", "sw_flux_net"):
        np.testing.assert_allclose(np.asarray(chunked[k]), np.asarray(full[k]),
                                   rtol=1e-11, err_msg=k)
    np.testing.assert_allclose(np.asarray(full["sw_bnd_flux_dn"]).sum(-1),
                               np.asarray(full["sw_flux_dn"]), rtol=1e-11)

    up = np.asarray(full["sw_flux_up"])
    dn = np.asarray(full["sw_flux_dn"])
    toa_in = kd.total_solar_irradiance() * atm["mu0"]
    top = -1 if atm["p_lay"][0, 0] > atm["p_lay"][0, -1] else 0
    assert np.all(up[:, top] <= toa_in * (1 + 1e-10))
    assert dn.min() >= 0 and up.min() >= 0


@pytest.mark.slow
def test_sw_clouds_reduce_surface_flux():
    kd, clut, _ = _luts(False)
    atm = _atm()
    alb = np.full((NCOL, kd.nbnd), 0.06)
    solver = RadiationSolverSW(kd, clut)
    base = dict(gas_concs=atm["gas_concs"], p_lay=atm["p_lay"],
                p_lev=atm["p_lev"], t_lay=atm["t_lay"], mu0=atm["mu0"],
                sfc_alb_dir=alb, sfc_alb_dif=alb)
    clear = solver.solve(**base)
    cloudy = solver.solve(**base, lwp=atm["lwp"], iwp=atm["iwp"],
                          rel=atm["rel"], dei=atm["dei"], delta_cloud=True)
    has_cloud = (atm["lwp"] + atm["iwp"]).sum(1) > 0
    # Surface level is index 0 for this profile (surface at high pressure).
    sfc = 0 if atm["p_lay"][0, 0] > atm["p_lay"][0, -1] else -1
    dn_clear = np.asarray(clear["sw_flux_dn"])[:, sfc]
    dn_cloudy = np.asarray(cloudy["sw_flux_dn"])[:, sfc]
    assert np.all(dn_cloudy[has_cloud] < dn_clear[has_cloud] * 0.95)
    np.testing.assert_allclose(dn_cloudy[~has_cloud], dn_clear[~has_cloud],
                               rtol=1e-10)


def test_sw_night_columns_zero():
    kd, _, _ = _luts(False)
    atm = _atm()
    mu0 = atm["mu0"].copy()
    mu0[::2] = -0.1
    alb = np.full((NCOL, kd.nbnd), 0.06)
    out = RadiationSolverSW(kd).solve(
        gas_concs=atm["gas_concs"], p_lay=atm["p_lay"], p_lev=atm["p_lev"],
        t_lay=atm["t_lay"], mu0=mu0, sfc_alb_dir=alb, sfc_alb_dif=alb)
    dn = np.asarray(out["sw_flux_dn"])
    assert np.all(dn[::2] == 0.0)
    assert np.isfinite(dn).all()
    assert dn[1::2].max() > 0


def test_lw_warm_surface_net_cooling():
    """Physics: outgoing LW at TOA is positive; net flux divergence cools a
    warm-surface atmosphere overall."""
    kd, _, _ = _luts(True)
    atm = _atm()
    emis = np.full((NCOL, kd.nbnd), 1.0)
    out = RadiationSolverLW(kd).solve(
        gas_concs=atm["gas_concs"], p_lay=atm["p_lay"], p_lev=atm["p_lev"],
        t_lay=atm["t_lay"], t_lev=atm["t_lev"], t_sfc=atm["t_sfc"],
        emis_sfc=emis)
    top = -1 if atm["p_lay"][0, 0] > atm["p_lay"][0, -1] else 0
    olr = np.asarray(out["lw_flux_up"])[:, top]
    assert np.all(olr > 50.0) and np.all(olr < 600.0)
    assert np.asarray(out["lw_flux_dn"])[:, top].max() == 0.0


def test_lw_column_permutation_equivariance():
    """Columns are physically independent: permuting the column axis of every
    input must permute the outputs identically.  Catches cross-column leaks
    in blocked/one-hot formulations (flavor resolves, LUT selection matmuls,
    solver sweeps)."""
    import copy

    kd, clut, _ = _luts(True)
    atm = _atm()
    emis = np.full((NCOL, kd.nbnd), 0.97)
    solver = RadiationSolverLW(kd, clut)
    kwargs = dict(p_lay=atm["p_lay"], p_lev=atm["p_lev"], t_lay=atm["t_lay"],
                  t_lev=atm["t_lev"], t_sfc=atm["t_sfc"], emis_sfc=emis,
                  lwp=atm["lwp"], iwp=atm["iwp"], rel=atm["rel"],
                  dei=atm["dei"])
    out1 = solver.solve(gas_concs=atm["gas_concs"], **kwargs)

    perm = np.random.default_rng(7).permutation(NCOL)
    gc_p = copy.deepcopy(atm["gas_concs"])
    for name in gc_p.names():
        v = gc_p.get_vmr(name)
        if getattr(v, "ndim", 0) == 2 and v.shape[0] == NCOL:
            gc_p.set_vmr(name, np.ascontiguousarray(v[perm]))
    kwargs_p = {k: np.ascontiguousarray(v[perm]) for k, v in kwargs.items()}
    out2 = RadiationSolverLW(kd, clut).solve(gas_concs=gc_p, **kwargs_p)
    for k in out1:
        np.testing.assert_array_equal(np.asarray(out2[k]),
                                      np.asarray(out1[k])[perm], err_msg=k)


def test_lw_greenhouse_monotonicity():
    """More absorber means more atmospheric emission toward the surface:
    quadrupling CO2 must strictly increase LW surface downwelling in every
    column (the greenhouse invariant, independent of any oracle)."""
    import copy

    kd, _, _ = _luts(True)
    atm = _atm()
    emis = np.full((NCOL, kd.nbnd), 1.0)
    kwargs = dict(p_lay=atm["p_lay"], p_lev=atm["p_lev"], t_lay=atm["t_lay"],
                  t_lev=atm["t_lev"], t_sfc=atm["t_sfc"], emis_sfc=emis)
    out1 = RadiationSolverLW(kd).solve(gas_concs=atm["gas_concs"], **kwargs)
    gc4 = copy.deepcopy(atm["gas_concs"])
    gc4.set_vmr("co2", np.asarray(gc4.get_vmr("co2")) * 4.0)
    out2 = RadiationSolverLW(kd).solve(gas_concs=gc4, **kwargs)

    sfc = 0 if atm["p_lay"][0, 0] > atm["p_lay"][0, -1] else -1
    dn1 = np.asarray(out1["lw_flux_dn"])[:, sfc]
    dn2 = np.asarray(out2["lw_flux_dn"])[:, sfc]
    assert np.all(dn2 > dn1), (dn1, dn2)


def test_table_edge_inputs_finite():
    """Temperatures/pressures exactly at the k-table bounds, overhead sun
    (mu0=1), black surface (emis=1), and zero cloud water must all produce
    finite fluxes — the epsilon/guard paths at the interpolation edges."""
    kd, clut, _ = _luts(True)
    kd_sw, clut_sw, _ = _luts(False)
    atm = _atm()
    ncol, nlay = atm["p_lay"].shape

    t_edge = np.asarray(atm["t_lay"]).copy()
    t_edge[:, 0] = kd.temp_ref_min
    t_edge[:, -1] = kd.temp_ref_max
    p_edge = np.asarray(atm["p_lay"]).copy()
    hi = np.exp(np.asarray(kd.press_ref_log)).max()
    lo = np.exp(np.asarray(kd.press_ref_log)).min()
    p_edge[:, 0] = min(hi, p_edge[:, 0].max())
    p_edge[:, -1] = max(lo, p_edge[:, -1].min())
    t_lev = np.asarray(atm["t_lev"]).copy()
    t_lev[:, 0] = kd.temp_ref_min
    t_lev[:, -1] = kd.temp_ref_max

    out = RadiationSolverLW(kd, clut).solve(
        gas_concs=atm["gas_concs"], p_lay=p_edge, p_lev=atm["p_lev"],
        t_lay=t_edge, t_lev=t_lev, t_sfc=np.full(ncol, kd.temp_ref_min),
        emis_sfc=np.full((ncol, kd.nbnd), 1.0),
        lwp=np.zeros((ncol, nlay)), iwp=np.zeros((ncol, nlay)),
        rel=np.zeros((ncol, nlay)), dei=np.zeros((ncol, nlay)))
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k

    out_sw = RadiationSolverSW(kd_sw, clut_sw).solve(
        gas_concs=atm["gas_concs"], p_lay=p_edge, p_lev=atm["p_lev"],
        t_lay=t_edge, mu0=np.ones(ncol),
        sfc_alb_dir=np.zeros((ncol, kd_sw.nbnd)),
        sfc_alb_dif=np.ones((ncol, kd_sw.nbnd)),
        lwp=np.zeros((ncol, nlay)), iwp=np.zeros((ncol, nlay)),
        rel=np.zeros((ncol, nlay)), dei=np.zeros((ncol, nlay)))
    for k, v in out_sw.items():
        assert np.isfinite(np.asarray(v)).all(), k
