"""Layer-major 2D interchange (RTE_RRTMGP_LAYERMAJOR) vs the default path.

The lm path reorders cells (l*ncol + c), keeps every plane (N, G) from the
interp kernels into the layer-grid solvers, and computes the Planck level
sources by row shifts — per-cell math is identical, so the full solve must
agree with the default (ncol, nlay, G) path to f32 roundoff.  Runs the
Pallas kernels in interpret mode on CPU at float32.
"""

import numpy as np
import pytest

import jax
from jax.experimental.pallas import tpu as pltpu

from rte_rrtmgp_tpu.data import synthetic
from rte_rrtmgp_tpu.models import CloudLUT, KDist
from rte_rrtmgp_tpu.models import radiation as rad
from rte_rrtmgp_tpu.cases.profiles import make_atmosphere

from helpers import GASES

pytestmark = pytest.mark.slow

NCOL, NLAY = 9, 16


@pytest.fixture()
def f32_setup(monkeypatch):
    monkeypatch.setenv("RTE_RRTMGP_PALLAS", "1")
    kd_lw = KDist.from_raw(synthetic.make_kdist_raw(True, gpt_per_band=4),
                           GASES, dtype=np.float32)
    kd_sw = KDist.from_raw(synthetic.make_kdist_raw(False, gpt_per_band=4),
                           GASES, dtype=np.float32)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "c.nc")
        synthetic.write_cloud_nc(p, synthetic.make_cloud_raw(True))
        clut_lw = CloudLUT.from_netcdf(p, dtype=np.float32)
        p2 = os.path.join(d, "c2.nc")
        synthetic.write_cloud_nc(p2, synthetic.make_cloud_raw(False))
        clut_sw = CloudLUT.from_netcdf(p2, dtype=np.float32)
    atm = make_atmosphere(NCOL, NLAY, seed=5)
    f32 = lambda a: np.asarray(a, np.float32)
    return kd_lw, kd_sw, clut_lw, clut_sw, {k: (f32(v) if hasattr(v, "dtype")
                                                else v)
                                            for k, v in atm.items()}


def _vmr_coldry(kd, atm):
    from rte_rrtmgp_tpu.ops import gas_optics as gas_ops
    vmr = np.asarray(atm["gas_concs"].materialize(
        kd.gas_names, NCOL, NLAY, dtype=np.float32), np.float32)
    h2o = np.asarray(atm["gas_concs"].expand("h2o", NCOL, NLAY), np.float32)
    col_dry = gas_ops.get_col_dry(h2o, np.asarray(atm["p_lev"], np.float32))
    return vmr, np.asarray(col_dry, np.float32)


def _solve_lw(kd, clut, atm, monkeypatch, lm):
    monkeypatch.setenv("RTE_RRTMGP_LAYERMAJOR", "1" if lm else "0")
    vmr, col_dry = _vmr_coldry(kd, atm)
    emis = np.full((NCOL, kd.nbnd), 0.98, np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = rad._solve_lw_impl(
            kd, clut, *(np.asarray(atm[k], np.float32) for k in
                        ("p_lay", "p_lev", "t_lay", "t_lev", "t_sfc")),
            vmr, col_dry, emis,
            *(np.asarray(atm[k], np.float32) for k in
              ("lwp", "iwp", "rel", "dei")),
            top_at_1=True, gpt_chunk=None, output_bnd_fluxes=False,
            n_gauss_angles=1, with_clouds=True)
    return {k: np.asarray(v) for k, v in out.items()}


def _solve_sw(kd, clut, atm, monkeypatch, lm):
    monkeypatch.setenv("RTE_RRTMGP_LAYERMAJOR", "1" if lm else "0")
    vmr, col_dry = _vmr_coldry(kd, atm)
    alb = np.full((NCOL, kd.nbnd), 0.2, np.float32)
    mu0 = np.full((NCOL,), 0.7, np.float32)
    tsi = np.ones((NCOL,), np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = rad._solve_sw_impl(
            kd, clut, None,
            *(np.asarray(atm[k], np.float32) for k in
              ("p_lay", "p_lev", "t_lay")),
            vmr, col_dry, alb, alb, tsi, mu0,
            *(np.asarray(atm[k], np.float32) for k in
              ("lwp", "iwp", "rel", "dei")),
            None, None,
            top_at_1=True, gpt_chunk=None, output_bnd_fluxes=False,
            with_clouds=True, with_aerosols=False,
            delta_cloud=True, delta_aerosol=False)
    return {k: np.asarray(v) for k, v in out.items()}


def test_lw_layermajor_matches_default(f32_setup, monkeypatch):
    kd_lw, _, clut_lw, _, atm = f32_setup
    base = _solve_lw(kd_lw, clut_lw, atm, monkeypatch, lm=False)
    lm = _solve_lw(kd_lw, clut_lw, atm, monkeypatch, lm=True)
    assert set(lm) == set(base)
    for k in base:
        np.testing.assert_allclose(lm[k], base[k], rtol=2e-5, atol=1e-3,
                                   err_msg=k)
    assert np.isfinite(lm["lw_flux_up"]).all()


def test_sw_layermajor_matches_default(f32_setup, monkeypatch):
    _, kd_sw, _, clut_sw, atm = f32_setup
    base = _solve_sw(kd_sw, clut_sw, atm, monkeypatch, lm=False)
    lm = _solve_sw(kd_sw, clut_sw, atm, monkeypatch, lm=True)
    assert set(lm) == set(base)
    for k in base:
        np.testing.assert_allclose(lm[k], base[k], rtol=3e-5, atol=1e-2,
                                   err_msg=k)
    assert np.isfinite(lm["sw_flux_dn"]).all()
