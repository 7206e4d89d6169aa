"""3D forward ray-traced driver: MC vs two-stream cross-validation (the
reference's own physical validation strategy, Radiation_solver_rt.cu:903-956)."""

import numpy as np
import pytest

from rte_rrtmgp_tpu.data import synthetic
from rte_rrtmgp_tpu.models import KDist, CloudLUT
from rte_rrtmgp_tpu.models.radiation_rt import RadiationSolverRT
from rte_rrtmgp_tpu.cases.profiles import make_atmosphere

from helpers import GASES

pytestmark = pytest.mark.slow

NY, NX, NZ, NLAY = 4, 4, 12, 24
DZ = 500.0


@pytest.fixture(scope="module")
def setup():
    kd = KDist.from_raw(synthetic.make_kdist_raw(False, gpt_per_band=2),
                        GASES, dtype=np.float32)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "c.nc")
        synthetic.write_cloud_nc(p, synthetic.make_cloud_raw(False))
        clut = CloudLUT.from_netcdf(p, dtype=np.float32)
    atm = make_atmosphere(NY * NX, NLAY, seed=5)
    return kd, clut, atm


def _solve(kd, clut, atm, **kw):
    ncol = NY * NX
    args = dict(
        gas_concs=atm["gas_concs"], p_lay=atm["p_lay"], p_lev=atm["p_lev"],
        t_lay=atm["t_lay"], mu0=np.full(ncol, 0.8), azi=np.zeros(ncol),
        sfc_alb_dir=np.full((ncol, kd.nbnd), 0.06),
        sfc_alb_dif=np.full((ncol, kd.nbnd), 0.06),
        grid_cells=(NZ, NY, NX), grid_d=(DZ, 1000.0, 1000.0),
        kn_grid=(4, 2, 2), photons_per_pixel=64)
    args.update(kw)
    return RadiationSolverRT(kd, clut).solve(**args)


def test_clear_sky_mc_matches_twostream(setup):
    kd, clut, atm = setup
    out = _solve(kd, clut, atm, twostream=True)
    mc_sfc = (np.asarray(out.rt_flux_sfc_dir)
              + np.asarray(out.rt_flux_sfc_dif)).mean()
    ts_sfc = np.asarray(out.sw_flux_dn)[:, 0].mean()
    assert abs(mc_sfc - ts_sfc) / ts_sfc < 0.05, (mc_sfc, ts_sfc)
    # Direct beam agrees tightly (deterministic path through same optics).
    mc_dir = np.asarray(out.rt_flux_sfc_dir).mean()
    ts_dir = np.asarray(out.sw_flux_dn_dir)[:, 0].mean()
    assert abs(mc_dir - ts_dir) / ts_dir < 0.05, (mc_dir, ts_dir)


def test_energy_budget_closes(setup):
    kd, clut, atm = setup
    out = _solve(kd, clut, atm)
    toa = np.asarray(out.rt_flux_tod_dn).mean()
    tod_up = np.asarray(out.rt_flux_tod_up).mean()
    sfc_net = (np.asarray(out.rt_flux_sfc_dir) + np.asarray(out.rt_flux_sfc_dif)
               - np.asarray(out.rt_flux_sfc_up)).mean()
    atm_abs = (np.asarray(out.rt_flux_abs_dir)
               + np.asarray(out.rt_flux_abs_dif)).mean(axis=(1, 2)).sum() * DZ
    assert toa == pytest.approx(kd.total_solar_irradiance() * 0.8, rel=1e-5)
    assert abs(tod_up + sfc_net + atm_abs - toa) / toa < 0.02


def test_cloudy_mc(setup):
    kd, clut, atm = setup
    out = _solve(kd, clut, atm, lwp=atm["lwp"], iwp=atm["iwp"],
                 rel=atm["rel"], dei=atm["dei"], delta_cloud=True,
                 twostream=True)
    mc_sfc = (np.asarray(out.rt_flux_sfc_dir)
              + np.asarray(out.rt_flux_sfc_dif)).mean()
    ts_sfc = np.asarray(out.sw_flux_dn)[:, 0].mean()
    # 3D MC vs 1D two-stream differ physically in cloudy scenes, but the
    # domain means should stay within ~15%.
    assert abs(mc_sfc - ts_sfc) / ts_sfc < 0.15, (mc_sfc, ts_sfc)
    # Clouds increase the reflected flux vs clear sky.
    clear = _solve(kd, clut, atm)
    assert (np.asarray(out.rt_flux_tod_up).mean()
            > np.asarray(clear.rt_flux_tod_up).mean())
    assert np.isfinite(np.asarray(out.rt_flux_abs_dif)).all()


def test_cloud_mie_sampling(setup):
    """Mie phase LUT wiring: cloudy solve with per-band Mie tables runs,
    stays finite, and conserves energy (reference --cloud-mie,
    Radiation_solver_rt.cu:921-935)."""
    kd, clut, atm = setup
    ncol = NY * NX
    raw = synthetic.make_mie_raw(nbnd=kd.nbnd)
    lwp = np.zeros((ncol, NLAY)); lwp[:, 3:6] = 20.0
    iwp = np.zeros((ncol, NLAY))
    rel = np.full((ncol, NLAY), 10.0)
    dei = np.full((ncol, NLAY), 30.0)

    def run(mie):
        solver = RadiationSolverRT(
            kd, clut,
            mie_cdf=raw["phase_cdf"] if mie else None,
            mie_ang=raw["phase_cdf_angle"] if mie else None)
        return solver.solve(
            gas_concs=atm["gas_concs"], p_lay=atm["p_lay"], p_lev=atm["p_lev"],
            t_lay=atm["t_lay"], mu0=np.full(ncol, 0.8), azi=np.zeros(ncol),
            sfc_alb_dir=np.full((ncol, kd.nbnd), 0.06),
            sfc_alb_dif=np.full((ncol, kd.nbnd), 0.06),
            grid_cells=(NZ, NY, NX), grid_d=(DZ, 1000.0, 1000.0),
            kn_grid=(4, 2, 2), photons_per_pixel=32,
            lwp=lwp, iwp=iwp, rel=rel, dei=dei)

    out = run(mie=True)
    tod_dn = np.asarray(out.rt_flux_tod_dn).mean()
    tod_up = np.asarray(out.rt_flux_tod_up).mean()
    sfc = (np.asarray(out.rt_flux_sfc_dir) + np.asarray(out.rt_flux_sfc_dif)).mean()
    absorbed = (np.asarray(out.rt_flux_abs_dir).sum(0)
                + np.asarray(out.rt_flux_abs_dif).sum(0)).mean() * DZ
    sfc_up = np.asarray(out.rt_flux_sfc_up).mean()
    budget = tod_up + sfc - sfc_up + absorbed
    assert np.isfinite(budget)
    assert abs(budget - tod_dn) / tod_dn < 0.08, (budget, tod_dn)


def test_tod_extra_layer(setup):
    """Reference-exact TOD bundling (Raytracer.cu:111-166 +
    test_rte_rrtmgp_rt.cu:334): when nlay > nz the ray-traced grid gets ONE
    extra top cell integrating the above-domain atmosphere.  Ground truth:
    a run whose domain spans the FULL atmosphere (no extra cell).  The
    short-domain run must reproduce the full run's per-layer absorption in
    every in-domain cell, and its extra cell must carry the integral of
    the full run's above-domain layers — folding the above-domain into the
    top in-domain cell (the round-1 behavior) breaks both."""
    kd, clut, atm = setup
    short = _solve(kd, clut, atm, photons_per_pixel=512,
                   independent_column=True)
    abs_s = (np.asarray(short.rt_flux_abs_dir)
             + np.asarray(short.rt_flux_abs_dif)).mean(axis=(1, 2))
    assert abs_s.shape == (NZ + 1,), "extra TOD layer missing"

    full = _solve(kd, clut, atm, photons_per_pixel=512,
                  independent_column=True, grid_cells=(NLAY, NY, NX))
    abs_f = (np.asarray(full.rt_flux_abs_dir)
             + np.asarray(full.rt_flux_abs_dif)).mean(axis=(1, 2))
    assert abs_f.shape == (NLAY,), "full-domain run must have no extra cell"

    # In-domain cells: per-layer absorption matches the ground truth within
    # MC noise (~5% per cell at 512 ppp; the buggy fold inflates cell NZ-1
    # by the entire above-domain absorption, a ~3x error here).
    np.testing.assert_allclose(abs_s[:NZ], abs_f[:NZ], rtol=0.15)
    # The extra cell integrates exactly the above-domain layers (same dz,
    # so volumetric rates add directly).
    above = abs_f[NZ:].sum()
    assert abs(abs_s[NZ] - above) / above < 0.15, (abs_s[NZ], above)


def test_bnd_fluxes_sum_to_broadband(setup):
    """By-band rt + two-stream fluxes (Fluxes_byband_rt analog): band sums
    must equal the broadband accumulators exactly (same additions)."""
    kd, clut, atm = setup
    out = _solve(kd, clut, atm, twostream=True, output_bnd_fluxes=True,
                 photons_per_pixel=32)
    for bnd_name, bb_name in [
            ("rt_bnd_flux_tod_dn", "rt_flux_tod_dn"),
            ("rt_bnd_flux_tod_up", "rt_flux_tod_up"),
            ("rt_bnd_flux_sfc_dir", "rt_flux_sfc_dir"),
            ("rt_bnd_flux_sfc_dif", "rt_flux_sfc_dif"),
            ("rt_bnd_flux_sfc_up", "rt_flux_sfc_up")]:
        bnd = np.asarray(getattr(out, bnd_name))
        assert bnd.shape == (kd.nbnd, NY, NX), bnd_name
        np.testing.assert_allclose(bnd.sum(0), np.asarray(getattr(out, bb_name)),
                                   rtol=2e-5, atol=1e-4, err_msg=bnd_name)
    for bnd_name, bb_name in [("sw_bnd_flux_up", "sw_flux_up"),
                              ("sw_bnd_flux_dn", "sw_flux_dn"),
                              ("sw_bnd_flux_dn_dir", "sw_flux_dn_dir")]:
        bnd = np.asarray(getattr(out, bnd_name))
        assert bnd.shape == (NY * NX, NLAY + 1, kd.nbnd), bnd_name
        np.testing.assert_allclose(bnd.sum(-1), np.asarray(getattr(out, bb_name)),
                                   rtol=2e-5, atol=1e-4, err_msg=bnd_name)
    # Every nonzero band contributes (no all-zero bands in daylight SW).
    assert (np.asarray(out.rt_bnd_flux_tod_dn).sum((1, 2)) > 0).all()


def test_tica_converges_to_untilted(setup):
    """VERDICT gate: the tilted (TICA) solve converges to the untilted solve
    as sza -> 0.  At exactly sza=0 the tilt+compress pipeline is the
    identity, so the independent-column fluxes must match bitwise; at a
    small angle the two-stream surface flux stays within a few percent."""
    from rte_rrtmgp_tpu.tools.tica_tilt import tica_tilt

    kd, clut, atm = setup
    ncol = NY * NX
    xh = np.arange(NX + 1) * 1000.0
    yh = np.arange(NY + 1) * 1000.0
    zh = np.arange(NZ + 1) * DZ
    z = 0.5 * (zh[1:] + zh[:-1])
    fields = {k: atm[k] for k in ("lwp", "iwp", "rel", "dei")}
    for g in atm["gas_concs"].names():
        v = atm["gas_concs"].get_vmr(g)
        if np.ndim(v) == 2:
            fields[f"vmr_{g}"] = v

    def run(gc, p_lay, p_lev, t_lay, clouds, mu0):
        return _solve(kd, clut, atm, gas_concs=gc, p_lay=p_lay, p_lev=p_lev,
                      t_lay=t_lay, mu0=np.full(ncol, mu0),
                      independent_column=True, twostream=True,
                      photons_per_pixel=16, **clouds)

    clouds0 = {k: atm[k] for k in ("lwp", "iwp", "rel", "dei")}
    base = run(atm["gas_concs"], atm["p_lay"], atm["p_lev"], atm["t_lay"],
               clouds0, 1.0)

    tilt = tica_tilt(0.0, 0.0, NX, NY, xh, yh, zh, z, fields,
                     atm["p_lay"], atm["t_lay"],
                     atm["p_lev"], atm["t_lev"])
    # identity at sza=0: tilted inputs equal the originals
    np.testing.assert_allclose(tilt["fields"]["lwp"], atm["lwp"], rtol=1e-12)
    import copy
    gc_t = copy.deepcopy(atm["gas_concs"])
    for g in gc_t.names():
        if f"vmr_{g}" in tilt["fields"]:
            gc_t.set_vmr(g, tilt["fields"][f"vmr_{g}"])
    clouds_t = {k: tilt["fields"][k] for k in ("lwp", "iwp", "rel", "dei")}
    tica = run(gc_t, atm["p_lay"], atm["p_lev"], atm["t_lay"], clouds_t, 1.0)
    np.testing.assert_allclose(np.asarray(tica.sw_flux_dn),
                               np.asarray(base.sw_flux_dn), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tica.rt_flux_sfc_dir),
                               np.asarray(base.rt_flux_sfc_dir), rtol=1e-6)


def test_single_gpt(setup):
    """--single-gpt traces exactly one g-point (fluxes ~ that g-point's
    solar source only)."""
    kd, clut, atm = setup
    out1 = _solve(kd, clut, atm, single_gpt=1, photons_per_pixel=32)
    toa1 = np.asarray(out1.rt_flux_tod_dn).mean()
    solar = np.asarray(kd.solar_source)
    expected = float(solar[0]) * 0.8  # tod_dir = solar * tsi * mu0
    assert abs(toa1 - expected) / expected < 1e-3, (toa1, expected)


def test_single_gpt_bnd_fluxes(setup):
    """Regression: --single-gpt + --output-bnd-fluxes must scatter into the
    GLOBAL band axis (slice_gpt keeps global band indices in gpt2band but
    shrinks the sliced kd's nbnd to 1, which used to zero every band > 0
    and raise in the two-stream by-band path)."""
    kd, clut, atm = setup
    # Pick a g-point in the LAST band — the case that was silently zero.
    gpt = kd.ngpt  # 1-based
    band = int(np.asarray(kd.gpt2band)[gpt - 1])
    assert band > 0
    out = _solve(kd, clut, atm, single_gpt=gpt, twostream=True,
                 output_bnd_fluxes=True, photons_per_pixel=16)
    bnd = np.asarray(out.rt_bnd_flux_tod_dn)
    assert bnd.shape[0] == kd.nbnd
    # All flux lands in that g-point's band; other bands stay zero.
    np.testing.assert_allclose(bnd[band], np.asarray(out.rt_flux_tod_dn),
                               rtol=1e-6)
    mask = np.ones(kd.nbnd, bool)
    mask[band] = False
    assert np.abs(bnd[mask]).max() == 0.0
    sw_bnd = np.asarray(out.sw_bnd_flux_dn)
    assert sw_bnd.shape[-1] == kd.nbnd
    np.testing.assert_allclose(sw_bnd.sum(-1), np.asarray(out.sw_flux_dn),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(sw_bnd[:, :, mask]).max() == 0.0


def test_windowed_dispatch_matches_single(setup):
    """gpt_per_dispatch windows (one device dispatch per W g-points, the
    TPU-watchdog-safe mode) reproduce the single-dispatch scan exactly:
    same per-g-point RNG keys, same accumulation order."""
    kd, clut, atm = setup
    one = _solve(kd, clut, atm, twostream=True, photons_per_pixel=16,
                 output_bnd_fluxes=True)
    win = _solve(kd, clut, atm, twostream=True, photons_per_pixel=16,
                 output_bnd_fluxes=True, gpt_per_dispatch=5)
    for name in ("rt_flux_tod_dn", "rt_flux_sfc_dir", "rt_flux_sfc_dif",
                 "rt_flux_abs_dir", "sw_flux_dn", "sw_bnd_flux_up",
                 "rt_bnd_flux_sfc_dir"):
        a, b = getattr(one, name), getattr(win, name)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-6,
                                   atol=1e-6, err_msg=name)
    # band sums still equal broadband in windowed mode
    np.testing.assert_allclose(
        np.asarray(win.rt_bnd_flux_sfc_dir).sum(0),
        np.asarray(win.rt_flux_sfc_dir), rtol=1e-5, atol=1e-5)


def test_auto_dispatch_matches_single(setup):
    """gpt_per_dispatch='auto' (measured window sizing) reproduces the
    single-dispatch result exactly — windows only repartition the same
    per-g-point RNG streams and additions."""
    kd, clut, atm = setup
    one = _solve(kd, clut, atm, photons_per_pixel=16)
    auto = _solve(kd, clut, atm, photons_per_pixel=16,
                  gpt_per_dispatch="auto")
    for name in ("rt_flux_tod_dn", "rt_flux_sfc_dir", "rt_flux_sfc_dif",
                 "rt_flux_abs_dir"):
        np.testing.assert_allclose(np.asarray(getattr(one, name)),
                                   np.asarray(getattr(auto, name)),
                                   rtol=2e-6, atol=1e-6, err_msg=name)


def test_spectral_lanes_matches_scan(setup):
    """The vmap-merged spectral-lane mode reproduces the sequential g-point
    scan (identical per-g RNG streams; differs only by accumulation order),
    both single-dispatch and windowed."""
    kd, clut, atm = setup
    scan = _solve(kd, clut, atm, photons_per_pixel=16,
                  output_bnd_fluxes=True)
    lanes = _solve(kd, clut, atm, photons_per_pixel=16,
                   output_bnd_fluxes=True, spectral_mode="lanes")
    lanes_w = _solve(kd, clut, atm, photons_per_pixel=16,
                     output_bnd_fluxes=True, spectral_mode="lanes",
                     gpt_per_dispatch=5)
    for name in ("rt_flux_tod_dn", "rt_flux_tod_up", "rt_flux_sfc_dir",
                 "rt_flux_sfc_dif", "rt_flux_sfc_up", "rt_flux_abs_dir",
                 "rt_flux_abs_dif", "rt_bnd_flux_sfc_dir"):
        a = np.asarray(getattr(scan, name))
        np.testing.assert_allclose(np.asarray(getattr(lanes, name)), a,
                                   rtol=2e-5, atol=1e-5, err_msg=name)
        np.testing.assert_allclose(np.asarray(getattr(lanes_w, name)), a,
                                   rtol=2e-5, atol=1e-5, err_msg=name)
