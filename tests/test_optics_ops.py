"""Increments, delta scaling, cloud/aerosol optics, flux reductions."""

import jax.numpy as jnp
import numpy as np

from rte_rrtmgp_tpu.data import synthetic
from rte_rrtmgp_tpu.models.cloud_lut import CloudLUT
from rte_rrtmgp_tpu.models.aerosol_lut import AerosolLUT
from rte_rrtmgp_tpu.models.types import OpticalProps1scl, OpticalProps2str
from rte_rrtmgp_tpu.ops import optics_ops, cloud_optics, aerosol_optics, fluxes
from rte_rrtmgp_tpu.ops import reference as ref

from helpers import small_kdist, small_atmos

NCOL, NLAY, NGPT = 4, 10, 12
EPS = np.finfo(np.float64).eps
BANDS = ((0, 4), (4, 9), (9, 12))
G2B = tuple(ib for ib, (g0, g1) in enumerate(BANDS) for _ in range(g1 - g0))


def _rand2str(seed):
    rng = np.random.default_rng(seed)
    return (10.0 ** rng.uniform(-3, 0.5, (NCOL, NLAY, NGPT)),
            rng.uniform(0, 1, (NCOL, NLAY, NGPT)),
            rng.uniform(0, 0.9, (NCOL, NLAY, NGPT)))


def test_increment_2str():
    t1, s1, g1 = _rand2str(0)
    t2, s2, g2 = _rand2str(1)
    to, so, go_ = ref.increment_2str_by_2str(t1, s1, g1, t2, s2, g2, EPS)
    out = optics_ops.increment_2str_by_2str(
        OpticalProps2str(*map(jnp.asarray, (t1, s1, g1))),
        OpticalProps2str(*map(jnp.asarray, (t2, s2, g2))))
    np.testing.assert_allclose(np.asarray(out.tau), to, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(out.ssa), so, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(out.g), go_, rtol=1e-13)


def test_increment_bybnd():
    t1, s1, g1 = _rand2str(2)
    rng = np.random.default_rng(3)
    nbnd = len(BANDS)
    t2 = 10.0 ** rng.uniform(-3, 0, (NCOL, NLAY, nbnd))
    s2 = rng.uniform(0, 1, (NCOL, NLAY, nbnd))
    g2 = rng.uniform(0, 0.9, (NCOL, NLAY, nbnd))
    to, so, go_ = ref.increment_2str_by_2str_bybnd(t1, s1, g1, t2, s2, g2, BANDS, EPS)
    out = optics_ops.increment_2str_by_2str_bybnd(
        OpticalProps2str(*map(jnp.asarray, (t1, s1, g1))),
        OpticalProps2str(*map(jnp.asarray, (t2, s2, g2))), G2B)
    np.testing.assert_allclose(np.asarray(out.tau), to, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(out.ssa), so, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(out.g), go_, rtol=1e-13)

    tau1 = t1.copy()
    to1 = ref.increment_1scl_by_1scl_bybnd(tau1, t2, BANDS)
    out1 = optics_ops.increment_1scl_by_1scl_bybnd(
        OpticalProps1scl(jnp.asarray(t1)), OpticalProps1scl(jnp.asarray(t2)), G2B)
    np.testing.assert_allclose(np.asarray(out1.tau), to1, rtol=1e-13)


def test_delta_scale():
    t, s, g = _rand2str(4)
    to, so, go_ = ref.delta_scale_2str(t, s, g, EPS)
    out = optics_ops.delta_scale(OpticalProps2str(*map(jnp.asarray, (t, s, g))))
    np.testing.assert_allclose(np.asarray(out.tau), to, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(out.ssa), so, rtol=1e-13)
    np.testing.assert_allclose(np.asarray(out.g), go_, rtol=1e-13)


def test_cloud_optics_matches_oracle():
    raw = synthetic.make_cloud_raw(longwave=False)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "cloud.nc")
        synthetic.write_cloud_nc(path, raw)
        lut = CloudLUT.from_netcdf(path, dtype=np.float64)

    atm = small_atmos(NCOL, 14)
    lwp, iwp, rel, dei = atm["lwp"], atm["iwp"], atm["rel"], atm["dei"]
    assert lwp.max() > 0 and iwp.max() > 0

    lt, lts, ltsg = ref.cloud_optics_from_lut(
        lwp, rel, lut.liq_nsteps, lut.liq_step_size, lut.radliq_lwr,
        np.asarray(lut.lut_extliq), np.asarray(lut.lut_ssaliq), np.asarray(lut.lut_asyliq))
    it, its, itsg = ref.cloud_optics_from_lut(
        iwp, dei, lut.ice_nsteps, lut.ice_step_size, lut.diamice_lwr,
        np.asarray(lut.lut_extice), np.asarray(lut.lut_ssaice), np.asarray(lut.lut_asyice))
    tau_o = lt + it
    ssa_o = (lts + its) / np.maximum(tau_o, EPS)
    g_o = (ltsg + itsg) / np.maximum(lts + its, EPS)

    out = cloud_optics.cloud_optics_2str(
        lut, *map(jnp.asarray, (lwp, iwp, rel, dei)))
    np.testing.assert_allclose(np.asarray(out.tau), tau_o, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.ssa), ssa_o, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.g), g_o, rtol=1e-12)

    out1 = cloud_optics.cloud_optics_1scl(
        lut, *map(jnp.asarray, (lwp, iwp, rel, dei)))
    np.testing.assert_allclose(np.asarray(out1.tau), (lt - lts) + (it - its),
                               rtol=1e-12)


def test_cloud_optics_below_range_re_flat_clamps():
    """Effective radii below the table range must flat-clamp to the first
    LUT row (the gather formulation's clip semantics): tau stays positive
    and equals the first-bin value, never zero or negative."""
    raw = synthetic.make_cloud_raw(longwave=False)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "cloud.nc")
        synthetic.write_cloud_nc(path, raw)
        lut = CloudLUT.from_netcdf(path, dtype=np.float64)

    ncol, nlay = 2, 3
    lwp = np.full((ncol, nlay), 20.0)
    iwp = np.zeros((ncol, nlay))
    dei = np.full((ncol, nlay), lut.diamice_lwr + 5.0)
    # far below radliq_lwr -> idx <= 0 in the lerp index arithmetic
    rel_low = np.full((ncol, nlay), max(lut.radliq_lwr - 3.0 * lut.liq_step_size, 0.01))
    rel_edge = np.full((ncol, nlay), lut.radliq_lwr)

    out_low = cloud_optics.cloud_optics_2str(
        lut, *map(jnp.asarray, (lwp, iwp, rel_low, dei)))
    out_edge = cloud_optics.cloud_optics_2str(
        lut, *map(jnp.asarray, (lwp, iwp, rel_edge, dei)))
    assert np.asarray(out_low.tau).min() > 0.0
    np.testing.assert_allclose(np.asarray(out_low.tau),
                               np.asarray(out_edge.tau), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out_low.ssa),
                               np.asarray(out_edge.ssa), rtol=1e-12)


def test_aerosol_optics_runs_and_is_physical():
    raw = synthetic.make_aerosol_raw()
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "aero.nc")
        synthetic.write_aerosol_nc(path, raw)
        lut = AerosolLUT.from_netcdf(path, dtype=np.float64)

    atm = small_atmos(NCOL, 14)
    out = aerosol_optics.aerosol_optics_2str(
        lut, jnp.asarray(atm["aermr"]), jnp.asarray(atm["rh"]),
        jnp.asarray(atm["p_lev"]))
    tau = np.asarray(out.tau)
    ssa = np.asarray(out.ssa)
    g = np.asarray(out.g)
    assert tau.min() >= 0 and tau.max() > 0
    assert 0 <= ssa.min() and ssa.max() <= 1
    assert 0 <= g.min() and g.max() <= 1
    assert tau.shape == (NCOL, 14, lut.nbnd)


def test_aerosol_rh_class_matches_reference_search():
    """searchsorted(left) must reproduce the reference's linear rh_class scan
    (src/Aerosol_optics.cpp:26-36)."""
    rh_classes = np.linspace(0.1, 1.0, 12)

    def ref_rh_class(x):
        ihum = 0
        while rh_classes[ihum] < x:
            ihum += 1
        return ihum

    xs = np.concatenate([np.random.default_rng(0).uniform(0.0, 1.0, 50),
                         rh_classes.copy()])
    got = np.searchsorted(rh_classes, xs, side="left")
    want = np.array([ref_rh_class(x) for x in xs])
    np.testing.assert_array_equal(got, want)


def test_flux_reductions():
    rng = np.random.default_rng(5)
    f = rng.uniform(0, 100, (NCOL, NLAY + 1, NGPT))
    np.testing.assert_allclose(
        np.asarray(fluxes.sum_broadband(jnp.asarray(f))), ref.sum_broadband(f),
        rtol=1e-13)
    np.testing.assert_allclose(
        np.asarray(fluxes.sum_byband(jnp.asarray(f), G2B, len(BANDS))),
        ref.sum_byband(f, BANDS), rtol=1e-13)

    arr_bnd = rng.uniform(0, 1, (NCOL, len(BANDS)))
    out = fluxes.expand_bands_to_gpt(jnp.asarray(arr_bnd), G2B)
    for ib, (g0, g1) in enumerate(BANDS):
        np.testing.assert_array_equal(np.asarray(out[:, g0:g1]),
                                      np.broadcast_to(arr_bnd[:, ib:ib + 1],
                                                      (NCOL, g1 - g0)))
