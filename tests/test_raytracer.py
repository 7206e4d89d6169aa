"""Forward Monte-Carlo ray tracer: analytic limits + energy bookkeeping.

MC outputs are validated statistically (mean +- MC error), mirroring how the
reference validates its tracer against the 2-stream solver rather than
bitwise (SURVEY.md par.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_tpu.models import raytracer as rt

NZ, NY, NX = 8, 4, 4
DZ, DY, DX = 500.0, 1000.0, 1000.0


def _homogeneous(k_abs, k_sca, g=0.0):
    shape = (NZ, NY, NX)
    k_ext = jnp.full(shape, k_abs + k_sca, jnp.float32)
    k_sca_gas = jnp.full(shape, k_sca, jnp.float32)
    zeros = jnp.zeros(shape, jnp.float32)
    return k_ext, k_sca_gas, zeros, zeros, zeros + g, zeros + g


def test_knull_grid_is_max():
    k = jnp.arange(NZ * NY * NX, dtype=jnp.float32).reshape(NZ, NY, NX)
    kn = rt.create_knull_grid(k, (2, 2, 2), k_ext_null_min=0.0)
    assert kn.shape == (2, 2, 2)
    assert float(kn[1, 1, 1]) == float(k[4:, 2:, 2:].max())
    # floor applies
    kn2 = rt.create_knull_grid(jnp.zeros((NZ, NY, NX)), (2, 2, 2),
                               k_ext_null_min=0.5)
    assert float(kn2.min()) == 0.5


def test_rayleigh_sampling_moments():
    """Rayleigh phase: <cos> = 0, <cos^2> = 3/10 x 2? — integral of
    cos^2 * p(cos) over the Rayleigh PDF 3/8(1+cos^2)/2... checked
    numerically against direct integration."""
    u = jax.random.uniform(jax.random.PRNGKey(0), (200_000,))
    c = np.asarray(rt._rayleigh_sample(u))
    assert abs(c.mean()) < 5e-3
    # E[cos^2] for p(c) ∝ (1+c^2): (∫c^2(1+c^2))/(∫(1+c^2)) over [-1,1] = (2/3+2/5)/(8/3)=0.4
    assert abs((c ** 2).mean() - 0.4) < 5e-3
    assert c.min() >= -1.0001 and c.max() <= 1.0001


def test_henyey_sampling_mean():
    """HG phase: <cos> = g."""
    for g in (0.3, 0.85):
        u = jax.random.uniform(jax.random.PRNGKey(1), (200_000,))
        c = np.asarray(rt._henyey_sample(jnp.float32(g), u))
        assert abs(c.mean() - g) < 5e-3


def test_scatter_direction_unit_norm_and_angle():
    key = jax.random.PRNGKey(2)
    d = jax.random.normal(key, (1000, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    cos_scat = jax.random.uniform(jax.random.PRNGKey(3), (1000,)) * 2 - 1
    u_phi = jax.random.uniform(jax.random.PRNGKey(4), (1000,))
    nd = rt._scatter_direction(d, cos_scat, u_phi)
    norms = np.asarray(jnp.linalg.norm(nd, axis=1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    dots = np.asarray(jnp.sum(nd * d, axis=1))
    np.testing.assert_allclose(dots, np.asarray(cos_scat), atol=1e-3)


def _trace(key, fields, albedo, sun_z, tod_dir=1360.0, tod_dif=0.0, ppp=64,
           independent_column=False):
    k_ext, ksg, ksc, ksa, acld, aaer = fields
    alb = jnp.full((NY, NX), albedo, jnp.float32)
    sun = np.array([np.sqrt(max(0.0, 1 - sun_z ** 2)), 0.0, -sun_z])
    return rt.trace_rays(
        key, k_ext, ksg, ksc, ksa, acld, aaer, None, alb,
        (2, 2, 2), (DZ, DY, DX), tod_dir, tod_dif, sun,
        photons_per_pixel=ppp, independent_column=independent_column)


@pytest.mark.slow
def test_beer_lambert_pure_absorption():
    """ssa=0, direct beam only: surface direct flux = toa * exp(-tau/mu0)."""
    k_abs = 2.0e-4  # tau_total = 0.8 over 4000 m
    fields = _homogeneous(k_abs, 0.0)
    mu0 = 0.8
    out = _trace(jax.random.PRNGKey(0), fields, albedo=0.0, sun_z=mu0, ppp=512)
    tau_tot = k_abs * NZ * DZ
    expect = 1360.0 * np.exp(-tau_tot / mu0)
    got = float(np.asarray(out.flux_sfc_dir).mean())
    assert abs(got - expect) / expect < 0.05, (got, expect)
    assert float(np.asarray(out.flux_sfc_dif).mean()) == 0.0
    assert float(np.asarray(out.flux_tod_up).mean()) == 0.0
    # Absorption profile decays with depth (index 0 = surface).
    absd = np.asarray(out.flux_abs_dir).mean(axis=(1, 2))
    assert absd[-1] > absd[0]


def test_energy_conservation_scattering():
    """Conservative + absorbing mix with a reflective surface: all launched
    energy is accounted for by TOD-up + surface absorption + atmospheric
    absorption (Iwabuchi weighting is unbiased)."""
    fields = _homogeneous(5e-5, 2.0e-4, g=0.0)
    out = _trace(jax.random.PRNGKey(1), fields, albedo=0.3, sun_z=0.7, ppp=512)
    toa_dn = float(np.asarray(out.flux_toa_down).mean())
    tod_up = float(np.asarray(out.flux_tod_up).mean())
    sfc_net = float((np.asarray(out.flux_sfc_dir) + np.asarray(out.flux_sfc_dif)
                     - np.asarray(out.flux_sfc_up)).mean())
    atm_abs = float((np.asarray(out.flux_abs_dir)
                     + np.asarray(out.flux_abs_dif)).mean(axis=(1, 2)).sum() * DZ)
    total = tod_up + sfc_net + atm_abs
    assert toa_dn == pytest.approx(1360.0, rel=1e-6)
    assert abs(total - toa_dn) / toa_dn < 0.03, (total, toa_dn)


@pytest.mark.slow
def test_independent_column_matches_3d_for_homogeneous():
    """For a horizontally homogeneous medium the independent-column and 3D
    modes must agree statistically."""
    fields = _homogeneous(1e-4, 1e-4)
    o1 = _trace(jax.random.PRNGKey(2), fields, 0.1, 0.9, ppp=256,
                independent_column=True)
    o2 = _trace(jax.random.PRNGKey(3), fields, 0.1, 0.9, ppp=256,
                independent_column=False)
    a = float(np.asarray(o1.flux_sfc_dir).mean())
    b = float(np.asarray(o2.flux_sfc_dir).mean())
    assert abs(a - b) / max(a, b) < 0.05, (a, b)


@pytest.mark.slow
def test_cloud_shadow_3d():
    """An opaque cloud block in one quadrant shades the surface below it
    (direct flux) for an overhead sun."""
    k_ext, ksg, ksc, ksa, acld, aaer = _homogeneous(1e-5, 1e-5)
    # Opaque scattering cloud in upper-left quadrant, mid-levels.
    cld = np.zeros((NZ, NY, NX), np.float32)
    cld[4:6, :2, :2] = 0.02  # tau ~ 20 over 2 layers
    k_ext = k_ext + cld
    ksc = ksc + cld * 0.999
    acld = jnp.where(jnp.asarray(cld) > 0, 0.85, 0.0)
    out = _trace(jax.random.PRNGKey(4), (k_ext, ksg, ksc, ksa, acld, aaer),
                 albedo=0.0, sun_z=0.999, ppp=256)
    dirmap = np.asarray(out.flux_sfc_dir)
    shaded = dirmap[:2, :2].mean()
    sunny = dirmap[2:, 2:].mean()
    assert shaded < 0.1 * sunny, (shaded, sunny)


def test_pooled_window_matches_scan_sum():
    """A pooled spectral window (trace_rays_pooled) must statistically
    reproduce the sum of per-g-point traces: same per-(g, pixel) photon
    counts by construction, flux-weighted scoring at scatter time."""
    f0 = _homogeneous(1e-4, 2e-4)
    # three "g-points": scaled optics + different TOD fluxes
    scales = [0.5, 1.0, 2.0]
    tods = [200.0, 700.0, 460.0]
    alb = jnp.full((NY, NX), 0.2, jnp.float32)
    sun = np.array([0.0, 0.6, -0.8])

    stacked = [jnp.stack([f * s for s in scales]) for f in f0]
    pooled = rt.trace_rays_pooled(
        jax.random.PRNGKey(7), *stacked, None,
        jnp.stack([alb] * 3), (2, 2, 2), (DZ, DY, DX),
        jnp.asarray(tods, jnp.float32), jnp.zeros(3, jnp.float32), sun,
        photons_per_pixel=256)

    acc = None
    for i, (s, td) in enumerate(zip(scales, tods)):
        o = rt.trace_rays(
            jax.random.PRNGKey(100 + i), *[f * s for f in f0], None, alb,
            (2, 2, 2), (DZ, DY, DX), td, 0.0, sun, photons_per_pixel=256)
        acc = o if acc is None else jax.tree_util.tree_map(
            lambda a, b: a + b, acc, o)

    # exact bookkeeping: toa_down is deterministic
    np.testing.assert_allclose(np.asarray(pooled.flux_toa_down),
                               np.asarray(acc.flux_toa_down), rtol=1e-5)
    # statistical agreement of the MC estimates
    for name in ("flux_sfc_dir", "flux_sfc_dif", "flux_sfc_up",
                 "flux_tod_up"):
        a = float(np.asarray(getattr(pooled, name)).mean())
        b = float(np.asarray(getattr(acc, name)).mean())
        assert abs(a - b) <= 0.06 * sum(tods), (name, a, b)


def test_pooled_energy_conservation():
    """Pooled windows keep the Iwabuchi bookkeeping: launched energy =
    TOD up + surface net + atmospheric absorption, summed over the
    window."""
    f0 = _homogeneous(5e-5, 2.0e-4)
    stacked = [jnp.stack([f, f * 1.5]) for f in f0]
    alb = jnp.full((NY, NX), 0.3, jnp.float32)
    sun = np.array([np.sqrt(1 - 0.7 ** 2), 0.0, -0.7])
    out = rt.trace_rays_pooled(
        jax.random.PRNGKey(8), *stacked, None, jnp.stack([alb, alb]),
        (2, 2, 2), (DZ, DY, DX), jnp.asarray([900.0, 460.0], jnp.float32),
        jnp.zeros(2, jnp.float32), sun, photons_per_pixel=512)
    toa_dn = float(np.asarray(out.flux_toa_down).mean())
    tod_up = float(np.asarray(out.flux_tod_up).mean())
    sfc_net = float((np.asarray(out.flux_sfc_dir) + np.asarray(out.flux_sfc_dif)
                     - np.asarray(out.flux_sfc_up)).mean())
    atm_abs = float((np.asarray(out.flux_abs_dir)
                     + np.asarray(out.flux_abs_dif)).mean(axis=(1, 2)).sum() * DZ)
    total = tod_up + sfc_net + atm_abs
    assert toa_dn == pytest.approx(1360.0, rel=1e-6)
    assert abs(total - toa_dn) / toa_dn < 0.03, (total, toa_dn)
