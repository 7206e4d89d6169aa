"""Backward (camera) ray tracer: analytic limits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_tpu.models import raytracer_bw as rbw

pytestmark = pytest.mark.slow

NZ, NY, NX = 4, 8, 8
DZ = DY = DX = 500.0
MU0 = 0.8
SUN = np.array([np.sqrt(1 - MU0 ** 2), 0.0, MU0])  # toward the sun
KBG = 2


def _bg(k=1e-9):
    k_bg = jnp.full((KBG,), k, jnp.float32)
    ssa_bg = jnp.zeros((KBG,), jnp.float32)
    asy_split = jnp.zeros((KBG, 3), jnp.float32).at[:, 0].set(1.0)
    z_lev = jnp.asarray([NZ * DZ, NZ * DZ + 1000.0, NZ * DZ + 2000.0],
                        jnp.float32)
    return k_bg, ssa_bg, asy_split, z_lev


def _trace(key, k_ext, ksg, albedo=0.2, land=1.0, ppp=32, cam=None,
           k_abs_bg=1e-9):
    shape = (NZ, NY, NX)
    zeros = jnp.zeros(shape, jnp.float32)
    cam = cam or rbw.Camera(cam_type=2, nx=NX, ny=NY)
    return rbw.trace_rays_bw(
        key, cam, k_ext, ksg, zeros, zeros, zeros, zeros,
        *_bg(k_abs_bg),
        jnp.full((NY, NX), albedo, jnp.float32),
        jnp.full((NY, NX), land, jnp.float32),
        (2, 2, 2), (DZ, DY, DX), jnp.asarray(SUN, jnp.float32), MU0,
        photons_per_pixel=ppp)


def test_vacuum_lambertian_radiance():
    """No atmosphere, Lambertian albedo 0.2: TOA nadir radiance estimator
    equals albedo * sun_solid_angle / pi exactly (reference calibration)."""
    shape = (NZ, NY, NX)
    count, shot = _trace(jax.random.PRNGKey(0),
                         jnp.full(shape, 1e-9, jnp.float32),
                         jnp.zeros(shape, jnp.float32), ppp=64)
    per_photon = float(np.asarray(count).sum() / np.asarray(shot).sum())
    expect = 0.2 * rbw.SUN_SOLID_ANGLE / np.pi
    assert abs(per_photon - expect) / expect < 0.05


def test_absorbing_atmosphere_attenuates():
    """Absorbing layer reduces the rendered surface radiance by roughly
    exp(-tau*(1/mu0 + 1)) (sun slant in + vertical out)."""
    shape = (NZ, NY, NX)
    k_abs = 2.0e-4  # tau = 0.4 over the domain
    c0, s0 = _trace(jax.random.PRNGKey(1), jnp.full(shape, 1e-9, jnp.float32),
                    jnp.zeros(shape, jnp.float32), ppp=64)
    c1, s1 = _trace(jax.random.PRNGKey(2), jnp.full(shape, k_abs, jnp.float32),
                    jnp.zeros(shape, jnp.float32), ppp=64)
    tau = k_abs * NZ * DZ
    got = float(np.asarray(c1).sum() / np.asarray(c0).sum())
    expect = np.exp(-tau / MU0 - tau)
    assert abs(got - expect) / expect < 0.1, (got, expect)


def test_specular_water_surface():
    """Water (land_use=0) + direct beam: specular reflection - a nadir
    camera over flat water sees (almost) no sun glint unless sun is at
    zenith; Lambertian land sees diffuse radiance everywhere."""
    shape = (NZ, NY, NX)
    k = jnp.full(shape, 1e-9, jnp.float32)
    z = jnp.zeros(shape, jnp.float32)
    c_land, _ = _trace(jax.random.PRNGKey(3), k, z, albedo=0.2, land=1.0, ppp=32)
    c_water, _ = _trace(jax.random.PRNGKey(4), k, z, albedo=0.2, land=0.0, ppp=32)
    # Specular: mirror of nadir view direction is straight up, sun is at
    # 37 deg zenith -> no glint.
    assert np.asarray(c_water).sum() < 0.05 * np.asarray(c_land).sum()


def test_scattering_atmosphere_brightens_sky():
    """A Rayleigh-scattering layer adds path radiance for an upward-looking
    ray (rect camera pointing up sees scattered sun light)."""
    shape = (NZ, NY, NX)
    cam = rbw.Camera(cam_type=1, nx=4, ny=4, fov=40.0, pitch_deg=-90.0,
                     position=(2000.0, 2000.0, 100.0))
    k_s = 2e-4
    k_ext = jnp.full(shape, k_s, jnp.float32)
    ksg = jnp.full(shape, k_s, jnp.float32)  # pure scattering
    c_sky, _ = _trace(jax.random.PRNGKey(5), k_ext, ksg, albedo=0.0, ppp=64,
                      cam=cam)
    c_vac, _ = _trace(jax.random.PRNGKey(6), jnp.full(shape, 1e-9, jnp.float32),
                      jnp.zeros(shape, jnp.float32), albedo=0.0, ppp=64,
                      cam=cam)
    assert np.asarray(c_sky).sum() > 10 * max(np.asarray(c_vac).sum(), 1e-12)
    assert np.isfinite(np.asarray(c_sky)).all()


def test_fifo_respawn_matches_pool_statistically():
    """The fifo global-ray-queue respawn (forward tracer's measured-fastest
    mode, applied to the camera loop) must agree with the pool respawn to
    MC noise: same physics, different ray->lane assignment stream.  The
    pool is sized (32x32 px, 128 ppp = 131k rays > the 32k lane knee) so
    respawn actually fires in both modes."""
    shape = (NZ, NY, NX)
    k_ext = jnp.full(shape, 3e-4, jnp.float32)
    ksg = k_ext * 0.9
    cam = rbw.Camera(cam_type=2, nx=32, ny=32)
    outs = {}
    for mode in ("pool", "fifo"):
        zeros = jnp.zeros(shape, jnp.float32)
        count, shot = rbw.trace_rays_bw(
            jax.random.PRNGKey(0), cam, k_ext, ksg, zeros, zeros, zeros,
            zeros, *_bg(),
            jnp.full((NY, NX), 0.3, jnp.float32),
            jnp.ones((NY, NX), jnp.float32),
            (2, 2, 2), (DZ, DY, DX), jnp.asarray(SUN, jnp.float32), MU0,
            photons_per_pixel=128, respawn_mode=mode)
        per = np.asarray(count) / np.maximum(np.asarray(shot), 1)
        assert np.isfinite(per).all(), mode
        outs[mode] = per
    rel = abs(outs["fifo"].mean() - outs["pool"].mean()) \
        / max(outs["pool"].mean(), 1e-12)
    assert rel < 0.05, rel


def test_camera_models_produce_rays():
    """All three camera types produce unit-norm directions and valid pixels."""
    for cam_type in (0, 1, 2):
        cam = rbw.Camera(cam_type=cam_type, nx=4, ny=4, fov=90.0,
                         position=(1000.0, 1000.0, 500.0))
        pix, pos, direction = rbw._camera_rays(
            cam, jax.random.PRNGKey(0), 32, (4000.0, 4000.0, 2000.0), 4000.0,
            jnp.float32)
        n = np.asarray(jnp.linalg.norm(direction, axis=1))
        np.testing.assert_allclose(n, 1.0, atol=1e-5)
        assert np.asarray(pix).min() >= 0 and np.asarray(pix).max() < 16


def test_bg_column_modes_agree_when_homogeneous():
    """Reference-exact background ("first" column, Raytracer_bw.cu:200-238)
    equals the "mean" fallback when the upper atmosphere is horizontally
    homogeneous — and both render finite radiance."""
    import jax

    from rte_rrtmgp_tpu.data import synthetic
    from rte_rrtmgp_tpu.models import KDist
    from rte_rrtmgp_tpu.models.radiation_bw import RadiationSolverBW
    from rte_rrtmgp_tpu.models import raytracer_bw as rbw
    from rte_rrtmgp_tpu.cases.profiles import make_atmosphere
    from helpers import GASES

    kd = KDist.from_raw(synthetic.make_kdist_raw(False, gpt_per_band=1),
                        GASES, dtype=np.float32)
    ny = nx = 4
    nz, nlay = 6, 12
    atm = make_atmosphere(ny * nx, nlay, seed=9, perturb=False)  # homogeneous
    cam = rbw.Camera(cam_type=2, ny=ny, nx=nx, fov=80.0,
                     position=(0.0, 0.0, 0.0))
    z_lev = np.arange(nlay + 1) * 400.0
    common = dict(
        gas_concs=atm["gas_concs"], p_lay=atm["p_lay"], p_lev=atm["p_lev"],
        t_lay=atm["t_lay"], mu0=np.full(ny * nx, 0.8),
        azi=np.zeros(ny * nx), sfc_alb=np.full((ny * nx, kd.nbnd), 0.1),
        land_use_map=np.zeros(ny * nx), camera=cam,
        grid_cells=(nz, ny, nx), grid_d=(400.0, 500.0, 500.0),
        kn_grid=(2, 2, 2), z_lev=z_lev, photons_per_pixel=64,
        mode="broadband", key=jax.random.PRNGKey(3))
    solver = RadiationSolverBW(kd)
    out_first = solver.solve(bg_column="first", **common)
    out_mean = solver.solve(bg_column="mean", **common)
    a = np.asarray(out_first["radiance"])
    b = np.asarray(out_mean["radiance"])
    assert np.isfinite(a).all() and a.max() > 0
    assert np.isfinite(b).all() and b.max() > 0
    # The two modes compile to different programs, so MC paths diverge in
    # the last ulp; with a homogeneous upper atmosphere the PHYSICS is
    # identical — compare the domain means within MC noise.
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.06)


def test_spectral_lanes_matches_scan():
    """The vmap-merged spectral-lane mode must reproduce the sequential
    scan: per-step RNG streams are identical by construction, so the
    rendered radiance differs only by accumulation order."""
    import jax

    from rte_rrtmgp_tpu.data import synthetic
    from rte_rrtmgp_tpu.models import KDist
    from rte_rrtmgp_tpu.models.radiation_bw import RadiationSolverBW
    from rte_rrtmgp_tpu.models import raytracer_bw as rbw
    from rte_rrtmgp_tpu.cases.profiles import make_atmosphere
    from helpers import GASES

    kd = KDist.from_raw(synthetic.make_kdist_raw(False, gpt_per_band=1),
                        GASES, dtype=np.float32)
    ny = nx = 4
    nz, nlay = 6, 12
    atm = make_atmosphere(ny * nx, nlay, seed=11, perturb=True)
    atm["lwp"][:, 2:4] = 30.0  # some cloud so scattering paths differ
    cam = rbw.Camera(cam_type=2, ny=ny, nx=nx, fov=80.0,
                     position=(0.0, 0.0, 0.0))
    z_lev = np.arange(nlay + 1) * 400.0
    common = dict(
        gas_concs=atm["gas_concs"], p_lay=atm["p_lay"], p_lev=atm["p_lev"],
        t_lay=atm["t_lay"], mu0=np.full(ny * nx, 0.8),
        azi=np.zeros(ny * nx), sfc_alb=np.full((ny * nx, kd.nbnd), 0.1),
        land_use_map=np.zeros(ny * nx), camera=cam,
        grid_cells=(nz, ny, nx), grid_d=(400.0, 500.0, 500.0),
        kn_grid=(2, 2, 2), z_lev=z_lev, photons_per_pixel=32,
        lwp=atm["lwp"], iwp=atm["iwp"], rel=atm["rel"], dei=atm["dei"],
        mode="image", n_sub=2, key=jax.random.PRNGKey(5))
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "c.nc")
        synthetic.write_cloud_nc(p, synthetic.make_cloud_raw(False))
        from rte_rrtmgp_tpu.models import CloudLUT
        clut = CloudLUT.from_netcdf(p, dtype=np.float32)
    solver = RadiationSolverBW(kd, clut)
    out_scan = solver.solve(spectral_mode="scan", **common)
    out_lanes = solver.solve(spectral_mode="lanes", **common)
    a = np.asarray(out_scan["radiance"])
    b = np.asarray(out_lanes["radiance"])
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out_lanes["XYZ"]),
                               np.asarray(out_scan["XYZ"]),
                               rtol=1e-5, atol=1e-9)


def test_mie_phase_value_oracle():
    """The Mie NEE phase interpolator reproduces the analytic HG lobes the
    synthetic table was built from, and the table integrates to 1 over the
    sphere (the phase-normalization oracle)."""
    from rte_rrtmgp_tpu.data import synthetic
    from rte_rrtmgp_tpu.models.raytracer import _mie_phase_value
    from rte_rrtmgp_tpu.models.raytracer_bw import henyey_phase

    raw = synthetic.make_mie_raw(nbnd=2, n_re=20, n_ang=721)
    phase = jnp.asarray(raw["phase"][0], jnp.float32)       # (n_re, n_ang)
    pang = jnp.asarray(raw["phase_angle"], jnp.float32)
    g_of_re = raw["g_of_re"]

    # normalization: 2*pi * int p(theta) sin(theta) dtheta == 1 per r_eff
    integ = 2 * np.pi * np.trapezoid(
        raw["phase"][0] * np.sin(raw["phase_angle"])[None, :],
        raw["phase_angle"], axis=1)
    np.testing.assert_allclose(integ, 1.0, rtol=5e-3)

    # value parity vs the analytic lobe at on- and off-grid query points
    for r_eff, theta in [(2.5, 0.3), (10.0, 0.01), (13.7, 1.2),
                         (21.4, 2.9), (5.0, np.pi - 0.01)]:
        got = float(_mie_phase_value(
            pang, phase, jnp.float32(theta), jnp.float32(r_eff)))
        ir = min(max(int(r_eff - 2.5), 0), 18)
        rr = (r_eff - 2.5) % 1.0
        expect = ((1 - rr) * float(henyey_phase(g_of_re[ir], np.cos(theta)))
                  + rr * float(henyey_phase(g_of_re[ir + 1], np.cos(theta))))
        assert abs(got - expect) / expect < 2e-2, (r_eff, theta, got, expect)


def test_bw_mie_forward_brightening():
    """Reference Phase_kind::Mie parity check (raytracer_kernels_bw.cu:
    276-292, 714-727): rendering a scattering cloud while looking TOWARD
    the sun, the sharp Mie forward lobe must brighten the scene versus a
    broad Henyey-Greenstein (asy 0.3) — both in NEE phase value and in the
    sampled multiple-scatter paths."""
    from rte_rrtmgp_tpu.data import synthetic

    raw = synthetic.make_mie_raw(nbnd=2, n_re=20)
    mie_cdf = jnp.asarray(raw["phase_cdf"][0], jnp.float32)
    mie_ang = jnp.asarray(raw["phase_cdf_angle"][0], jnp.float32)
    mie_phase = jnp.asarray(raw["phase"][0], jnp.float32)
    mie_pang = jnp.asarray(raw["phase_angle"], jnp.float32)

    shape = (NZ, NY, NX)
    zeros = jnp.zeros(shape, jnp.float32)
    cloud = jnp.zeros(shape, jnp.float32).at[2].set(0.6e-3)   # one cloud layer
    k_ext = cloud + 1e-9
    asy_hg = jnp.full(shape, 0.3, jnp.float32)               # broad HG lobe
    r_eff = jnp.full(shape, 10.0, jnp.float32)               # Mie g ~ 0.79

    # Rect camera at the surface aimed exactly at the sun (36.9 deg zenith
    # in +x): every pixel's first-scatter NEE angle is near-forward.
    cam = rbw.Camera(cam_type=1, nx=NX, ny=NY, fov=20.0, pitch_deg=-53.13,
                     position=(NX * DX / 2, NY * DY / 2, 10.0))

    def render(mie):
        kw = dict(r_eff=r_eff, mie_cdf=mie_cdf, mie_ang=mie_ang,
                  mie_phase=mie_phase, mie_phase_ang=mie_pang) if mie else {}
        count, shot = rbw.trace_rays_bw(
            jax.random.PRNGKey(7), cam, k_ext, zeros, cloud, zeros,
            asy_hg, zeros, *_bg(),
            jnp.zeros((NY, NX), jnp.float32),
            jnp.full((NY, NX), 1.0, jnp.float32),
            (2, 2, 2), (DZ, DY, DX), jnp.asarray(SUN, jnp.float32), MU0,
            photons_per_pixel=64, **kw)
        return np.asarray(count) / np.maximum(np.asarray(shot), 1)

    hg = render(False)
    mie = render(True)
    assert np.isfinite(hg).all() and np.isfinite(mie).all()
    assert np.median(hg) > 0
    # Forward-peak brightening: the Mie lobe at ~0 deg is >10x the HG(0.3)
    # value.  Compare MEDIANS — the few pixels inside the sun disc carry an
    # identical (phase-independent) direct transmission term in both runs
    # that dominates the mean (measured ~8x median brightening here).
    assert np.median(mie) > 3.0 * np.median(hg), (
        np.median(mie), np.median(hg))


def test_nee_field_matches_walk():
    """The deterministic sun-transmission field (fast preview mode) agrees
    with the default reference-style stochastic walk within MC noise on a
    smooth-contrast cloud scene.  (On BINARY high-contrast decks the field
    mode's half-cell path discretization is a real, documented bias —
    see the nee_mode note in raytracer_bw.py — hence smooth clouds here.)"""
    rng = np.random.default_rng(11)
    k_gas = jnp.full((NZ, NY, NX), 2e-4, jnp.float32)
    cloud = jnp.asarray(0.4e-3 * (1.0 + np.sin(
        np.add.outer(np.arange(NZ) * 0.7,
                     np.add.outer(np.arange(NY) * 0.5,
                                  np.arange(NX) * 0.9)))), jnp.float32)
    k_ext = k_gas + cloud
    ksg = k_gas * 0.5
    ksc = cloud * 0.999
    zeros = jnp.zeros((NZ, NY, NX), jnp.float32)
    asy = jnp.full((NZ, NY, NX), 0.85, jnp.float32)
    cam = rbw.Camera(cam_type=2, nx=NX, ny=NY)
    outs = {}
    for mode in ("field", "walk"):
        count, shot = rbw.trace_rays_bw(
            jax.random.PRNGKey(5), cam, k_ext, ksg, ksc, zeros, asy, zeros,
            *_bg(), jnp.full((NY, NX), 0.25, jnp.float32),
            jnp.full((NY, NX), 1.0, jnp.float32),
            (2, 2, 2), (DZ, DY, DX), jnp.asarray(SUN, jnp.float32), MU0,
            photons_per_pixel=128, nee_mode=mode)
        outs[mode] = np.asarray(count) / np.maximum(np.asarray(shot), 1)
    a, b = outs["field"], outs["walk"]
    assert np.isfinite(a).all() and a.mean() > 0
    # Same estimator expectation; compare domain means within MC noise.
    np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.08)
