"""RTE solvers: JAX vs NumPy oracle + physics invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_tpu.ops import reference as ref
from rte_rrtmgp_tpu.ops import rte_lw, rte_sw

NCOL, NLAY, NGPT = 4, 12, 8
EPS64 = np.finfo(np.float64).eps


def _lw_inputs(seed=0):
    rng = np.random.default_rng(seed)
    tau = 10.0 ** rng.uniform(-4, 0.7, (NCOL, NLAY, NGPT))
    lay_src = rng.uniform(0.0, 30.0, (NCOL, NLAY, NGPT))
    lev_src = rng.uniform(0.0, 30.0, (NCOL, NLAY + 1, NGPT))
    sfc_emis = rng.uniform(0.85, 1.0, (NCOL, NGPT))
    sfc_src = rng.uniform(10.0, 40.0, (NCOL, NGPT))
    sfc_src_jac = rng.uniform(0.0, 1.0, (NCOL, NGPT))
    inc_flux = rng.uniform(0.0, 5.0, (NCOL, NGPT))
    return tau, lay_src, lev_src, sfc_emis, sfc_src, sfc_src_jac, inc_flux


def _sw_inputs(seed=0):
    rng = np.random.default_rng(seed)
    tau = 10.0 ** rng.uniform(-4, 0.8, (NCOL, NLAY, NGPT))
    ssa = rng.uniform(0.0, 1.0, (NCOL, NLAY, NGPT))
    g = rng.uniform(0.0, 0.9, (NCOL, NLAY, NGPT))
    mu0 = rng.uniform(0.15, 1.0, NCOL)
    alb_dir = rng.uniform(0.02, 0.4, (NCOL, NGPT))
    alb_dif = rng.uniform(0.02, 0.4, (NCOL, NGPT))
    inc_dir = rng.uniform(100.0, 400.0, (NCOL, NGPT))
    return tau, ssa, g, mu0, alb_dir, alb_dif, inc_dir


@pytest.mark.parametrize("n_ang", [1, 2, 3])
def test_lw_matches_oracle(n_ang):
    args = _lw_inputs()
    up_o, dn_o, jac_o = ref.lw_solver_noscat(*args, n_gauss_angles=n_ang, eps=EPS64)
    up_j, dn_j, jac_j = rte_lw.lw_solver_noscat(
        *map(jnp.asarray, args), n_gauss_angles=n_ang)
    np.testing.assert_allclose(np.asarray(up_j), up_o, rtol=1e-11)
    np.testing.assert_allclose(np.asarray(dn_j), dn_o, rtol=1e-11)
    np.testing.assert_allclose(np.asarray(jac_j), jac_o, rtol=1e-11)


def test_lw_isothermal_blackbody():
    """Optically thick isothermal atmosphere with emis=1: fluxes everywhere
    equal pi*B (blackbody equilibrium)."""
    B = 25.0
    tau = np.full((NCOL, NLAY, NGPT), 50.0)
    lay_src = np.full((NCOL, NLAY, NGPT), B)
    lev_src = np.full((NCOL, NLAY + 1, NGPT), B)
    sfc_emis = np.ones((NCOL, NGPT))
    sfc_src = np.full((NCOL, NGPT), B)
    zeros = np.zeros((NCOL, NGPT))
    up, dn, _ = rte_lw.lw_solver_noscat(
        *map(jnp.asarray, (tau, lay_src, lev_src, sfc_emis, sfc_src, zeros, zeros)))
    up = np.asarray(up)
    # Away from the top boundary the field is the blackbody flux pi*B.
    np.testing.assert_allclose(up[:, 1:], np.pi * B, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(dn)[:, -1], np.pi * B, rtol=1e-10)


def test_lw_transparent_limit():
    """tau -> 0: downward flux = inc flux, upward = emitted surface flux."""
    tau = np.full((NCOL, NLAY, NGPT), 1e-12)
    lay_src = np.random.default_rng(0).uniform(0, 30, (NCOL, NLAY, NGPT))
    lev_src = np.random.default_rng(1).uniform(0, 30, (NCOL, NLAY + 1, NGPT))
    sfc_emis = np.ones((NCOL, NGPT))
    sfc_src = np.full((NCOL, NGPT), 20.0)
    zeros = np.zeros((NCOL, NGPT))
    up, dn, _ = rte_lw.lw_solver_noscat(
        *map(jnp.asarray, (tau, lay_src, lev_src, sfc_emis, sfc_src, zeros, zeros)))
    np.testing.assert_allclose(np.asarray(dn), 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(up), np.pi * 20.0, rtol=1e-8)


def test_sw_matches_oracle():
    tau, ssa, g, mu0, a_dir, a_dif, inc = _sw_inputs()
    up_o, dn_o, dir_o = ref.sw_solver_2stream(
        tau, ssa, g, mu0, a_dir, a_dif, inc, None,
        k_min_val=1e-12, tmin=EPS64)
    up_j, dn_j, dir_j = rte_sw.sw_solver_2stream(
        *map(jnp.asarray, (tau, ssa, g, mu0, a_dir, a_dif, inc)))
    np.testing.assert_allclose(np.asarray(dir_j), dir_o, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(up_j), up_o, rtol=1e-11)
    np.testing.assert_allclose(np.asarray(dn_j), dn_o, rtol=1e-11)


def test_sw_energy_conservation_conservative_scattering():
    """ssa=1 (no absorption): net flux through top equals net through bottom."""
    rng = np.random.default_rng(3)
    tau = 10.0 ** rng.uniform(-3, 0.5, (NCOL, NLAY, NGPT))
    ssa = np.ones_like(tau)
    g = rng.uniform(0.0, 0.8, (NCOL, NLAY, NGPT))
    mu0 = rng.uniform(0.3, 1.0, NCOL)
    alb = np.zeros((NCOL, NGPT))
    inc = np.full((NCOL, NGPT), 100.0)
    up, dn, fdir = rte_sw.sw_solver_2stream(
        *map(jnp.asarray, (tau, ssa, g, mu0, alb, alb, inc)))
    up, dn = np.asarray(up), np.asarray(dn)
    net_top = dn[:, 0] - up[:, 0]
    net_bot = dn[:, -1] - up[:, -1]
    # The k_min floor (config.k_min) injects ~1e-9 artificial absorption at
    # ssa == 1 exactly; that is the reference's behavior too.
    np.testing.assert_allclose(net_top, net_bot, rtol=1e-6)


def test_sw_no_scattering_beer_lambert():
    """ssa=0: direct beam follows Beer-Lambert; no diffuse flux develops."""
    rng = np.random.default_rng(4)
    tau = 10.0 ** rng.uniform(-3, 0.3, (NCOL, NLAY, NGPT))
    ssa = np.zeros_like(tau)
    g = np.zeros_like(tau)
    mu0 = rng.uniform(0.3, 1.0, NCOL)
    alb = np.zeros((NCOL, NGPT))
    inc = np.full((NCOL, NGPT), 100.0)
    up, dn, fdir = rte_sw.sw_solver_2stream(
        *map(jnp.asarray, (tau, ssa, g, mu0, alb, alb, inc)))
    fdir = np.asarray(fdir)
    expect = (inc * mu0[:, None])[:, None, :] * np.exp(
        -np.cumsum(tau, axis=1) / mu0[:, None, None])
    np.testing.assert_allclose(fdir[:, 1:], expect, rtol=1e-10)
    assert np.asarray(up).max() < 1e-8
    np.testing.assert_allclose(np.asarray(dn), fdir, atol=1e-8)


def test_sw_fluxes_nonnegative_and_bounded():
    tau, ssa, g, mu0, a_dir, a_dif, inc = _sw_inputs(7)
    up, dn, fdir = rte_sw.sw_solver_2stream(
        *map(jnp.asarray, (tau, ssa, g, mu0, a_dir, a_dif, inc)))
    toa_in = inc * mu0[:, None]
    assert np.asarray(up).min() >= 0
    assert np.asarray(dn).min() >= 0
    # No level's downward flux can exceed the TOA input (no sources in SW).
    assert np.all(np.asarray(dn) <= toa_in[:, None, :] * (1 + 1e-12))


@pytest.mark.slow
def test_solvers_jit_and_grad():
    """The solvers are jittable and differentiable (the reference has no
    adjoint at all — AD through the scan is a new capability)."""
    tau, ssa, g, mu0, a_dir, a_dif, inc = _sw_inputs(9)

    @jax.jit
    def loss(t):
        up, dn, _ = rte_sw.sw_solver_2stream(
            t, jnp.asarray(ssa), jnp.asarray(g), jnp.asarray(mu0),
            jnp.asarray(a_dir), jnp.asarray(a_dif), jnp.asarray(inc))
        return jnp.sum(up[:, 0])

    gr = jax.grad(loss)(jnp.asarray(tau))
    assert np.isfinite(np.asarray(gr)).all()

    args = _lw_inputs(11)

    @jax.jit
    def loss_lw(t):
        up, dn, _ = rte_lw.lw_solver_noscat(t, *map(jnp.asarray, args[1:]))
        return jnp.sum(up[:, 0])

    gl = jax.grad(loss_lw)(jnp.asarray(args[0]))
    assert np.isfinite(np.asarray(gl)).all()
