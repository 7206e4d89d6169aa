"""Fused Pallas solver kernels vs the XLA reference solvers.

Runs the kernels in interpreter mode on CPU (tests never see real TPU) and
checks the broadband-reduced fluxes against the g-point-summed output of
the plain XLA solvers at float32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from rte_rrtmgp_tpu.ops import rte_lw, rte_sw
from rte_rrtmgp_tpu.ops.pallas import solver_kernels as sk


def _lw_inputs(ncol=12, nlay=9, ngpt=128, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: rng.uniform(0.01, 1.0, s).astype(np.float32)
    tau = (rng.uniform(0.0, 2.0, (ncol, nlay, ngpt)) ** 2).astype(np.float32)
    tau[0, 0, :8] = 0.0          # exercise the small-tau branch
    lay = 20.0 * f(ncol, nlay, ngpt)
    lev = 20.0 * f(ncol, nlay + 1, ngpt)
    emis = 0.9 + 0.1 * f(ncol, ngpt)
    ssrc = 25.0 * f(ncol, ngpt)
    sjac = 0.4 * f(ncol, ngpt)
    inc = 0.5 * f(ncol, ngpt)
    return tuple(map(jnp.asarray, (tau, lay, lev, emis, ssrc, sjac, inc)))


def _sw_inputs(ncol=12, nlay=9, ngpt=128, seed=1):
    rng = np.random.default_rng(seed)
    f = lambda *s: rng.uniform(0.01, 1.0, s).astype(np.float32)
    tau = (rng.uniform(0.0, 1.5, (ncol, nlay, ngpt)) ** 2 + 1e-4).astype(np.float32)
    ssa = rng.uniform(0.05, 0.999, (ncol, nlay, ngpt)).astype(np.float32)
    g = rng.uniform(0.0, 0.85, (ncol, nlay, ngpt)).astype(np.float32)
    mu0 = rng.uniform(0.2, 1.0, (ncol,)).astype(np.float32)
    alb_dir = 0.06 + 0.2 * f(ncol, ngpt)
    alb_dif = 0.06 + 0.2 * f(ncol, ngpt)
    inc = 5.0 * f(ncol, ngpt)
    return tuple(map(jnp.asarray, (tau, ssa, g, mu0, alb_dir, alb_dif, inc)))


@pytest.mark.parametrize("n_ang", [1, 2])
def test_lw_sweep_matches_xla(n_ang):
    tau, lay, lev, emis, ssrc, sjac, inc = _lw_inputs()
    up, dn, jac = rte_lw.lw_solver_noscat(tau, lay, lev, emis, ssrc, sjac,
                                          inc, n_gauss_angles=n_ang)
    with pltpu.force_tpu_interpret_mode():
        fu = fd = fj = 0.0
        for imu in range(n_ang):
            u, d, j = sk.lw_sweep_broadband(
                tau, lay, lev, emis, ssrc, sjac, inc,
                D=float(rte_lw.GAUSS_DS[n_ang - 1, imu]),
                w=float(rte_lw.GAUSS_WTS[n_ang - 1, imu]), block=8)
            fu, fd, fj = fu + u, fd + d, fj + j
    np.testing.assert_allclose(fu, np.asarray(up).sum(-1), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(fd, np.asarray(dn).sum(-1), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(fj, np.asarray(jac).sum(-1), rtol=2e-5, atol=1e-3)


def test_lw_sweep_col_and_gpt_padding():
    """ncol not a block multiple and ngpt not a lane multiple both pad with
    exact zero contribution."""
    tau, lay, lev, emis, ssrc, sjac, inc = _lw_inputs(ncol=11, ngpt=96)
    up, dn, jac = rte_lw.lw_solver_noscat(tau, lay, lev, emis, ssrc, sjac, inc)
    gpad = 32
    z3 = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, gpad)))
    z2 = lambda a: jnp.pad(a, ((0, 0), (0, gpad)))
    with pltpu.force_tpu_interpret_mode():
        fu, fd, fj = sk.lw_sweep_broadband(
            z3(tau), z3(lay), z3(lev), z2(emis), z2(ssrc), z2(sjac), z2(inc),
            D=float(rte_lw.GAUSS_DS[0, 0]), w=float(rte_lw.GAUSS_WTS[0, 0]),
            block=8)
    np.testing.assert_allclose(fu, np.asarray(up).sum(-1), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(fd, np.asarray(dn).sum(-1), rtol=2e-5, atol=1e-3)


def test_sw_2stream_matches_xla():
    tau, ssa, g, mu0, adir, adif, inc = _sw_inputs()
    up, dn, fdir = rte_sw.sw_solver_2stream(tau, ssa, g, mu0, adir, adif, inc)
    with pltpu.force_tpu_interpret_mode():
        ub, db, fb = sk.sw_2stream_broadband(tau, ssa, g, mu0, adir, adif,
                                             inc, block=8)
    np.testing.assert_allclose(ub, np.asarray(up).sum(-1), rtol=3e-5, atol=1e-2)
    np.testing.assert_allclose(db, np.asarray(dn).sum(-1), rtol=3e-5, atol=1e-2)
    np.testing.assert_allclose(fb, np.asarray(fdir).sum(-1), rtol=3e-5, atol=1e-2)


@pytest.mark.slow
def test_sw_2stream_with_diffuse_inc_and_padding():
    tau, ssa, g, mu0, adir, adif, inc = _sw_inputs(ncol=13, ngpt=96)
    inc_dif = 0.3 * inc
    up, dn, fdir = rte_sw.sw_solver_2stream(tau, ssa, g, mu0, adir, adif,
                                            inc, inc_dif)
    gpad = 32
    z3 = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, gpad)))
    z2 = lambda a: jnp.pad(a, ((0, 0), (0, gpad)))
    with pltpu.force_tpu_interpret_mode():
        ub, db, fb = sk.sw_2stream_broadband(
            z3(tau), z3(ssa), z3(g), mu0, z2(adir), z2(adif), z2(inc),
            z2(inc_dif), block=8)
    np.testing.assert_allclose(ub, np.asarray(up).sum(-1), rtol=3e-5, atol=1e-2)
    np.testing.assert_allclose(db, np.asarray(dn).sum(-1), rtol=3e-5, atol=1e-2)
    np.testing.assert_allclose(fb, np.asarray(fdir).sum(-1), rtol=3e-5, atol=1e-2)


@pytest.mark.slow
def test_lw_deep_grid_multi_tile():
    """nlev > 128 (the reference's 256-layer RCEMIP regime): the flux-level
    output tile grows to a second 128-lane tile and the column block
    auto-shrinks to fit VMEM — no more fallback to the XLA path."""
    tau, lay, lev, emis, ssrc, sjac, inc = _lw_inputs(ncol=8, nlay=140)
    up, dn, jac = rte_lw.lw_solver_noscat(tau, lay, lev, emis, ssrc, sjac, inc)
    with pltpu.force_tpu_interpret_mode():
        fu, fd, fj = sk.lw_sweep_broadband(
            tau, lay, lev, emis, ssrc, sjac, inc,
            D=float(rte_lw.GAUSS_DS[0, 0]), w=float(rte_lw.GAUSS_WTS[0, 0]),
            block=8)
    np.testing.assert_allclose(fu, np.asarray(up).sum(-1), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(fd, np.asarray(dn).sum(-1), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(fj, np.asarray(jac).sum(-1), rtol=2e-5, atol=1e-3)


@pytest.mark.slow
def test_sw_deep_grid_multi_tile():
    tau, ssa, g, mu0, adir, adif, inc = _sw_inputs(ncol=8, nlay=140)
    up, dn, fdir = rte_sw.sw_solver_2stream(tau, ssa, g, mu0, adir, adif, inc)
    with pltpu.force_tpu_interpret_mode():
        ub, db, fb = sk.sw_2stream_broadband(tau, ssa, g, mu0, adir, adif,
                                             inc, block=8)
    np.testing.assert_allclose(ub, np.asarray(up).sum(-1), rtol=3e-5, atol=1e-2)
    np.testing.assert_allclose(db, np.asarray(dn).sum(-1), rtol=3e-5, atol=1e-2)
    np.testing.assert_allclose(fb, np.asarray(fdir).sum(-1), rtol=3e-5, atol=1e-2)


def test_fit_block_respects_vmem_budget():
    """At the RCEMIP shape (nlay=256, G=128) the tuned block must shrink so
    the working set stays under the scoped-VMEM budget; shallow grids keep
    the tuned block unchanged."""
    G, nlay, nlev = 128, 256, 257
    lvlp = sk._lvl_tile(nlev)
    assert lvlp == 384
    per_col = (7 * nlay * G + 2 * nlev * G + 5 * G + 3 * lvlp) * 4
    b = sk._fit_block(32, per_col)
    assert b * per_col <= sk.VMEM_BUDGET and b >= 8
    # Shallow grid: tuned block survives.
    per_col_shallow = (7 * 72 * G + 2 * 73 * G + 5 * G + 3 * 128) * 4
    assert sk._fit_block(32, per_col_shallow) == 32


@pytest.mark.slow
def test_broadband_wrappers_subchunk_wide_spectra(monkeypatch):
    """G > 128 spectral chunks run as 128-g-point sub-sweeps inside the
    broadband wrappers (the kernel's scoped-VMEM budget caps nlay*G on
    lanes); sub-chunked Pallas == g-point-summed XLA."""
    monkeypatch.setattr(sk, "solvers_available", lambda dtype, nlev: True)

    tau, lay, lev, emis, ssrc, sjac, inc = _lw_inputs(ncol=6, ngpt=256)
    up, dn, jac = rte_lw.lw_solver_noscat(tau, lay, lev, emis, ssrc, sjac, inc)
    with pltpu.force_tpu_interpret_mode():
        fu, fd, fj = rte_lw.lw_solver_noscat_broadband(
            tau, lay, lev, emis, ssrc, sjac, inc)
    np.testing.assert_allclose(fu, np.asarray(up).sum(-1), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(fd, np.asarray(dn).sum(-1), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(fj, np.asarray(jac).sum(-1), rtol=2e-5, atol=1e-3)

    tau, ssa, g, mu0, adir, adif, inc = _sw_inputs(ncol=6, ngpt=192)
    up, dn, fdir = rte_sw.sw_solver_2stream(tau, ssa, g, mu0, adir, adif, inc)
    with pltpu.force_tpu_interpret_mode():
        ub, db, fb = rte_sw.sw_solver_2stream_broadband(
            tau, ssa, g, mu0, adir, adif, inc)
    np.testing.assert_allclose(ub, np.asarray(up).sum(-1), rtol=3e-5, atol=1e-2)
    np.testing.assert_allclose(db, np.asarray(dn).sum(-1), rtol=3e-5, atol=1e-2)
    np.testing.assert_allclose(fb, np.asarray(fdir).sum(-1), rtol=3e-5, atol=1e-2)
