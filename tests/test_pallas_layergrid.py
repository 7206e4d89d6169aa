"""Layer-grid solver kernels (layer-major interchange) vs the XLA solvers.

Interpret-mode on CPU, float32, same methodology as test_pallas_solvers.
The layer-major planes are built by transposing the (ncol, nlay, ngpt)
fixtures to (nlay*ncol, ngpt) with cell (c, l) at row l*ncol + c.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from rte_rrtmgp_tpu.ops import rte_lw, rte_sw
from rte_rrtmgp_tpu.ops.pallas import solver_layergrid as slg

from test_pallas_solvers import _lw_inputs, _sw_inputs


def _lm(a):
    """(ncol, nl, G) -> (nl*ncol, G) layer-major."""
    return jnp.transpose(a, (1, 0, 2)).reshape(-1, a.shape[2])


@pytest.mark.parametrize("ncol,nlay,ngpt", [(16, 9, 128), (11, 12, 96)])
def test_lw_layergrid_matches_xla(ncol, nlay, ngpt):
    tau, lay, lev, emis, ssrc, sjac, inc = _lw_inputs(
        ncol=ncol, nlay=nlay, ngpt=ngpt)
    up, dn, jac = rte_lw.lw_solver_noscat(tau, lay, lev, emis, ssrc, sjac,
                                          inc, n_gauss_angles=1)
    with pltpu.force_tpu_interpret_mode():
        fu, fd, fj = slg.lw_sweep_broadband_lm(
            _lm(tau), _lm(lay), _lm(lev), emis, ssrc, sjac, inc,
            ncol=ncol, D=float(rte_lw.GAUSS_DS[0, 0]),
            w=float(rte_lw.GAUSS_WTS[0, 0]), block=8)
    np.testing.assert_allclose(fu, np.asarray(up).sum(-1), rtol=2e-5,
                               atol=1e-3)
    np.testing.assert_allclose(fd, np.asarray(dn).sum(-1), rtol=2e-5,
                               atol=1e-3)
    np.testing.assert_allclose(fj, np.asarray(jac).sum(-1), rtol=2e-5,
                               atol=1e-3)


def test_lw_layergrid_multi_block():
    """ncol spanning several column blocks exercises the carry reset and
    the revisited boundary-output blocks per block."""
    ncol, nlay, ngpt = 40, 7, 128
    tau, lay, lev, emis, ssrc, sjac, inc = _lw_inputs(
        ncol=ncol, nlay=nlay, ngpt=ngpt, seed=3)
    up, dn, jac = rte_lw.lw_solver_noscat(tau, lay, lev, emis, ssrc, sjac,
                                          inc, n_gauss_angles=1)
    with pltpu.force_tpu_interpret_mode():
        fu, fd, fj = slg.lw_sweep_broadband_lm(
            _lm(tau), _lm(lay), _lm(lev), emis, ssrc, sjac, inc,
            ncol=ncol, D=float(rte_lw.GAUSS_DS[0, 0]),
            w=float(rte_lw.GAUSS_WTS[0, 0]), block=8)
    np.testing.assert_allclose(fu, np.asarray(up).sum(-1), rtol=2e-5,
                               atol=1e-3)
    np.testing.assert_allclose(fd, np.asarray(dn).sum(-1), rtol=2e-5,
                               atol=1e-3)
    np.testing.assert_allclose(fj, np.asarray(jac).sum(-1), rtol=2e-5,
                               atol=1e-3)


def test_sw_layergrid_matches_xla():
    tau, ssa, g, mu0, adir, adif, inc = _sw_inputs(ncol=16, nlay=9)
    up, dn, fdir = rte_sw.sw_solver_2stream(tau, ssa, g, mu0, adir, adif,
                                            inc)
    with pltpu.force_tpu_interpret_mode():
        ub, db, fb = slg.sw_2stream_broadband_lm(
            _lm(tau), _lm(ssa), _lm(g), mu0, adir, adif, inc,
            ncol=16, block=8)
    np.testing.assert_allclose(ub, np.asarray(up).sum(-1), rtol=3e-5,
                               atol=1e-2)
    np.testing.assert_allclose(db, np.asarray(dn).sum(-1), rtol=3e-5,
                               atol=1e-2)
    np.testing.assert_allclose(fb, np.asarray(fdir).sum(-1), rtol=3e-5,
                               atol=1e-2)


def test_sw_layergrid_diffuse_inc_and_padding():
    tau, ssa, g, mu0, adir, adif, inc = _sw_inputs(ncol=13, nlay=11, seed=7)
    inc_dif = 0.3 * inc
    up, dn, fdir = rte_sw.sw_solver_2stream(tau, ssa, g, mu0, adir, adif,
                                            inc, inc_dif)
    with pltpu.force_tpu_interpret_mode():
        ub, db, fb = slg.sw_2stream_broadband_lm(
            _lm(tau), _lm(ssa), _lm(g), mu0, adir, adif, inc,
            inc_flux_dif=inc_dif, ncol=13, block=8)
    np.testing.assert_allclose(ub, np.asarray(up).sum(-1), rtol=3e-5,
                               atol=1e-2)
    np.testing.assert_allclose(db, np.asarray(dn).sum(-1), rtol=3e-5,
                               atol=1e-2)
    np.testing.assert_allclose(fb, np.asarray(fdir).sum(-1), rtol=3e-5,
                               atol=1e-2)
