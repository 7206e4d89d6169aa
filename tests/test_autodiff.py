"""End-to-end differentiability — a capability the C++/CUDA reference
fundamentally lacks: gradients of fluxes w.r.t. atmospheric state flow
through gas optics (gathers included), the LW/SW solvers (scans), and the
flux reductions.  Checked against finite differences."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rte_rrtmgp_tpu.ops import gas_optics as gas_ops, rte_lw, rte_sw
from rte_rrtmgp_tpu.ops import fluxes as flux_ops
from helpers import small_kdist, small_atmos, atmos_inputs


@pytest.fixture(scope="module")
def lw_setup():
    kd = small_kdist(longwave=True)
    atm = small_atmos(ncol=3, nlay=10, seed=7)
    vmr, col_dry = atmos_inputs(kd, atm)
    return kd, atm, jnp.asarray(vmr), jnp.asarray(col_dry)


def _lw_olr(kd, atm, vmr, col_dry, t_sfc):
    """Outgoing longwave radiation as a function of surface temperature."""
    flip = lambda a: jnp.flip(jnp.asarray(a), axis=1)
    p_lay, t_lay = flip(atm["p_lay"]), flip(atm["t_lay"])
    p_lev, t_lev = flip(atm["p_lev"]), flip(atm["t_lev"])
    op, src = gas_ops.gas_optics_lw(
        kd, p_lay, p_lev, t_lay, t_lev, t_sfc, flip(vmr), flip(col_dry),
        sfc_lay=t_lay.shape[1] - 1)
    ncol, ngpt = src.sfc_src.shape
    emis = jnp.full((ncol, ngpt), 0.98, op.tau.dtype)
    inc = jnp.zeros((ncol, ngpt), op.tau.dtype)
    up, dn, _ = rte_lw.lw_solver_noscat(
        op.tau, src.lay_src, src.lev_src, emis, src.sfc_src, src.sfc_src_jac,
        inc, 1)
    return flux_ops.sum_broadband(up)[:, 0].sum()   # TOA upward


@pytest.mark.slow
def test_lw_gradient_wrt_tsfc_matches_fd(lw_setup):
    kd, atm, vmr, col_dry = lw_setup
    t_sfc = jnp.asarray(atm["t_sfc"])

    f = lambda ts: _lw_olr(kd, atm, vmr, col_dry, ts)
    g = jax.grad(f)(t_sfc)

    eps = 1e-3
    e0 = jnp.zeros_like(t_sfc).at[0].set(eps)
    fd = (f(t_sfc + e0) - f(t_sfc - e0)) / (2 * eps)
    assert np.isfinite(np.asarray(g)).all()
    # Warmer surface must emit more to space; gradient positive.
    assert float(g[0]) > 0
    np.testing.assert_allclose(float(g[0]), float(fd), rtol=5e-4)


@pytest.mark.slow
def test_sw_gradient_wrt_vmr_matches_fd(lw_setup):
    """d(surface SW flux)/d(scaling of an absorber column) via the SW
    two-stream path, vs central differences."""
    kd_sw = small_kdist(longwave=False)
    _, atm, vmr, col_dry = lw_setup
    flip = lambda a: jnp.flip(jnp.asarray(a), axis=1)
    p_lay, t_lay = flip(atm["p_lay"]), flip(atm["t_lay"])
    p_lev = flip(atm["p_lev"])
    mu0 = jnp.full((3,), 0.7)

    def sfc_dn(scale):
        op, toa = gas_ops.gas_optics_sw(
            kd_sw, p_lay, p_lev, t_lay, flip(vmr) * scale, flip(col_dry))
        ncol, ngpt = toa.shape
        alb = jnp.full((ncol, ngpt), 0.1, op.tau.dtype)
        up, dn, fdir = rte_sw.sw_solver_2stream(
            op.tau, op.ssa, op.g, mu0, alb, alb, toa)
        return flux_ops.sum_broadband(dn)[:, -1].sum()

    g = jax.grad(sfc_dn)(1.0)
    eps = 1e-4
    fd = (sfc_dn(1.0 + eps) - sfc_dn(1.0 - eps)) / (2 * eps)
    assert np.isfinite(float(g))
    # More absorber -> less shortwave reaches the surface.
    assert float(g) < 0
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)
