"""Shortwave two-stream + adding RTE solver in JAX.

Re-design of ``sw_source_2stream_kernel`` + ``sw_adding_kernel``
(``src_kernels_cuda/rte_solver_kernels.cu:196-286, 543-655``):

* the Meador-Weaver two-stream coefficients (with the Ukkonen clamping fix,
  `:589-592`) are one fused elementwise block over (ncol, nlay, ngpt),
* the direct-beam attenuation is a closed-form cumulative product
  (``exp(-cumsum(tau/mu0))`` is equivalent; we keep the cumprod of t_noscat
  to match the reference's floating-point semantics),
* the adding method's up-sweep (surface albedo accumulation) and down-sweep
  are ``lax.scan`` over layers with (ncol, ngpt) carries.

Canonical orientation: top of atmosphere at layer index 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import config


def two_stream_coeffs(tau, ssa, g, mu0):
    """Meador-Weaver two-stream reflectance/transmittance
    (sw_2stream_function, rte_solver_kernels.cu:543-592)."""
    dtype = tau.dtype
    tmin = config.eps(dtype)
    kmin = config.k_min(dtype)
    mu0b = mu0[:, None, None]

    gamma1 = (8.0 - ssa * (5.0 + 3.0 * g)) * 0.25
    gamma2 = 3.0 * (ssa * (1.0 - g)) * 0.25
    gamma3 = (2.0 - 3.0 * mu0b * g) * 0.25
    gamma4 = 1.0 - gamma3
    alpha1 = gamma1 * gamma4 + gamma2 * gamma3
    alpha2 = gamma1 * gamma3 + gamma2 * gamma4

    k = jnp.sqrt(jnp.maximum((gamma1 - gamma2) * (gamma1 + gamma2), kmin))
    exp_mkt = jnp.exp(-tau * k)
    exp_m2kt = exp_mkt * exp_mkt
    rt_term = 1.0 / (k * (1.0 + exp_m2kt) + gamma1 * (1.0 - exp_m2kt))
    r_dif = rt_term * gamma2 * (1.0 - exp_m2kt)
    t_dif = rt_term * 2.0 * k * exp_mkt
    t_noscat = jnp.exp(-tau / mu0b)

    k_mu = k * mu0b
    k_g3 = k * gamma3
    k_g4 = k * gamma4
    fact = jnp.where(jnp.abs(1.0 - k_mu * k_mu) > tmin, 1.0 - k_mu * k_mu, tmin)
    rt2 = ssa * rt_term / fact
    r_dir = rt2 * ((1.0 - k_mu) * (alpha2 + k_g3)
                   - (1.0 + k_mu) * (alpha2 - k_g3) * exp_m2kt
                   - 2.0 * (k_g3 - alpha2 * k_mu) * exp_mkt * t_noscat)
    t_dir = -rt2 * ((1.0 + k_mu) * (alpha1 + k_g4) * t_noscat
                    - (1.0 - k_mu) * (alpha1 - k_g4) * exp_m2kt * t_noscat
                    - 2.0 * (k_g4 + alpha1 * k_mu) * exp_mkt)
    # Ukkonen clamp (energy conservation in single precision).
    r_dir = jnp.maximum(tmin, jnp.minimum(r_dir, 1.0 - t_noscat))
    t_dir = jnp.maximum(tmin, jnp.minimum(t_dir, 1.0 - t_noscat - r_dir))
    return r_dif, t_dif, r_dir, t_dir, t_noscat


def sw_solver_2stream(tau, ssa, g, mu0, sfc_alb_dir, sfc_alb_dif,
                      inc_flux_dir, inc_flux_dif=None):
    """Two-stream solve with adding.  (ncol, nlay, ngpt) optics, top at 0.

    mu0: (ncol,); sfc_alb_* and inc_flux_*: (ncol, ngpt).
    Returns flux_up, flux_dn (diffuse+direct), flux_dir: (ncol, nlay+1, ngpt).
    """
    ncol, nlay, ngpt = tau.shape
    r_dif, t_dif, r_dir, t_dir, t_noscat = two_stream_coeffs(tau, ssa, g, mu0)

    # Direct beam: flux_dir[0] = inc*mu0; flux_dir[l+1] = t_noscat[l]*flux_dir[l].
    top_dir = inc_flux_dir * mu0[:, None]
    cum = jnp.cumprod(t_noscat, axis=1)
    flux_dir = jnp.concatenate(
        [top_dir[:, None], top_dir[:, None] * cum], axis=1)

    src_up = r_dir * flux_dir[:, :-1]
    src_dn = t_dir * flux_dir[:, :-1]
    src_sfc = flux_dir[:, -1] * sfc_alb_dir

    # Up-sweep: albedo/src accumulation from the surface
    # (sw_adding_kernel :216-227).
    def up_step(carry, x):
        alb_below, src_below = carry
        rd, td, su, sd = x
        denom = 1.0 / (1.0 - rd * alb_below)
        alb = rd + td * td * alb_below * denom
        src = su + td * denom * (src_below + alb_below * sd)
        return (alb, src), (alb, src, denom)

    (_, _), (alb_rest, src_rest, denom) = jax.lax.scan(
        up_step, (sfc_alb_dif, src_sfc),
        (jnp.moveaxis(r_dif, 1, 0), jnp.moveaxis(t_dif, 1, 0),
         jnp.moveaxis(src_up, 1, 0), jnp.moveaxis(src_dn, 1, 0)),
        reverse=True)
    albedo = jnp.concatenate(
        [jnp.moveaxis(alb_rest, 0, 1), sfc_alb_dif[:, None]], axis=1)
    src = jnp.concatenate(
        [jnp.moveaxis(src_rest, 0, 1), src_sfc[:, None]], axis=1)
    denom = jnp.moveaxis(denom, 0, 1)  # (ncol, nlay, ngpt)

    # Down-sweep (sw_adding_kernel :231-243).
    dn_top = (inc_flux_dif if inc_flux_dif is not None
              else jnp.zeros_like(top_dir))

    def dn_step(carry, x):
        td, rd_src, sd, dnm = x
        dn = (td * carry + rd_src + sd) * dnm
        return dn, dn

    _, dn_rest = jax.lax.scan(
        dn_step, dn_top,
        (jnp.moveaxis(t_dif, 1, 0),
         jnp.moveaxis(r_dif * src[:, 1:], 1, 0),
         jnp.moveaxis(src_dn, 1, 0),
         jnp.moveaxis(denom, 1, 0)))
    flux_dn = jnp.concatenate(
        [dn_top[:, None], jnp.moveaxis(dn_rest, 0, 1)], axis=1)

    flux_up = flux_dn * albedo + src
    flux_dn = flux_dn + flux_dir
    return flux_up, flux_dn, flux_dir


def sw_solver_2stream_broadband(tau, ssa, g, mu0, sfc_alb_dir, sfc_alb_dif,
                                inc_flux_dir, inc_flux_dif=None):
    """As :func:`sw_solver_2stream` but returning g-point-summed broadband
    fluxes (ncol, nlay+1).  On TPU/f32 this dispatches to the fused Pallas
    two-stream+adding kernel (coefficients, sweeps and the spectral
    reduction in one pass, no (ncol, nlev, ngpt) planes); otherwise it
    reduces the XLA solver's output."""
    from .pallas import solver_kernels as sk

    nlev = tau.shape[1] + 1
    if sk.solvers_available(tau.dtype, nlev):
        G = tau.shape[2]
        gpad = (-G) % 128
        if gpad:
            z3 = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, gpad)))
            z2 = lambda a: jnp.pad(a, ((0, 0), (0, gpad)))
            tau, ssa, g = z3(tau), z3(ssa), z3(g)
            sfc_alb_dir, sfc_alb_dif = z2(sfc_alb_dir), z2(sfc_alb_dif)
            inc_flux_dir = z2(inc_flux_dir)
            if inc_flux_dif is not None:
                inc_flux_dif = z2(inc_flux_dif)
        # 128-g-point sub-sweeps: the kernel flattens nlay*G onto lanes and
        # G > 128 exceeds its scoped-VMEM budget (broadband = sum over g).
        fu = fd = fr = 0.0
        for gs in range(0, tau.shape[2], 128):
            sl3 = lambda a: jax.lax.slice_in_dim(a, gs, gs + 128, axis=2)
            sl2 = lambda a: jax.lax.slice_in_dim(a, gs, gs + 128, axis=1)
            u, d, r = sk.sw_2stream_broadband(
                sl3(tau), sl3(ssa), sl3(g), mu0, sl2(sfc_alb_dir),
                sl2(sfc_alb_dif), sl2(inc_flux_dir),
                None if inc_flux_dif is None else sl2(inc_flux_dif))
            fu, fd, fr = fu + u, fd + d, fr + r
        return fu, fd, fr
    up, dn, fdir = sw_solver_2stream(tau, ssa, g, mu0, sfc_alb_dir,
                                     sfc_alb_dif, inc_flux_dir, inc_flux_dif)
    return up.sum(-1), dn.sum(-1), fdir.sum(-1)


def sw_solver_2stream_broadband_lm(tau_lm, ssa_lm, g_lm, mu0, sfc_alb_dir,
                                   sfc_alb_dif, inc_flux_dir,
                                   inc_flux_dif=None, *, ncol: int):
    """Broadband SW solve on the LAYER-MAJOR interchange: tau/ssa/g
    (nlay*ncol, G) with cell (c, l) at row l*ncol + c.  Dispatches to the
    three-pass layer-grid Pallas kernels (ops/pallas/solver_layergrid.py)."""
    from .pallas import solver_layergrid as slg

    return slg.sw_2stream_broadband_lm(
        tau_lm, ssa_lm, g_lm, mu0, sfc_alb_dir, sfc_alb_dif,
        inc_flux_dir, inc_flux_dif, ncol=ncol)
