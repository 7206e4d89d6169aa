"""Longwave no-scattering RTE solver (Gauss-quadrature) in JAX.

Re-design of the reference's three-step CUDA pipeline
(``src_kernels_cuda/rte_solver_kernels.cu:97-193`` +
``lw_transport_noscat_kernel`` `:35-94`):

* step 1 (per-cell optical prep + linear-in-tau sources) is elementwise and
  fuses into one XLA kernel over (ncol, nlay, ngpt),
* the sequential down/up sweeps become ``lax.scan`` over the layer axis with
  an (ncol, ngpt) carry — the vertical recurrence stays on-chip while the
  column x g-point plane fills the vector lanes,
* multiple quadrature angles vectorize via the leading scan over angles
  (the reference runs angles sequentially and accumulates,
  ``add_fluxes_kernel`` `:517-535`).

Everything assumes the canonical orientation: **top of atmosphere at layer
index 0** (callers flip otherwise — see ``models/radiation.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import config

# Gauss-Jacobi-5 quadrature (Table 1, Hogan 2023; src/Rte_lw.cpp:138-152).
GAUSS_DS = np.array([
    [1.0 / 0.6096748751, 0.0, 0.0, 0.0],
    [1.0 / 0.2509907356, 1.0 / 0.7908473988, 0.0, 0.0],
    [1.0 / 0.1024922169, 1.0 / 0.4417960320, 1.0 / 0.8633751621, 0.0],
    [1.0 / 0.0454586727, 1.0 / 0.2322334416, 1.0 / 0.5740198775, 1.0 / 0.903077597],
])
GAUSS_WTS = np.array([
    [1.0, 0.0, 0.0, 0.0],
    [0.2300253764, 0.7699746236, 0.0, 0.0],
    [0.0437820218, 0.3875796738, 0.5686383044, 0.0],
    [0.0092068785, 0.1285704278, 0.4323381850, 0.4298845087],
])


def _solve_one_angle(tau, lay_src, lev_src, sfc_emis, sfc_src, sfc_src_jac,
                     inc_flux, D, w):
    """One quadrature angle; returns per-gpt radiances scaled to fluxes."""
    dtype = tau.dtype
    tau_loc = tau * D
    trans = jnp.exp(-tau_loc)

    tau_thres = config.tau_thres(dtype)
    safe = jnp.where(tau_loc == 0.0, 1.0, tau_loc)
    fact = jnp.where(
        tau_loc > tau_thres,
        (1.0 - trans) / safe - trans,
        tau_loc * (0.5 + tau_loc * (-1.0 / 3.0 + tau_loc * (1.0 / 8.0))),
    )
    # top at index 0: downward source sees the level below the layer.
    src_dn = (1.0 - trans) * lev_src[:, 1:] + 2.0 * fact * (lay_src - lev_src[:, 1:])
    src_up = (1.0 - trans) * lev_src[:, :-1] + 2.0 * fact * (lay_src - lev_src[:, :-1])

    # Downward sweep: radn_dn[l+1] = trans[l]*radn_dn[l] + src_dn[l].
    rad_top = inc_flux / (2.0 * jnp.pi * w)

    def down_step(carry, x):
        t, s = x
        nxt = t * carry + s
        return nxt, nxt

    _, dn_rest = jax.lax.scan(
        down_step, rad_top,
        (jnp.moveaxis(trans, 1, 0), jnp.moveaxis(src_dn, 1, 0)))
    radn_dn = jnp.concatenate(
        [rad_top[:, None], jnp.moveaxis(dn_rest, 0, 1)], axis=1)

    # Surface reflection + upward sweep (with Jacobian carried along).
    sfc_albedo = 1.0 - sfc_emis
    up_bot = radn_dn[:, -1] * sfc_albedo + sfc_emis * sfc_src
    jac_bot = sfc_emis * sfc_src_jac

    def up_step(carry, x):
        up, jac = carry
        t, s = x
        up_n = t * up + s
        jac_n = t * jac
        return (up_n, jac_n), (up_n, jac_n)

    (_, _), (up_rest, jac_rest) = jax.lax.scan(
        up_step, (up_bot, jac_bot),
        (jnp.moveaxis(trans, 1, 0), jnp.moveaxis(src_up, 1, 0)),
        reverse=True)
    radn_up = jnp.concatenate(
        [jnp.moveaxis(up_rest, 0, 1), up_bot[:, None]], axis=1)
    radn_jac = jnp.concatenate(
        [jnp.moveaxis(jac_rest, 0, 1), jac_bot[:, None]], axis=1)

    scale = jnp.asarray(np.pi, dtype) * w
    return scale * radn_up, scale * radn_dn, scale * radn_jac


def lw_solver_noscat(tau, lay_src, lev_src, sfc_emis, sfc_src, sfc_src_jac,
                     inc_flux, n_gauss_angles: int = 1):
    """Gauss-quadrature LW solver.  All (ncol, nlay[, +1], ngpt), top at 0.

    sfc_emis / sfc_src / inc_flux: (ncol, ngpt).
    Returns flux_up, flux_dn, flux_up_jac: (ncol, nlay+1, ngpt).
    """
    dtype = tau.dtype
    fu = fd = fj = 0.0
    for imu in range(n_gauss_angles):
        D = jnp.asarray(GAUSS_DS[n_gauss_angles - 1, imu], dtype)
        w = jnp.asarray(GAUSS_WTS[n_gauss_angles - 1, imu], dtype)
        u, d, j = _solve_one_angle(tau, lay_src, lev_src, sfc_emis, sfc_src,
                                   sfc_src_jac, inc_flux, D, w)
        fu, fd, fj = fu + u, fd + d, fj + j
    return fu, fd, fj


def lw_solver_noscat_broadband(tau, lay_src, lev_src, sfc_emis, sfc_src,
                               sfc_src_jac, inc_flux,
                               n_gauss_angles: int = 1):
    """As :func:`lw_solver_noscat` but returning g-point-summed broadband
    fluxes (ncol, nlay+1).  On TPU/f32 this dispatches to the fused Pallas
    sweep kernel (ops/pallas/solver_kernels.py), which never materializes
    the (ncol, nlev, ngpt) flux planes; otherwise it reduces the XLA
    solver's output."""
    from .pallas import solver_kernels as sk

    nlev = tau.shape[1] + 1
    if sk.solvers_available(tau.dtype, nlev):
        G = tau.shape[2]
        gpad = (-G) % 128
        if gpad:
            z3 = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, gpad)))
            z2 = lambda a: jnp.pad(a, ((0, 0), (0, gpad)))
            # Zero-tau / zero-source padding contributes exactly zero to
            # the broadband sums.
            tau, lay_src, lev_src = z3(tau), z3(lay_src), z3(lev_src)
            sfc_emis, sfc_src = z2(sfc_emis), z2(sfc_src)
            sfc_src_jac, inc_flux = z2(sfc_src_jac), z2(inc_flux)
        fu = fd = fj = 0.0
        # The kernel flattens nlay*G onto lanes; G > 128 would exceed its
        # scoped-VMEM budget, so wide spectral chunks run as 128-g-point
        # sub-sweeps (g-points are independent; broadband = sum).
        for gs in range(0, tau.shape[2], 128):
            sl3 = lambda a: jax.lax.slice_in_dim(a, gs, gs + 128, axis=2)
            sl2 = lambda a: jax.lax.slice_in_dim(a, gs, gs + 128, axis=1)
            for imu in range(n_gauss_angles):
                u, d, j = sk.lw_sweep_broadband(
                    sl3(tau), sl3(lay_src), sl3(lev_src), sl2(sfc_emis),
                    sl2(sfc_src), sl2(sfc_src_jac), sl2(inc_flux),
                    D=float(GAUSS_DS[n_gauss_angles - 1, imu]),
                    w=float(GAUSS_WTS[n_gauss_angles - 1, imu]))
                fu, fd, fj = fu + u, fd + d, fj + j
        return fu, fd, fj
    up, dn, jac = lw_solver_noscat(tau, lay_src, lev_src, sfc_emis, sfc_src,
                                   sfc_src_jac, inc_flux, n_gauss_angles)
    return up.sum(-1), dn.sum(-1), jac.sum(-1)


def lw_solver_noscat_broadband_lm(tau_lm, lay_lm, lev_lm, sfc_emis, sfc_src,
                                  sfc_src_jac, inc_flux, *, ncol: int,
                                  n_gauss_angles: int = 1):
    """Broadband LW solve on the LAYER-MAJOR interchange: tau_lm/lay_lm
    (nlay*ncol, G) with cell (c, l) at row l*ncol + c, lev_lm
    ((nlay+1)*ncol, G), the rest (ncol, G).  Dispatches to the layer-grid
    Pallas kernels (ops/pallas/solver_layergrid.py) — no (ncol, nlay*G)
    retiling, depth-blind VMEM."""
    from .pallas import solver_layergrid as slg

    fu = fd = fj = 0.0
    for imu in range(n_gauss_angles):
        u, d, j = slg.lw_sweep_broadband_lm(
            tau_lm, lay_lm, lev_lm, sfc_emis, sfc_src, sfc_src_jac,
            inc_flux, ncol=ncol,
            D=float(GAUSS_DS[n_gauss_angles - 1, imu]),
            w=float(GAUSS_WTS[n_gauss_angles - 1, imu]))
        fu, fd, fj = fu + u, fd + d, fj + j
    return fu, fd, fj
