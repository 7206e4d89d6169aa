"""NumPy oracle implementations of every compute kernel.

This is the unit-test layer the reference lacks (SURVEY.md par.4): a slow,
straightforward NumPy transcription of the physics, written to follow the
indexing of the reference kernels exactly

* gas optics:  ``src_kernels_cuda/gas_optics_rrtmgp_kernels.cu``
* RTE solvers: ``src_kernels_cuda/rte_solver_kernels.cu``
* optics ops:  ``src_kernels_cuda/optical_props_kernels.cu``
* cloud/aerosol: ``src/Cloud_optics.cpp``, ``src/Aerosol_optics.cpp``

The production JAX implementations in ``gas_optics.py`` / ``rte_lw.py`` /
``rte_sw.py`` are independently vectorized and validated against these
functions on small problems (float64), plus physics invariants.

All arrays: 0-based, C-order.  Index fields (jtemp/jpress/jeta) use the
reference's 1-based *values* so the interpolation arithmetic matches
literally; they never leave this module's API without documentation.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class InterpResult(NamedTuple):
    jtemp: np.ndarray     # (ncol, nlay) 1-based lower temperature index
    ftemp: np.ndarray
    jpress: np.ndarray    # (ncol, nlay) 1-based
    fpress: np.ndarray
    tropo: np.ndarray     # (ncol, nlay) bool, True in troposphere
    jeta: np.ndarray      # (ncol, nlay, nflav, 2) 1-based
    col_mix: np.ndarray   # (ncol, nlay, nflav, 2)
    fminor: np.ndarray    # (ncol, nlay, nflav, 2, 2)  [itemp, eta-pair]
    fmajor: np.ndarray    # (ncol, nlay, nflav, 2, 2, 2) [itemp, press-pair, eta-pair]


def interpolation(play, tlay, col_gas, flavor, press_ref_log, temp_ref,
                  press_ref_log_delta, temp_ref_min, temp_ref_delta,
                  press_ref_trop_log, vmr_ref, tiny, neta):
    """Reference: interpolation_kernel (gas_optics_rrtmgp_kernels.cu:317-395)."""
    ncol, nlay = play.shape
    nflav = len(flavor)
    ntemp = temp_ref.shape[0]
    npres = press_ref_log.shape[0]

    jtemp = ((tlay - (temp_ref_min - temp_ref_delta)) / temp_ref_delta).astype(int)
    jtemp = np.clip(jtemp, 1, ntemp - 1)
    ftemp = (tlay - temp_ref[jtemp - 1]) / temp_ref_delta

    locpress = 1.0 + (np.log(play) - press_ref_log[0]) / press_ref_log_delta
    jpress = np.clip(locpress.astype(int), 1, npres - 1)
    fpress = locpress - jpress

    tropo = np.log(play) > press_ref_trop_log
    itropo = np.where(tropo, 0, 1)  # 0-based row in vmr_ref

    jeta = np.zeros((ncol, nlay, nflav, 2), dtype=int)
    col_mix = np.zeros((ncol, nlay, nflav, 2))
    fminor = np.zeros((ncol, nlay, nflav, 2, 2))
    fmajor = np.zeros((ncol, nlay, nflav, 2, 2, 2))

    for iflav, (gas1, gas2) in enumerate(flavor):
        for itemp in range(2):
            # vmr_ref[(itropo, gas, jtemp-1+itemp)] (0-based axes)
            jt = jtemp - 1 + itemp
            ratio = (vmr_ref[itropo, gas1, jt] / vmr_ref[itropo, gas2, jt])
            cg1 = col_gas[:, :, gas1]
            cg2 = col_gas[:, :, gas2]
            cm = cg1 + ratio * cg2
            col_mix[:, :, iflav, itemp] = cm
            eta = np.where(cm > 2.0 * tiny, cg1 / np.where(cm == 0, 1, cm), 0.5)
            loceta = eta * (neta - 1)
            je = np.minimum(loceta.astype(int) + 1, neta - 1)
            jeta[:, :, iflav, itemp] = je
            feta = np.mod(loceta, 1.0)
            ftemp_term = (1 - itemp) + (2 * itemp - 1) * ftemp
            fminor[:, :, iflav, itemp, 0] = (1.0 - feta) * ftemp_term
            fminor[:, :, iflav, itemp, 1] = feta * ftemp_term
            fmajor[:, :, iflav, itemp, 0, 0] = (1.0 - fpress) * fminor[:, :, iflav, itemp, 0]
            fmajor[:, :, iflav, itemp, 0, 1] = (1.0 - fpress) * fminor[:, :, iflav, itemp, 1]
            fmajor[:, :, iflav, itemp, 1, 0] = fpress * fminor[:, :, iflav, itemp, 0]
            fmajor[:, :, iflav, itemp, 1, 1] = fpress * fminor[:, :, iflav, itemp, 1]

    return InterpResult(jtemp, ftemp, jpress, fpress, tropo, jeta, col_mix, fminor, fmajor)


def tau_major(interp: InterpResult, kmajor, gpoint_flavor, gpt2band):
    """Reference: gas_optical_depths_major_kernel (:398-443).

    kmajor: (ngpt, npress+1, neta, ntemp).
    Returns tau (ncol, nlay, ngpt).
    """
    ncol, nlay = interp.jtemp.shape
    ngpt = kmajor.shape[0]
    tau = np.zeros((ncol, nlay, ngpt))
    itropo01 = np.where(interp.tropo, 0, 1)  # 0 in troposphere

    for icol in range(ncol):
        for ilay in range(nlay):
            it = itropo01[icol, ilay]
            jt = interp.jtemp[icol, ilay]       # 1-based
            jp = interp.jpress[icol, ilay] + it  # jpressi, 1-based
            for igpt in range(ngpt):
                iflav = gpoint_flavor[it][igpt]
                acc = 0.0
                for i in range(2):
                    je = interp.jeta[icol, ilay, iflav, i]  # 1-based
                    fm = interp.fmajor[icol, ilay, iflav, i]
                    k = kmajor[igpt]
                    # k[(jpress', jeta', jtemp')] 0-based:
                    acc += interp.col_mix[icol, ilay, iflav, i] * (
                        fm[0, 0] * k[jp - 1, je - 1, jt - 1 + i]
                        + fm[0, 1] * k[jp - 1, je, jt - 1 + i]
                        + fm[1, 0] * k[jp, je - 1, jt - 1 + i]
                        + fm[1, 1] * k[jp, je, jt - 1 + i]
                    )
                tau[icol, ilay, igpt] = acc
    return tau


def tau_minor(interp: InterpResult, play, tlay, col_gas, kminor, minor_specs,
              idx_h2o, lower: bool, ngpt: int):
    """Reference: gas_optical_depths_minor_kernel (:458-579).

    kminor: (ncontrib, neta, ntemp).  Adds tau contributions for one
    atmosphere (lower=troposphere).  Returns tau increment (ncol,nlay,ngpt_max)
    sized by caller's ngpt.
    """
    ncol, nlay = play.shape
    tau = np.zeros((ncol, nlay, ngpt))
    for icol in range(ncol):
        for ilay in range(nlay):
            in_atm = interp.tropo[icol, ilay] if lower else (not interp.tropo[icol, ilay])
            if not in_atm:
                continue
            jt = interp.jtemp[icol, ilay]
            for spec in minor_specs:
                scaling = col_gas[icol, ilay, spec.idx_minor]
                if spec.scales_with_density:
                    scaling *= 0.01 * play[icol, ilay] / tlay[icol, ilay]
                    if spec.idx_scaling > 0:
                        vmr_fact = 1.0 / col_gas[icol, ilay, 0]
                        dry_fact = 1.0 / (1.0 + col_gas[icol, ilay, idx_h2o] * vmr_fact)
                        s = col_gas[icol, ilay, spec.idx_scaling] * vmr_fact * dry_fact
                        scaling *= (1.0 - s) if spec.scale_by_complement else s
                iflav = spec.flavor
                j0, j1 = interp.jeta[icol, ilay, iflav]
                fm = interp.fminor[icol, ilay, iflav]
                for ig in range(spec.gpt_end - spec.gpt_start):
                    row = spec.kminor_start + ig
                    ltau = (fm[0, 0] * kminor[row, j0 - 1, jt - 1]
                            + fm[0, 1] * kminor[row, j0, jt - 1]
                            + fm[1, 0] * kminor[row, j1 - 1, jt]
                            + fm[1, 1] * kminor[row, j1, jt])
                    tau[icol, ilay, spec.gpt_start + ig] += ltau * scaling
    return tau


def tau_rayleigh(interp: InterpResult, col_gas, col_dry, krayl, gpoint_flavor,
                 idx_h2o):
    """Reference: compute_tau_rayleigh_kernel (:674-718).

    krayl: (2, ngpt, neta, ntemp)."""
    ncol, nlay = interp.jtemp.shape
    ngpt = krayl.shape[1]
    tau_r = np.zeros((ncol, nlay, ngpt))
    itropo01 = np.where(interp.tropo, 0, 1)
    for icol in range(ncol):
        for ilay in range(nlay):
            it = itropo01[icol, ilay]
            jt = interp.jtemp[icol, ilay]
            fac = col_gas[icol, ilay, idx_h2o] + col_dry[icol, ilay]
            for igpt in range(ngpt):
                iflav = gpoint_flavor[it][igpt]
                j0, j1 = interp.jeta[icol, ilay, iflav]
                fm = interp.fminor[icol, ilay, iflav]
                k = krayl[it, igpt]
                kloc = (fm[0, 0] * k[j0 - 1, jt - 1] + fm[0, 1] * k[j0, jt - 1]
                        + fm[1, 0] * k[j1 - 1, jt] + fm[1, 1] * k[j1, jt])
                tau_r[icol, ilay, igpt] = kloc * fac
    return tau_r


def combine_abs_and_rayleigh(tau_abs, tau_ray, eps):
    """Reference: combine_abs_and_rayleigh_kernel (:721-746)."""
    tau = tau_abs + tau_ray
    ssa = np.where(tau > 2.0 * eps, tau_ray / np.where(tau == 0, 1, tau), 0.0)
    g = np.zeros_like(tau)
    return tau, ssa, g


def interpolate1d(val, offset, delta, table):
    """Reference: interpolate1D (gas_optics_rrtmgp_kernels.cu:1-13).
    table: (n, nbnd) — linear interp along axis 0 with the reference's
    clamped index arithmetic.  val: any shape; returns val.shape + (nbnd,)."""
    n = table.shape[0]
    val0 = (val - offset) / delta
    frac = val0 - val0.astype(int)
    idx = np.clip(val0.astype(int) + 1, 1, n - 1)
    return table[idx - 1] + frac[..., None] * (table[idx] - table[idx - 1])


def planck_source(interp: InterpResult, tlay, tlev, tsfc, sfc_lay,
                  planck_frac, temp_ref_min, totplnk_delta, totplnk,
                  gpoint_flavor, gpt2band, delta_tsurf=1.0):
    """Reference: Planck_source_kernel (:196-314).

    planck_frac: (ngpt, npress+1, neta, ntemp); totplnk: (nPlanckTemp, nbnd).
    sfc_lay: 0-based layer adjacent to the surface.
    Returns sfc_src, sfc_src_jac (ncol,ngpt), lay_src (ncol,nlay,ngpt),
    lev_src (ncol,nlay+1,ngpt).
    """
    ncol, nlay = tlay.shape
    ngpt = planck_frac.shape[0]

    # pfrac via the same trilinear stencil as tau_major with col_mix=1.
    pfrac = np.zeros((ncol, nlay, ngpt))
    itropo01 = np.where(interp.tropo, 0, 1)
    for icol in range(ncol):
        for ilay in range(nlay):
            it = itropo01[icol, ilay]
            jt = interp.jtemp[icol, ilay]
            jp = interp.jpress[icol, ilay] + it
            for igpt in range(ngpt):
                iflav = gpoint_flavor[it][igpt]
                acc = 0.0
                for i in range(2):
                    je = interp.jeta[icol, ilay, iflav, i]
                    fm = interp.fmajor[icol, ilay, iflav, i]
                    k = planck_frac[igpt]
                    acc += (fm[0, 0] * k[jp - 1, je - 1, jt - 1 + i]
                            + fm[0, 1] * k[jp - 1, je, jt - 1 + i]
                            + fm[1, 0] * k[jp, je - 1, jt - 1 + i]
                            + fm[1, 1] * k[jp, je, jt - 1 + i])
                pfrac[icol, ilay, igpt] = acc

    band = np.asarray(gpt2band)

    def B(temp):  # (ncol,) or (ncol,nlay) -> per-gpt Planck radiance
        # interpolate totplnk in T for each band, then expand to gpt
        b = interpolate1d(temp, temp_ref_min, totplnk_delta, totplnk)  # (..., nbnd)
        return b[..., band]

    lay_src = pfrac * B(tlay)

    lev_src = np.zeros((ncol, nlay + 1, ngpt))
    Blev = B(tlev)  # (ncol, nlay+1, ngpt)
    lev_src[:, 0] = pfrac[:, 0] * Blev[:, 0]
    lev_src[:, 1:nlay] = np.sqrt(pfrac[:, 1:] * pfrac[:, :-1]) * Blev[:, 1:nlay]
    lev_src[:, nlay] = pfrac[:, nlay - 1] * Blev[:, nlay]

    Bsfc = B(tsfc)                    # (ncol, ngpt)
    Bsfc2 = B(tsfc + delta_tsurf)
    sfc_src = pfrac[:, sfc_lay] * Bsfc
    sfc_src_jac = pfrac[:, sfc_lay] * (Bsfc2 - Bsfc)
    return sfc_src, sfc_src_jac, lay_src, lev_src


# ---------------------------------------------------------------------------
# RTE solvers (top of atmosphere at layer index 0; callers flip if needed).
# ---------------------------------------------------------------------------

GAUSS_DS = np.array([
    [1.0 / 0.6096748751, 0.0, 0.0, 0.0],
    [1.0 / 0.2509907356, 1.0 / 0.7908473988, 0.0, 0.0],
    [1.0 / 0.1024922169, 1.0 / 0.4417960320, 1.0 / 0.8633751621, 0.0],
    [1.0 / 0.0454586727, 1.0 / 0.2322334416, 1.0 / 0.5740198775, 1.0 / 0.903077597],
])  # [n_quad-1][imu]  (src/Rte_lw.cpp:140-145)

GAUSS_WTS = np.array([
    [1.0, 0.0, 0.0, 0.0],
    [0.2300253764, 0.7699746236, 0.0, 0.0],
    [0.0437820218, 0.3875796738, 0.5686383044, 0.0],
    [0.0092068785, 0.1285704278, 0.4323381850, 0.4298845087],
])  # (src/Rte_lw.cpp:147-152)


def lw_solver_noscat(tau, lay_src, lev_src, sfc_emis, sfc_src, sfc_src_jac,
                     inc_flux, n_gauss_angles, eps):
    """Reference: lw_solver_noscat_step_{1,2,3}_kernel
    (rte_solver_kernels.cu:97-193) + multi-angle accumulation.

    All inputs with the top of the atmosphere at index 0 (top_at_1 layout).
    tau/lay_src: (ncol, nlay, ngpt); lev_src: (ncol, nlay+1, ngpt);
    sfc_emis/sfc_src/inc_flux: (ncol, ngpt).
    Returns flux_up, flux_dn, flux_up_jac: (ncol, nlay+1, ngpt).
    """
    ncol, nlay, ngpt = tau.shape
    flux_up = np.zeros((ncol, nlay + 1, ngpt))
    flux_dn = np.zeros((ncol, nlay + 1, ngpt))
    flux_up_jac = np.zeros((ncol, nlay + 1, ngpt))

    tau_thres = np.sqrt(np.sqrt(eps))
    for imu in range(n_gauss_angles):
        D = GAUSS_DS[n_gauss_angles - 1, imu]
        w = GAUSS_WTS[n_gauss_angles - 1, imu]

        tau_loc = tau * D
        trans = np.exp(-tau_loc)
        fact = np.where(
            tau_loc > tau_thres,
            (1.0 - trans) / np.where(tau_loc == 0, 1, tau_loc) - trans,
            tau_loc * (0.5 + tau_loc * (-1.0 / 3.0 + tau_loc * (1.0 / 8.0))),
        )
        # top_at_1: source_dn uses lev_src below the layer (idx_lev_p),
        # source_up the level above (idx_lev).
        src_dn = (1.0 - trans) * lev_src[:, 1:] + 2.0 * fact * (lay_src - lev_src[:, 1:])
        src_up = (1.0 - trans) * lev_src[:, :-1] + 2.0 * fact * (lay_src - lev_src[:, :-1])

        radn_dn = np.zeros((ncol, nlay + 1, ngpt))
        radn_up = np.zeros((ncol, nlay + 1, ngpt))
        radn_up_jac = np.zeros((ncol, nlay + 1, ngpt))
        radn_dn[:, 0] = inc_flux / (2.0 * np.pi * w)
        for ilev in range(1, nlay + 1):
            radn_dn[:, ilev] = trans[:, ilev - 1] * radn_dn[:, ilev - 1] + src_dn[:, ilev - 1]

        sfc_albedo = 1.0 - sfc_emis
        radn_up[:, nlay] = radn_dn[:, nlay] * sfc_albedo + sfc_emis * sfc_src
        radn_up_jac[:, nlay] = sfc_emis * sfc_src_jac
        for ilev in range(nlay - 1, -1, -1):
            radn_up[:, ilev] = trans[:, ilev] * radn_up[:, ilev + 1] + src_up[:, ilev]
            radn_up_jac[:, ilev] = trans[:, ilev] * radn_up_jac[:, ilev + 1]

        flux_up += np.pi * w * radn_up
        flux_dn += np.pi * w * radn_dn
        flux_up_jac += np.pi * w * radn_up_jac

    return flux_up, flux_dn, flux_up_jac


def sw_two_stream_coeffs(tau, ssa, g, mu0, k_min_val, tmin):
    """Reference: sw_2stream_function (rte_solver_kernels.cu:543-592),
    including the Ukkonen r_dir/t_dir clamping fix.

    mu0: (ncol,) broadcast over layers.  Returns r_dif,t_dif,r_dir,t_dir,t_noscat.
    """
    mu0b = mu0[:, None, None]
    gamma1 = (8.0 - ssa * (5.0 + 3.0 * g)) * 0.25
    gamma2 = 3.0 * (ssa * (1.0 - g)) * 0.25
    gamma3 = (2.0 - 3.0 * mu0b * g) * 0.25
    gamma4 = 1.0 - gamma3
    alpha1 = gamma1 * gamma4 + gamma2 * gamma3
    alpha2 = gamma1 * gamma3 + gamma2 * gamma4

    k = np.sqrt(np.maximum((gamma1 - gamma2) * (gamma1 + gamma2), k_min_val))
    exp_mkt = np.exp(-tau * k)
    exp_m2kt = exp_mkt * exp_mkt
    rt_term = 1.0 / (k * (1.0 + exp_m2kt) + gamma1 * (1.0 - exp_m2kt))
    r_dif = rt_term * gamma2 * (1.0 - exp_m2kt)
    t_dif = rt_term * 2.0 * k * exp_mkt
    t_noscat = np.exp(-tau / mu0b)

    k_mu = k * mu0b
    k_g3 = k * gamma3
    k_g4 = k * gamma4
    fact = np.where(np.abs(1.0 - k_mu * k_mu) > tmin, 1.0 - k_mu * k_mu, tmin)
    rt2 = ssa * rt_term / fact
    r_dir = rt2 * ((1.0 - k_mu) * (alpha2 + k_g3)
                   - (1.0 + k_mu) * (alpha2 - k_g3) * exp_m2kt
                   - 2.0 * (k_g3 - alpha2 * k_mu) * exp_mkt * t_noscat)
    t_dir = -rt2 * ((1.0 + k_mu) * (alpha1 + k_g4) * t_noscat
                    - (1.0 - k_mu) * (alpha1 - k_g4) * exp_m2kt * t_noscat
                    - 2.0 * (k_g4 + alpha1 * k_mu) * exp_mkt)
    r_dir = np.maximum(tmin, np.minimum(r_dir, 1.0 - t_noscat))
    t_dir = np.maximum(tmin, np.minimum(t_dir, 1.0 - t_noscat - r_dir))
    return r_dif, t_dif, r_dir, t_dir, t_noscat


def sw_solver_2stream(tau, ssa, g, mu0, sfc_alb_dir, sfc_alb_dif, inc_flux_dir,
                      inc_flux_dif, k_min_val, tmin):
    """Reference: sw_source_2stream_kernel + sw_adding_kernel
    (rte_solver_kernels.cu:196-286, 595-655), top at index 0.

    sfc_alb_*: (ncol, ngpt); inc_flux_dir: (ncol, ngpt); mu0: (ncol,).
    Returns flux_up, flux_dn (total incl. direct), flux_dir: (ncol,nlay+1,ngpt).
    """
    ncol, nlay, ngpt = tau.shape
    r_dif, t_dif, r_dir, t_dir, t_noscat = sw_two_stream_coeffs(
        tau, ssa, g, mu0, k_min_val, tmin)

    flux_dir = np.zeros((ncol, nlay + 1, ngpt))
    flux_dir[:, 0] = inc_flux_dir * mu0[:, None]
    src_up = np.zeros((ncol, nlay, ngpt))
    src_dn = np.zeros((ncol, nlay, ngpt))
    for il in range(nlay):
        src_up[:, il] = r_dir[:, il] * flux_dir[:, il]
        src_dn[:, il] = t_dir[:, il] * flux_dir[:, il]
        flux_dir[:, il + 1] = t_noscat[:, il] * flux_dir[:, il]
    src_sfc = flux_dir[:, nlay] * sfc_alb_dir

    albedo = np.zeros((ncol, nlay + 1, ngpt))
    src = np.zeros((ncol, nlay + 1, ngpt))
    denom = np.zeros((ncol, nlay, ngpt))
    albedo[:, nlay] = sfc_alb_dif
    src[:, nlay] = src_sfc
    for il in range(nlay - 1, -1, -1):
        denom[:, il] = 1.0 / (1.0 - r_dif[:, il] * albedo[:, il + 1])
        albedo[:, il] = r_dif[:, il] + t_dif[:, il] ** 2 * albedo[:, il + 1] * denom[:, il]
        src[:, il] = src_up[:, il] + t_dif[:, il] * denom[:, il] * (
            src[:, il + 1] + albedo[:, il + 1] * src_dn[:, il])

    flux_up = np.zeros((ncol, nlay + 1, ngpt))
    flux_dn = np.zeros((ncol, nlay + 1, ngpt))
    flux_dn[:, 0] = inc_flux_dif if inc_flux_dif is not None else 0.0
    flux_up[:, 0] = flux_dn[:, 0] * albedo[:, 0] + src[:, 0]
    for il in range(1, nlay + 1):
        flux_dn[:, il] = (t_dif[:, il - 1] * flux_dn[:, il - 1]
                          + r_dif[:, il - 1] * src[:, il]
                          + src_dn[:, il - 1]) * denom[:, il - 1]
        flux_up[:, il] = flux_dn[:, il] * albedo[:, il] + src[:, il]
    flux_dn += flux_dir
    return flux_up, flux_dn, flux_dir


# ---------------------------------------------------------------------------
# Optical property combination ops.
# ---------------------------------------------------------------------------

def increment_1scl_by_1scl(tau1, tau2):
    return tau1 + tau2


def increment_2str_by_2str(tau1, ssa1, g1, tau2, ssa2, g2, eps):
    """Reference: increment_2stream_by_2stream_kernel."""
    tau12 = tau1 + tau2
    tauscat12 = tau1 * ssa1 + tau2 * ssa2
    g_out = (tau1 * ssa1 * g1 + tau2 * ssa2 * g2) / np.maximum(tauscat12, eps)
    ssa_out = tauscat12 / np.maximum(eps, tau12)
    return tau12, ssa_out, g_out


def increment_1scl_by_1scl_bybnd(tau1, tau2_bnd, band_lims_gpt):
    out = tau1.copy()
    for ib, (g0, g1) in enumerate(band_lims_gpt):
        out[:, :, g0:g1] += tau2_bnd[:, :, ib:ib + 1]
    return out


def increment_2str_by_2str_bybnd(tau1, ssa1, g1, tau2_b, ssa2_b, g2_b,
                                 band_lims_gpt, eps):
    tau_o, ssa_o, g_o = tau1.copy(), ssa1.copy(), g1.copy()
    for ib, (b0, b1) in enumerate(band_lims_gpt):
        t, s, gg = increment_2str_by_2str(
            tau1[:, :, b0:b1], ssa1[:, :, b0:b1], g1[:, :, b0:b1],
            tau2_b[:, :, ib:ib + 1], ssa2_b[:, :, ib:ib + 1], g2_b[:, :, ib:ib + 1],
            eps)
        tau_o[:, :, b0:b1] = t
        ssa_o[:, :, b0:b1] = s
        g_o[:, :, b0:b1] = gg
    return tau_o, ssa_o, g_o


def delta_scale_2str(tau, ssa, g, eps):
    """Reference: delta_scale_2str_k_kernel."""
    f = g * g
    wf = ssa * f
    tau_out = tau * (1.0 - wf)
    ssa_out = (ssa - wf) / np.maximum(eps, 1.0 - wf)
    g_out = (g - f) / np.maximum(eps, 1.0 - f)
    return tau_out, ssa_out, g_out


# ---------------------------------------------------------------------------
# Cloud / aerosol optics.
# ---------------------------------------------------------------------------

def cloud_optics_from_lut(cwp, re, nsteps, step_size, offset,
                          tau_table, ssa_table, asy_table):
    """Reference: compute_all_from_table (src/Cloud_optics.cpp:72-107).
    Tables: (nsteps, nbnd).  Returns tau, taussa, taussag (ncol,nlay,nbnd)."""
    ncol, nlay = cwp.shape
    nbnd = tau_table.shape[1]
    mask = cwp > 0.0
    idx = np.minimum(((re - offset) / step_size).astype(int) + 1, nsteps - 1)  # 1-based
    fint = (re - offset) / step_size - (idx - 1)
    tau = np.zeros((ncol, nlay, nbnd))
    taussa = np.zeros_like(tau)
    taussag = np.zeros_like(tau)
    for ic in range(ncol):
        for il in range(nlay):
            if not mask[ic, il]:
                continue
            i = idx[ic, il]
            f = fint[ic, il]
            t = cwp[ic, il] * (tau_table[i - 1] + f * (tau_table[i] - tau_table[i - 1]))
            ts = t * (ssa_table[i - 1] + f * (ssa_table[i] - ssa_table[i - 1]))
            tsg = ts * (asy_table[i - 1] + f * (asy_table[i] - asy_table[i - 1]))
            tau[ic, il] = t
            taussa[ic, il] = ts
            taussag[ic, il] = tsg
    return tau, taussa, taussag


def sum_broadband(gpt_flux):
    return gpt_flux.sum(axis=-1)


def sum_byband(gpt_flux, band_lims_gpt):
    ncol, nlev, _ = gpt_flux.shape
    nbnd = len(band_lims_gpt)
    out = np.zeros((ncol, nlev, nbnd))
    for ib, (g0, g1) in enumerate(band_lims_gpt):
        out[:, :, ib] = gpt_flux[:, :, g0:g1].sum(axis=-1)
    return out


def get_col_dry(vmr_h2o, plev):
    """Reference: Gas_optics_rrtmgp::get_col_dry (src/Gas_optics_rrtmgp.cpp:764-792)."""
    g0 = 9.80665
    avogad = 6.02214076e23
    m_dry = 0.028964
    m_h2o = 0.018016
    delta_plev = np.abs(plev[:, :-1] - plev[:, 1:])
    m_air = (m_dry + m_h2o * vmr_h2o) / (1.0 + vmr_h2o)
    col_dry = 10.0 * delta_plev * avogad / (1000.0 * m_air * 100.0 * g0)
    return col_dry / (1.0 + vmr_h2o)
