"""RRTMGP gas optics — vectorized JAX implementation.

The TPU-native re-design of the reference gas-optics kernels
(``src_kernels_cuda/gas_optics_rrtmgp_kernels.cu``):

* the per-(col,lay,flavor) interpolation kernel (`:317-395`) becomes a fully
  vectorized computation over an (ncol, nlay, nflav, 2) index/weight tensor,
* the 8-point trilinear k-table gathers of the major-gas kernel (`:398-443`)
  become flat ``jnp.take`` gathers with indices shaped (ncol, nlay, ngpt),
* the ragged minor-gas interval loop (`:458-579`) unrolls at *trace time*
  over the static ``MinorSpec`` tuple — every g-point range is a static
  slice, so XLA sees only dense, statically-shaped ops (no ragged indexing
  on device; this replaces the reference's ``kminor_start`` indirection),
* Planck source (`:196-314`) reuses the same trilinear gather with the
  band-integrated Planck radiance interpolated along the temperature table.

Everything here is shape-polymorphic in (ncol, nlay) and jit-compatible with
``KDist`` passed as a pytree argument.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..models.kdist import KDist
from ..models.types import OpticalProps1scl, OpticalProps2str, SourceFuncLW
from ..utils.pytree import pytree_dataclass


@pytree_dataclass
class Interp:
    """Interpolation indices/weights (all indices 0-based lower corners)."""

    jtemp0: object    # (ncol, nlay) int32 in [0, ntemp-2]
    jpress0: object   # (ncol, nlay) int32: 0-based row of jpress (1-based) - 1
    tropo: object     # (ncol, nlay) bool
    itropo01: object  # (ncol, nlay) int32: 0 troposphere / 1 upper
    jeta0: object     # (ncol, nlay, nflav, 2) int32 in [0, neta-2]
    col_mix: object   # (ncol, nlay, nflav, 2)
    fminor: object    # (ncol, nlay, nflav, 2, 2)   [itemp, eta-corner]
    fmajor: object    # (ncol, nlay, nflav, 2, 2, 2) [itemp, press, eta]


def interpolation(kd: KDist, play, tlay, col_gas) -> Interp:
    """Vectorized port of interpolation_kernel (:317-395)."""
    dtype = play.dtype
    ntemp, neta, npres = kd.ntemp, kd.neta, kd.press_ref_log.shape[0]
    nflav = kd.nflav
    tiny = config.tiny(dtype)

    jtemp = jnp.clip(
        ((tlay - (kd.temp_ref_min - kd.temp_ref_delta)) / kd.temp_ref_delta)
        .astype(jnp.int32), 1, ntemp - 1)
    ftemp = (tlay - kd.temp_ref[jtemp - 1]) / kd.temp_ref_delta

    log_play = jnp.log(play)
    locpress = 1.0 + (log_play - kd.press_ref_log[0]) / kd.press_ref_log_delta
    jpress = jnp.clip(locpress.astype(jnp.int32), 1, npres - 1)
    fpress = locpress - jpress.astype(dtype)

    tropo = log_play > kd.press_ref_trop_log
    itropo01 = jnp.where(tropo, 0, 1).astype(jnp.int32)

    # --- per-flavor binary-species mixing ---
    gas1 = np.array([f[0] for f in kd.flavor], dtype=np.int32)   # (nflav,)
    gas2 = np.array([f[1] for f in kd.flavor], dtype=np.int32)

    cg1 = col_gas[:, :, gas1]   # (ncol, nlay, nflav)
    cg2 = col_gas[:, :, gas2]

    # vmr_ref[itropo, gas, jtemp0 + itemp] for both flavor gases.
    vmr_ref = kd.vmr_ref  # (2, ngas+1, ntemp)
    ngasp1 = vmr_ref.shape[1]
    vflat = vmr_ref.reshape(-1)
    jt0 = (jtemp - 1)[:, :, None, None]                       # (ncol,nlay,1,1)
    offs = np.arange(2, dtype=np.int32)[None, None, None, :]   # itemp
    itro = itropo01[:, :, None, None]

    def vmr_at(gas_idx):
        g = gas_idx[None, None, :, None]
        idx = (itro * ngasp1 + g) * ntemp + (jt0 + offs)
        return jnp.take(vflat, idx)                            # (ncol,nlay,nflav,2)

    ratio = vmr_at(gas1) / vmr_at(gas2)
    col_mix = cg1[..., None] + ratio * cg2[..., None]          # (ncol,nlay,nflav,2)
    eta = jnp.where(col_mix > 2.0 * tiny, cg1[..., None] / col_mix, 0.5)

    loceta = eta * (neta - 1)
    jeta = jnp.minimum(loceta.astype(jnp.int32) + 1, neta - 1)  # 1-based
    feta = jnp.mod(loceta, 1.0)
    ftt = jnp.stack([1.0 - ftemp, ftemp], axis=-1)[:, :, None, :]  # (ncol,nlay,1,2)

    fminor = jnp.stack([(1.0 - feta) * ftt, feta * ftt], axis=-1)  # (...,2it,2eta)
    fp = fpress[:, :, None, None, None]
    fmajor = jnp.stack([(1.0 - fp) * fminor, fp * fminor], axis=-2)  # (...,2,2p,2e)

    return Interp(
        jtemp0=jtemp - 1,
        jpress0=jpress - 1,
        tropo=tropo,
        itropo01=itropo01,
        jeta0=jeta - 1,
        col_mix=col_mix,
        fminor=fminor,
        fmajor=fmajor,
    )


def _flavor_of_gpt(kd: KDist, interp: Interp):
    """iflav per (ncol, nlay, ngpt): gpoint_flavor selected by troposphere."""
    gpf = np.asarray(kd.gpoint_flavor, dtype=np.int32)  # (2, ngpt) static
    return jnp.where(interp.tropo[:, :, None], gpf[0][None, None, :],
                     gpf[1][None, None, :])


def _gather_flav(arr, iflav):
    """Gather (ncol, nlay, nflav) along the flavor axis with iflav
    (ncol, nlay, ngpt) -> (ncol, nlay, ngpt).

    Only rank-3 inputs: gathering with trailing unit/corner dims would force
    XLA to tile tiny trailing axes onto the (sublane, lane) layout — a 64x
    padding blowup on TPU (observed: a 67 GB s32 temp for a 1 GB gather).
    Callers gather each trilinear-corner component separately instead.
    """
    assert arr.ndim == 3, arr.shape
    return jnp.take_along_axis(arr, iflav, axis=2)


def _interp3d_gather(kd: KDist, table, interp: Interp, scale_by_colmix: bool):
    """Shared 8-point trilinear gather over a (ngpt, npress+1, neta, ntemp)
    table; the math of gas_optical_depths_major_kernel (:398-443) /
    Planck_source_kernel's pfrac (:262-271)."""
    ngpt = table.shape[0]
    npress1, neta, ntemp = table.shape[1], table.shape[2], table.shape[3]
    tflat = table.reshape(-1)

    iflav = _flavor_of_gpt(kd, interp)                     # (ncol,nlay,ngpt)

    gidx = jnp.arange(ngpt, dtype=jnp.int32)[None, None, :]
    p0 = (interp.jpress0 + interp.itropo01)[:, :, None]    # (ncol,nlay,1)
    jt = interp.jtemp0[:, :, None]

    out = 0.0
    for i in range(2):      # temperature pair
        base_t = jt + i
        je0 = _gather_flav(interp.jeta0[:, :, :, i], iflav)
        sc = (_gather_flav(interp.col_mix[:, :, :, i], iflav)
              if scale_by_colmix else 1.0)
        acc = 0.0
        for dp in range(2):
            for de in range(2):
                w = _gather_flav(interp.fmajor[:, :, :, i, dp, de], iflav)
                idx = ((gidx * npress1 + (p0 + dp)) * neta + (je0 + de)) * ntemp + base_t
                acc = acc + w * jnp.take(tflat, idx)
        out = out + sc * acc
    return out


def tau_major(kd: KDist, interp: Interp):
    """tau from major gases: (ncol, nlay, ngpt)."""
    return _interp3d_gather(kd, kd.kmajor, interp, scale_by_colmix=True)


def tau_minor(kd: KDist, interp: Interp, play, tlay, col_gas, tau):
    """Minor-gas optical depth, both atmospheres; adds into ``tau``.

    Trace-time unrolled over the static MinorSpec tuples (the TPU-friendly
    replacement for gas_optical_depths_minor_kernel :458-579).
    """
    dtype = play.dtype
    ntemp, neta = kd.ntemp, kd.neta

    for lower, specs, kminor in (
        (True, kd.minor_lower, kd.kminor_lower),
        (False, kd.minor_upper, kd.kminor_upper),
    ):
        if not specs:
            continue
        mask = interp.tropo if lower else jnp.logical_not(interp.tropo)
        maskf = mask.astype(dtype)
        jt = interp.jtemp0  # (ncol, nlay)

        for spec in specs:
            scaling = col_gas[:, :, spec.idx_minor]
            if spec.scales_with_density:
                scaling = scaling * (0.01 * play / tlay)
                if spec.idx_scaling > 0:
                    # Guard degenerate layers (col_dry == 0, e.g. duplicated
                    # pressure levels at the model top) against 0/0 -> NaN.
                    vmr_fact = 1.0 / jnp.maximum(col_gas[:, :, 0],
                                                 config.tiny(dtype))
                    dry_fact = 1.0 / (1.0 + col_gas[:, :, kd.idx_h2o] * vmr_fact)
                    s = col_gas[:, :, spec.idx_scaling] * vmr_fact * dry_fact
                    scaling = scaling * ((1.0 - s) if spec.scale_by_complement else s)
            scaling = scaling * maskf

            ng = spec.gpt_end - spec.gpt_start
            ksl = jax.lax.slice_in_dim(kminor, spec.kminor_start,
                                       spec.kminor_start + ng, axis=0)
            kflat = ksl.reshape(-1)   # (ng, neta, ntemp) flattened
            j0 = interp.jeta0[:, :, spec.flavor, 0][:, :, None]  # (ncol,nlay,1)
            j1 = interp.jeta0[:, :, spec.flavor, 1][:, :, None]
            fm = interp.fminor[:, :, spec.flavor]                # (ncol,nlay,2,2)
            gidx = jnp.arange(ng, dtype=jnp.int32)[None, None, :]
            jtb = jt[:, :, None]

            ltau = (
                fm[:, :, 0, 0, None] * jnp.take(kflat, (gidx * neta + j0) * ntemp + jtb)
                + fm[:, :, 0, 1, None] * jnp.take(kflat, (gidx * neta + j0 + 1) * ntemp + jtb)
                + fm[:, :, 1, 0, None] * jnp.take(kflat, (gidx * neta + j1) * ntemp + jtb + 1)
                + fm[:, :, 1, 1, None] * jnp.take(kflat, (gidx * neta + j1 + 1) * ntemp + jtb + 1)
            )
            upd = ltau * scaling[:, :, None]
            tau = jax.lax.dynamic_update_slice_in_dim(
                tau,
                jax.lax.slice_in_dim(tau, spec.gpt_start, spec.gpt_end, axis=2) + upd,
                spec.gpt_start, axis=2)
    return tau


def tau_rayleigh(kd: KDist, interp: Interp, col_gas, col_dry):
    """Rayleigh scattering optical depth (compute_tau_rayleigh_kernel :674-718)."""
    ngpt, neta, ntemp = kd.ngpt, kd.neta, kd.ntemp
    kflat = kd.krayl.reshape(-1)  # (2, ngpt, neta, ntemp)

    iflav = _flavor_of_gpt(kd, interp)

    gidx = jnp.arange(ngpt, dtype=jnp.int32)[None, None, :]
    it = interp.itropo01[:, :, None]
    jt = interp.jtemp0[:, :, None]
    base = (it * ngpt + gidx) * neta

    kloc = 0.0
    for i in range(2):
        je0 = _gather_flav(interp.jeta0[:, :, :, i], iflav)
        for de in range(2):
            w = _gather_flav(interp.fminor[:, :, :, i, de], iflav)
            kloc = kloc + w * jnp.take(kflat, (base + je0 + de) * ntemp + jt + i)

    fac = (col_gas[:, :, kd.idx_h2o] + col_dry)[:, :, None]
    return kloc * fac


def combine_abs_and_rayleigh(tau_abs, tau_ray):
    """combine_abs_and_rayleigh_kernel (:721-746): tau, ssa, g."""
    eps = config.eps(tau_abs.dtype)
    tau = tau_abs + tau_ray
    ssa = jnp.where(tau > 2.0 * eps, tau_ray / jnp.where(tau == 0.0, 1.0, tau), 0.0)
    return tau, ssa, jnp.zeros_like(tau)


def _interp1d_planck(temp, kd: KDist):
    """interpolate1D over totplnk (gas_optics_rrtmgp_kernels.cu:1-13),
    returning band Planck radiance expanded to g-points: temp.shape + (ngpt,)."""
    nT = kd.totplnk.shape[0]
    val0 = (temp - kd.temp_ref_min) / kd.totplnk_delta
    ival = val0.astype(jnp.int32)
    frac = val0 - ival.astype(temp.dtype)
    idx = jnp.clip(ival + 1, 1, nT - 1)
    lo = jnp.take(kd.totplnk, idx - 1, axis=0)
    hi = jnp.take(kd.totplnk, idx, axis=0)
    b = lo + frac[..., None] * (hi - lo)   # (..., nbnd)
    band = np.asarray(kd.gpt2band, dtype=np.int32)
    return b[..., band]


def planck_source(kd: KDist, interp: Interp, tlay, tlev, tsfc,
                  sfc_lay: int) -> SourceFuncLW:
    """Planck_source_kernel (:196-314).  ``sfc_lay`` is the 0-based layer
    adjacent to the surface (static)."""
    pfrac = _interp3d_gather(kd, kd.planck_frac, interp, scale_by_colmix=False)

    lay_src = pfrac * _interp1d_planck(tlay, kd)

    blev = _interp1d_planck(tlev, kd)  # (ncol, nlay+1, ngpt)
    nlay = tlay.shape[1]
    lev_inner = jnp.sqrt(pfrac[:, 1:] * pfrac[:, :-1]) * blev[:, 1:nlay]
    lev_src = jnp.concatenate([
        (pfrac[:, :1] * blev[:, :1]),
        lev_inner,
        (pfrac[:, nlay - 1:nlay] * blev[:, nlay:nlay + 1]),
    ], axis=1)

    bsfc = _interp1d_planck(tsfc, kd)                       # (ncol, ngpt)
    bsfc2 = _interp1d_planck(tsfc + config.DELTA_TSURF, kd)
    sfc_src = pfrac[:, sfc_lay] * bsfc
    sfc_src_jac = pfrac[:, sfc_lay] * (bsfc2 - bsfc)
    return SourceFuncLW(sfc_src=sfc_src, sfc_src_jac=sfc_src_jac,
                        lay_src=lay_src, lev_src=lev_src)


def build_col_gas(vmr, col_dry):
    """(ncol, nlay, ngas) vmr + (ncol, nlay) col_dry -> col_gas with the dry
    column at index 0 (the reference's offset-indexed array,
    ``src/Gas_optics_rrtmgp.cpp:1152-1160``)."""
    return jnp.concatenate(
        [col_dry[:, :, None], vmr * col_dry[:, :, None]], axis=2)


def get_col_dry(vmr_h2o, plev):
    """Hydrostatic dry-air column (src/Gas_optics_rrtmgp.cpp:764-792)."""
    delta_plev = jnp.abs(plev[:, :-1] - plev[:, 1:])
    m_air = (config.M_DRY + config.M_H2O * vmr_h2o) / (1.0 + vmr_h2o)
    col = 10.0 * delta_plev * config.AVOGADRO / (1000.0 * m_air * 100.0 * config.GRAV)
    return col / (1.0 + vmr_h2o)


# ---------------------------------------------------------------------------
# Top-level gas optics (the reference's Gas_optics_rrtmgp::gas_optics).
# ---------------------------------------------------------------------------

def gas_optics_lw(kd: KDist, play, plev, tlay, tlev, tsfc, vmr, col_dry,
                  sfc_lay: int):
    """LW overload (src/Gas_optics_rrtmgp.cpp:796-849): returns
    (OpticalProps1scl, SourceFuncLW)."""
    col_gas = build_col_gas(vmr, col_dry)
    interp = interpolation(kd, play, tlay, col_gas)
    tau = tau_major(kd, interp)
    tau = tau_minor(kd, interp, play, tlay, col_gas, tau)
    sources = planck_source(kd, interp, tlay, tlev, tsfc, sfc_lay)
    return OpticalProps1scl(tau=tau), sources


def gas_optics_sw(kd: KDist, play, plev, tlay, vmr, col_dry):
    """SW overload (src/Gas_optics_rrtmgp.cpp:853-898): returns
    (OpticalProps2str, toa_src (ncol, ngpt))."""
    col_gas = build_col_gas(vmr, col_dry)
    interp = interpolation(kd, play, tlay, col_gas)
    tau_abs = tau_major(kd, interp)
    tau_abs = tau_minor(kd, interp, play, tlay, col_gas, tau_abs)
    tau_ray = tau_rayleigh(kd, interp, col_gas, col_dry)
    tau, ssa, g = combine_abs_and_rayleigh(tau_abs, tau_ray)
    ncol = play.shape[0]
    toa_src = jnp.broadcast_to(kd.solar_source[None, :], (ncol, kd.ngpt))
    return OpticalProps2str(tau=tau, ssa=ssa, g=g), toa_src
