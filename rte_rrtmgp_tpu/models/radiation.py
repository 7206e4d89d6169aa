"""Top-level radiation solvers (the reference's driver layer).

``RadiationSolverLW`` / ``RadiationSolverSW`` mirror the capabilities of
``Radiation_solver_longwave/shortwave::solve``
(``src_test/Radiation_solver.cpp:384-916``), redesigned TPU-first:

* **No column blocking.**  The reference blocks columns (12 CPU / 1024 GPU)
  to bound working-set size; under XLA the whole column batch is one traced
  program and memory is bounded by **spectral chunking** instead
  (``gpt_chunk``): the pipeline runs per g-point chunk via
  ``KDist.slice_gpt`` and accumulates broadband/by-band fluxes — the
  generalization of the reference rt path's per-g-point streaming
  (``src_test/Radiation_solver_rt.cu:760``).
* **Orientation canonicalized.**  Solvers always run with the top of the
  atmosphere at layer index 0; inputs in the opposite orientation are
  flipped in/out (an XLA ``reverse``, fused and effectively free).
* **One implementation, jit-specialized** by static option flags — the
  reference's three code trees collapse here.

Everything in `_solve_*_impl` is pure and jitted once per (shapes, options).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (aerosol_optics as aero_ops, cloud_optics as cloud_ops,
                   fluxes as flux_ops, gas_optics as gas_ops,
                   optics_ops, rte_lw, rte_sw)
from .aerosol_lut import AerosolLUT
from .cloud_lut import CloudLUT
from .gas_concs import GasConcs
from .kdist import KDist


def _chunks(ngpt: int, gpt_chunk: Optional[int]):
    step = gpt_chunk or ngpt
    return [(g0, min(g0 + step, ngpt)) for g0 in range(0, ngpt, step)]


def _flip_lay(a):
    return jnp.flip(a, axis=1)


@functools.partial(jax.jit, static_argnames=(
    "top_at_1", "gpt_chunk", "output_bnd_fluxes", "n_gauss_angles",
    "with_clouds", "output_optical", "with_fluxes"))
def _solve_lw_impl(kd: KDist, cloud_lut, p_lay, p_lev, t_lay, t_lev, t_sfc,
                   vmr, col_dry, emis_sfc, lwp, iwp, rel, dei,
                   *, top_at_1: bool, gpt_chunk, output_bnd_fluxes: bool,
                   n_gauss_angles: int, with_clouds: bool,
                   output_optical: bool = False, with_fluxes: bool = True):
    if not top_at_1:
        p_lay, t_lay, vmr, col_dry = map(_flip_lay, (p_lay, t_lay, vmr, col_dry))
        p_lev, t_lev = map(_flip_lay, (p_lev, t_lev))
        if with_clouds:
            lwp, iwp, rel, dei = map(_flip_lay, (lwp, iwp, rel, dei))
    ncol, nlay = p_lay.shape
    nlev = nlay + 1
    nbnd = kd.nbnd
    dtype = p_lay.dtype

    col_gas = gas_ops.build_col_gas(vmr, col_dry)

    cld = None
    if with_clouds:
        cld = cloud_ops.cloud_optics_1scl(cloud_lut, lwp, iwp, rel, dei)

    flux_up = jnp.zeros((ncol, nlev), dtype)
    flux_dn = jnp.zeros((ncol, nlev), dtype)
    bnd_up = jnp.zeros((ncol, nlev, nbnd), dtype) if output_bnd_fluxes else None
    bnd_dn = jnp.zeros((ncol, nlev, nbnd), dtype) if output_bnd_fluxes else None

    interp = gas_ops.interpolation(kd, p_lay, t_lay, col_gas)
    optical = {k: [] for k in ("lw_tau", "lay_source", "lev_source",
                               "sfc_source")} if output_optical else None

    # Expand (ncol, nbnd) surface emissivity to the FULL spectrum once and
    # slice per chunk: one one-hot matmul (and one operand layout copy)
    # instead of one per chunk.  (Hoisting the Pallas WEIGHT PLANES the
    # same way was measured SLOWER — 68.7 vs 53.6 ms/step: slicing the
    # (N, ngpt) planes per chunk materializes ~2.4 GB of custom-call
    # operand copies, more than the saved builds.  gas_optics.major_resolves
    # remains available and tested for single-chunk callers.)
    emis_gpt_full = flux_ops.expand_bands_to_gpt(emis_sfc, kd.gpt2band)
    resolves = None
    # Layer-major 2D interchange (RTE_RRTMGP_LAYERMAJOR): tau/source
    # planes stay (N, G) with cell (c, l) at row l*ncol + c from the
    # interp kernels straight into the layer-grid solvers — no
    # (ncol, nlay, G) materialization, none of the retiling copies the
    # round-5 device trace attributed ~4 ms/step to, and depth-blind
    # solver VMEM (deep grids keep full column blocks).
    from ..ops.pallas import solver_kernels as _sk
    lm = (gas_ops.layer_major_enabled() and with_fluxes
          and not output_bnd_fluxes and not output_optical
          and gas_ops.merge_minor_enabled()
          and bool(kd.minor_lower or kd.minor_upper)
          and _sk.solvers_available(dtype, nlev))
    # Per-cell resolve pack (g-independent, built once): the Pallas passes
    # resolve their per-g weight planes IN-KERNEL on the MXU instead of
    # reading 8 XLA-built (N, G) planes from HBM per pass.
    cellw = gas_ops.cellw_resolves(kd, interp, order="lm" if lm else "cm")
    lm = lm and cellw is not None
    cld_tau_lm = (gas_ops._cells(cld.tau, "lm")
                  if lm and with_clouds else None)

    for g0, g1 in _chunks(kd.ngpt, gpt_chunk):
        kdc = kd.slice_gpt(g0, g1)
        tau, pfrac = gas_ops.tau_majmin_and_pfrac(
            kdc, interp, p_lay, t_lay, col_gas, resolves, g0, cellw=cellw)
        if lm:
            src = gas_ops.planck_source_lm(kdc, t_lay, t_lev, t_sfc,
                                           sfc_lay=nlay - 1, pfrac_lm=pfrac,
                                           ncol=ncol)
            if with_clouds:
                tau = tau + flux_ops.expand_bands_to_gpt(cld_tau_lm,
                                                         kdc.gpt2band)
            emis_gpt = jax.lax.slice_in_dim(emis_gpt_full, g0, g1, axis=1)
            inc = jnp.zeros((ncol, g1 - g0), dtype)
            up_bb, dn_bb, _ = rte_lw.lw_solver_noscat_broadband_lm(
                tau, src.lay_src, src.lev_src, emis_gpt, src.sfc_src,
                src.sfc_src_jac, inc, ncol=ncol,
                n_gauss_angles=n_gauss_angles)
            flux_up = flux_up + up_bb
            flux_dn = flux_dn + dn_bb
            continue
        src = gas_ops.planck_source(kdc, interp, t_lay, t_lev, t_sfc,
                                    sfc_lay=nlay - 1, pfrac=pfrac)
        if with_clouds:
            tau = tau + flux_ops.expand_bands_to_gpt(cld.tau, kdc.gpt2band)
        if output_optical:
            optical["lw_tau"].append(tau)
            optical["lay_source"].append(src.lay_src)
            optical["lev_source"].append(src.lev_src)
            optical["sfc_source"].append(src.sfc_src)
        if not with_fluxes:
            continue

        emis_gpt = jax.lax.slice_in_dim(emis_gpt_full, g0, g1, axis=1)
        inc = jnp.zeros((ncol, g1 - g0), dtype)
        if not output_bnd_fluxes:
            # Broadband-only: the fused Pallas sweep (TPU) reduces over
            # g-points in-kernel, never materializing (ncol, nlev, ngpt).
            up_bb, dn_bb, _ = rte_lw.lw_solver_noscat_broadband(
                tau, src.lay_src, src.lev_src, emis_gpt, src.sfc_src,
                src.sfc_src_jac, inc, n_gauss_angles=n_gauss_angles)
            flux_up = flux_up + up_bb
            flux_dn = flux_dn + dn_bb
            continue
        up, dn, _ = rte_lw.lw_solver_noscat(
            tau, src.lay_src, src.lev_src, emis_gpt, src.sfc_src,
            src.sfc_src_jac, inc, n_gauss_angles=n_gauss_angles)

        flux_up = flux_up + flux_ops.sum_broadband(up)
        flux_dn = flux_dn + flux_ops.sum_broadband(dn)
        if output_bnd_fluxes:
            bnd_up = bnd_up + flux_ops.sum_byband(up, kdc.gpt2band, nbnd)
            bnd_dn = bnd_dn + flux_ops.sum_byband(dn, kdc.gpt2band, nbnd)

    out = {}
    if with_fluxes:
        out.update({"lw_flux_up": flux_up, "lw_flux_dn": flux_dn,
                    "lw_flux_net": flux_dn - flux_up})
    if output_bnd_fluxes:
        out.update(lw_bnd_flux_up=bnd_up, lw_bnd_flux_dn=bnd_dn,
                   lw_bnd_flux_net=bnd_dn - bnd_up)
    if output_optical:
        out.update({k: jnp.concatenate(v, axis=-1)
                    for k, v in optical.items()})
    if not top_at_1:
        # Flip back everything with a vertical axis 1 (sfc_source is
        # (ncol, ngpt) — no vertical axis).
        out = {k: (v if k == "sfc_source" else jnp.flip(v, axis=1))
               for k, v in out.items()}
    return out


@functools.partial(jax.jit, static_argnames=(
    "top_at_1", "gpt_chunk", "output_bnd_fluxes", "with_clouds",
    "with_aerosols", "delta_cloud", "delta_aerosol", "output_optical",
    "with_fluxes"))
def _solve_sw_impl(kd: KDist, cloud_lut, aerosol_lut,
                   p_lay, p_lev, t_lay, vmr, col_dry,
                   sfc_alb_dir, sfc_alb_dif, tsi_scaling, mu0,
                   lwp, iwp, rel, dei, rh, aermr,
                   *, top_at_1: bool, gpt_chunk, output_bnd_fluxes: bool,
                   with_clouds: bool, with_aerosols: bool,
                   delta_cloud: bool, delta_aerosol: bool,
                   output_optical: bool = False, with_fluxes: bool = True):
    if not top_at_1:
        p_lay, t_lay, vmr, col_dry = map(_flip_lay, (p_lay, t_lay, vmr, col_dry))
        p_lev = _flip_lay(p_lev)
        if with_clouds:
            lwp, iwp, rel, dei = map(_flip_lay, (lwp, iwp, rel, dei))
        if with_aerosols:
            rh, aermr = map(_flip_lay, (rh, aermr))
    ncol, nlay = p_lay.shape
    nlev = nlay + 1
    nbnd = kd.nbnd
    dtype = p_lay.dtype

    col_gas = gas_ops.build_col_gas(vmr, col_dry)
    # Nighttime columns would produce NaNs in exp(-tau/mu0); compute them
    # with a safe mu0 and zero the fluxes at the end.
    mu0_safe = jnp.where(mu0 > 0.0, mu0, 1.0)

    cld = aer = None
    if with_clouds:
        cld = cloud_ops.cloud_optics_2str(cloud_lut, lwp, iwp, rel, dei)
        if delta_cloud:
            cld = optics_ops.delta_scale(cld)
    if with_aerosols:
        aer = aero_ops.aerosol_optics_2str(aerosol_lut, aermr, rh, p_lev)
        if delta_aerosol:
            aer = optics_ops.delta_scale(aer)

    flux_up = jnp.zeros((ncol, nlev), dtype)
    flux_dn = jnp.zeros((ncol, nlev), dtype)
    flux_dir = jnp.zeros((ncol, nlev), dtype)
    bnd = ({k: jnp.zeros((ncol, nlev, nbnd), dtype)
            for k in ("up", "dn", "dir")} if output_bnd_fluxes else None)

    interp = gas_ops.interpolation(kd, p_lay, t_lay, col_gas)
    optical = {k: [] for k in ("sw_tau", "ssa", "g", "toa_source")} \
        if output_optical else None

    # Full-spectrum surface albedo expansions, sliced per chunk (weight-
    # plane hoisting measured slower — see the LW note).
    alb_dir_full = flux_ops.expand_bands_to_gpt(sfc_alb_dir, kd.gpt2band)
    alb_dif_full = flux_ops.expand_bands_to_gpt(sfc_alb_dif, kd.gpt2band)
    resolves = None
    # Layer-major interchange (see the LW impl note).
    from ..ops.pallas import solver_kernels as _sk
    lm = (gas_ops.layer_major_enabled() and with_fluxes
          and not output_bnd_fluxes and not output_optical
          and gas_ops.merge_minor_enabled()
          and bool(kd.minor_lower or kd.minor_upper)
          and _sk.solvers_available(dtype, nlev))
    cellw = gas_ops.cellw_resolves(kd, interp, order="lm" if lm else "cm")
    lm = lm and cellw is not None
    to_lm2 = lambda o: optics_ops.OpticalProps2str(
        tau=gas_ops._cells(o.tau, "lm"), ssa=gas_ops._cells(o.ssa, "lm"),
        g=gas_ops._cells(o.g, "lm"))
    if lm:
        cld = to_lm2(cld) if with_clouds else cld
        aer = to_lm2(aer) if with_aerosols else aer

    for g0, g1 in _chunks(kd.ngpt, gpt_chunk):
        kdc = kd.slice_gpt(g0, g1)
        tau_abs, tau_ray = gas_ops.tau_majmin_and_rayleigh(
            kdc, interp, p_lay, t_lay, col_gas, col_dry, resolves, g0,
            cellw=cellw)
        tau, ssa, g = gas_ops.combine_abs_and_rayleigh(tau_abs, tau_ray)
        op = optics_ops.OpticalProps2str(tau=tau, ssa=ssa, g=g)

        if with_clouds:
            op = optics_ops.increment_2str_by_2str_bybnd(op, cld, kdc.gpt2band)
        if with_aerosols:
            op = optics_ops.increment_2str_by_2str_bybnd(op, aer, kdc.gpt2band)

        toa = (kdc.solar_source[None, :] * tsi_scaling[:, None]).astype(dtype)
        if lm:
            alb_dir = jax.lax.slice_in_dim(alb_dir_full, g0, g1, axis=1)
            alb_dif = jax.lax.slice_in_dim(alb_dif_full, g0, g1, axis=1)
            up_bb, dn_bb, dir_bb = rte_sw.sw_solver_2stream_broadband_lm(
                op.tau, op.ssa, op.g, mu0_safe, alb_dir, alb_dif, toa,
                ncol=ncol)
            flux_up = flux_up + up_bb
            flux_dn = flux_dn + dn_bb
            flux_dir = flux_dir + dir_bb
            continue
        if output_optical:
            optical["sw_tau"].append(op.tau)
            optical["ssa"].append(op.ssa)
            optical["g"].append(op.g)
            optical["toa_source"].append(toa)
        if not with_fluxes:
            continue
        alb_dir = jax.lax.slice_in_dim(alb_dir_full, g0, g1, axis=1)
        alb_dif = jax.lax.slice_in_dim(alb_dif_full, g0, g1, axis=1)

        if not output_bnd_fluxes:
            up_bb, dn_bb, dir_bb = rte_sw.sw_solver_2stream_broadband(
                op.tau, op.ssa, op.g, mu0_safe, alb_dir, alb_dif, toa)
            flux_up = flux_up + up_bb
            flux_dn = flux_dn + dn_bb
            flux_dir = flux_dir + dir_bb
            continue
        up, dn, fdir = rte_sw.sw_solver_2stream(
            op.tau, op.ssa, op.g, mu0_safe, alb_dir, alb_dif, toa)

        flux_up = flux_up + flux_ops.sum_broadband(up)
        flux_dn = flux_dn + flux_ops.sum_broadband(dn)
        flux_dir = flux_dir + flux_ops.sum_broadband(fdir)
        if output_bnd_fluxes:
            bnd["up"] = bnd["up"] + flux_ops.sum_byband(up, kdc.gpt2band, nbnd)
            bnd["dn"] = bnd["dn"] + flux_ops.sum_byband(dn, kdc.gpt2band, nbnd)
            bnd["dir"] = bnd["dir"] + flux_ops.sum_byband(fdir, kdc.gpt2band, nbnd)

    # Nighttime columns (mu0 <= 0) get zero SW fluxes.
    day = (mu0 > 0.0).astype(dtype)[:, None]
    out = {}
    if with_fluxes:
        out.update({"sw_flux_up": flux_up * day, "sw_flux_dn": flux_dn * day,
                    "sw_flux_dn_dir": flux_dir * day,
                    "sw_flux_net": (flux_dn - flux_up) * day})
    if output_bnd_fluxes:
        d3 = day[:, :, None]
        out.update(sw_bnd_flux_up=bnd["up"] * d3, sw_bnd_flux_dn=bnd["dn"] * d3,
                   sw_bnd_flux_dn_dir=bnd["dir"] * d3,
                   sw_bnd_flux_net=(bnd["dn"] - bnd["up"]) * d3)
    if output_optical:
        out.update({k: jnp.concatenate(v, axis=-1)
                    for k, v in optical.items()})
    if not top_at_1:
        out = {k: (v if k == "toa_source" else jnp.flip(v, axis=1))
               for k, v in out.items()}
    return out


class _SolverBase:
    def __init__(self, kdist: KDist, cloud_lut: Optional[CloudLUT] = None,
                 aerosol_lut: Optional[AerosolLUT] = None):
        self.kdist = kdist
        self.cloud_lut = cloud_lut
        self.aerosol_lut = aerosol_lut

    def _validate(self, p_lay, p_lev, t_lay, t_lev=None, t_sfc=None,
                  col_dry=None):
        """Host-side input range checks against the k-table bounds — the
        reference throws std::range_error on out-of-range inputs
        (src/Gas_optics_rrtmgp.cpp:813-827)."""
        kd = self.kdist

        def outside(a, lo, hi, name):
            a = np.asarray(a)
            if a.size and ((a < lo).any() or (a > hi).any()):
                raise ValueError(
                    f"{name} is out of range [{lo:g}, {hi:g}] "
                    f"(min {a.min():g}, max {a.max():g})")

        outside(p_lay, kd.press_ref_min, kd.press_ref_max, "p_lay")
        outside(p_lev, kd.press_ref_min, kd.press_ref_max, "p_lev")
        outside(t_lay, kd.temp_ref_min, kd.temp_ref_max, "t_lay")
        if t_lev is not None:
            outside(t_lev, kd.temp_ref_min, kd.temp_ref_max, "t_lev")
        if t_sfc is not None:
            outside(t_sfc, kd.temp_ref_min, kd.temp_ref_max, "t_sfc")
        if col_dry is not None and (np.asarray(col_dry) < 0).any():
            raise ValueError("col_dry is out of range (negative values)")

    def _prep(self, gas_concs: GasConcs, p_lay, p_lev, dtype):
        ncol, nlay = np.asarray(p_lay).shape
        vmr = gas_concs.materialize(self.kdist.gas_names, ncol, nlay, dtype=dtype)
        return jnp.asarray(vmr, dtype)

    @staticmethod
    def _col_dry(gas_concs, p_lev, col_dry, dtype):
        if col_dry is not None:
            return jnp.asarray(col_dry, dtype)
        ncol, nlev = np.asarray(p_lev).shape
        h2o = gas_concs.expand("h2o", ncol, nlev - 1)
        return gas_ops.get_col_dry(jnp.asarray(h2o, dtype), jnp.asarray(p_lev, dtype))

    @staticmethod
    def _detect_top(p_lay) -> bool:
        p = np.asarray(p_lay)
        return bool(p[0, 0] < p[0, -1])


class RadiationSolverLW(_SolverBase):
    """Longwave: gas (+cloud) optics -> no-scattering Gauss-quadrature solve
    -> broadband / by-band fluxes."""

    def solve(self, gas_concs: GasConcs, p_lay, p_lev, t_lay, t_lev, t_sfc,
              emis_sfc, col_dry=None, lwp=None, iwp=None, rel=None, dei=None,
              gpt_chunk: Optional[int] = None, output_bnd_fluxes: bool = False,
              n_gauss_angles: int = 1, dtype=None,
              output_optical: bool = False, with_fluxes: bool = True,
              check_inputs: bool = True, mesh=None) -> dict:
        """emis_sfc: (ncol, nbnd) surface emissivity per band.

        Cloud fields (lwp/iwp in g m-2, rel/dei in micron) enable the
        cloudy-sky path when provided.

        ``mesh``: a cols-only ``jax.sharding.Mesh`` runs the solve under
        shard_map — every device executes the full single-chip pipeline
        (including the fused Pallas kernels) on its column shard
        (parallel/sharded.py).
        """
        dtype = dtype or jnp.asarray(p_lay).dtype
        if check_inputs:
            self._validate(p_lay, p_lev, t_lay, t_lev, t_sfc, col_dry)
        top_at_1 = self._detect_top(p_lay)
        with_clouds = lwp is not None
        vmr = self._prep(gas_concs, p_lay, p_lev, dtype)
        col_dry = self._col_dry(gas_concs, p_lev, col_dry, dtype)
        zeros = jnp.zeros(np.asarray(p_lay).shape, dtype)
        cast = lambda a: jnp.asarray(a, dtype)
        args = (
            self.kdist, self.cloud_lut,
            cast(p_lay), cast(p_lev), cast(t_lay), cast(t_lev), cast(t_sfc),
            vmr, col_dry, cast(emis_sfc),
            cast(lwp) if with_clouds else zeros,
            cast(iwp) if with_clouds else zeros,
            cast(rel) if with_clouds else zeros,
            cast(dei) if with_clouds else zeros)
        statics = dict(
            top_at_1=top_at_1, gpt_chunk=gpt_chunk,
            output_bnd_fluxes=output_bnd_fluxes,
            n_gauss_angles=n_gauss_angles, with_clouds=with_clouds,
            output_optical=output_optical, with_fluxes=with_fluxes)
        if mesh is not None:
            from ..parallel.sharded import sharded_columns_call

            return sharded_columns_call(mesh, _solve_lw_impl, 2, args,
                                        statics)
        return _solve_lw_impl(*args, **statics)


class RadiationSolverSW(_SolverBase):
    """Shortwave: gas (+cloud/aerosol) optics -> two-stream adding solve ->
    broadband / by-band fluxes."""

    def solve(self, gas_concs: GasConcs, p_lay, p_lev, t_lay, mu0,
              sfc_alb_dir, sfc_alb_dif, tsi_scaling=None, col_dry=None,
              lwp=None, iwp=None, rel=None, dei=None, rh=None, aermr=None,
              gpt_chunk: Optional[int] = None, output_bnd_fluxes: bool = False,
              delta_cloud: bool = False, delta_aerosol: bool = False,
              dtype=None, output_optical: bool = False,
              with_fluxes: bool = True, check_inputs: bool = True,
              mesh=None) -> dict:
        """sfc_alb_*: (ncol, nbnd); mu0: (ncol,); aermr: (ncol, nlay, 11).

        ``mesh``: cols-only mesh -> shard_map execution (see
        RadiationSolverLW.solve)."""
        dtype = dtype or jnp.asarray(p_lay).dtype
        if check_inputs:
            self._validate(p_lay, p_lev, t_lay, col_dry=col_dry)
        top_at_1 = self._detect_top(p_lay)
        with_clouds = lwp is not None
        with_aerosols = aermr is not None
        vmr = self._prep(gas_concs, p_lay, p_lev, dtype)
        col_dry = self._col_dry(gas_concs, p_lev, col_dry, dtype)
        ncol, nlay = np.asarray(p_lay).shape
        zeros = jnp.zeros((ncol, nlay), dtype)
        zeros3 = jnp.zeros((ncol, nlay, 11), dtype)
        if tsi_scaling is None:
            tsi_scaling = jnp.ones((ncol,), dtype)
        cast = lambda a: jnp.asarray(a, dtype)
        args = (
            self.kdist, self.cloud_lut, self.aerosol_lut,
            cast(p_lay), cast(p_lev), cast(t_lay), vmr, col_dry,
            cast(sfc_alb_dir), cast(sfc_alb_dif), cast(tsi_scaling), cast(mu0),
            cast(lwp) if with_clouds else zeros,
            cast(iwp) if with_clouds else zeros,
            cast(rel) if with_clouds else zeros,
            cast(dei) if with_clouds else zeros,
            cast(rh) if with_aerosols else zeros,
            cast(aermr) if with_aerosols else zeros3)
        statics = dict(
            top_at_1=top_at_1, gpt_chunk=gpt_chunk,
            output_bnd_fluxes=output_bnd_fluxes,
            with_clouds=with_clouds, with_aerosols=with_aerosols,
            delta_cloud=delta_cloud, delta_aerosol=delta_aerosol,
            output_optical=output_optical, with_fluxes=with_fluxes)
        if mesh is not None:
            from ..parallel.sharded import sharded_columns_call

            return sharded_columns_call(mesh, _solve_sw_impl, 3, args,
                                        statics)
        return _solve_sw_impl(*args, **statics)
