"""3D forward ray-traced shortwave driver (per-g-point spectral streaming).

TPU-native equivalent of ``Radiation_solver_shortwave::solve_gpu`` in
``src_test/Radiation_solver_rt.cu:668-990`` + ``Raytracer::trace_rays``:

* the reference loops g-points on the host, re-running single-g-point gas
  optics each iteration (``Gas_optics_rrtmgp_rt``); here gas optics runs
  once for all g-points (spectrally chunked for memory) and a single
  compiled ``lax.scan`` over the spectral axis drives the Monte-Carlo
  tracer and the per-g-point flux accumulation (``add_from_gpoint``,
  ``src_kernels_cuda_rt/gpt_combine_kernels_rt.cu``),
* when the atmosphere extends above the dynamic 3D domain, the ray-traced
  grid gets ONE extra cell on top (``n_z = n_z_in+1``,
  ``test_rte_rrtmgp_rt.cu:334``) whose optical properties integrate every
  above-domain layer (``bundles_optical_props_tod``, Raytracer.cu:111-166);
  photons launch above it, so it attenuates the incoming beam while
  in-domain cells keep their exact per-layer absorption,
* the optional 1D two-stream pass reuses the standard SW solver.

Domain conventions: columns are an (ny, nx) raster with column index
``icol = iy*nx + ix``; the surface is at layer index 0 (LES-style grids);
the ray-traced domain spans the lowest ``nz`` layers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fluxes as flux_ops, gas_optics as gas_ops, optics_ops
from ..ops import cloud_optics as cloud_ops, aerosol_optics as aero_ops
from ..ops import rte_sw
from .kdist import KDist
from . import raytracer as rt


class RTFluxes(NamedTuple):
    # broadband ray-traced fluxes
    rt_flux_tod_dn: object   # (ny, nx)
    rt_flux_tod_up: object
    rt_flux_sfc_dir: object
    rt_flux_sfc_dif: object
    rt_flux_sfc_up: object
    # (nz_rt, ny, nx) with nz_rt = nz+1 when the atmosphere extends above
    # the domain: the last layer is the above-domain (TOD) integral cell,
    # mirroring the reference's Fluxes_broadband_rt sized grid_cells.z.
    rt_flux_abs_dir: object
    rt_flux_abs_dif: object
    # broadband two-stream fluxes (None unless requested)
    sw_flux_up: object
    sw_flux_dn: object
    sw_flux_dn_dir: object
    # by-band outputs (None unless output_bnd_fluxes; reference
    # Fluxes_byband_rt, include_rt/Fluxes_rt.h:113-142 — extended here to
    # the ray-traced accumulators as well)
    sw_bnd_flux_up: object = None       # (ncol, nlev, nbnd)
    sw_bnd_flux_dn: object = None
    sw_bnd_flux_dn_dir: object = None
    rt_bnd_flux_tod_dn: object = None   # (nbnd, ny, nx)
    rt_bnd_flux_tod_up: object = None
    rt_bnd_flux_sfc_dir: object = None
    rt_bnd_flux_sfc_dif: object = None
    rt_bnd_flux_sfc_up: object = None


@functools.partial(jax.jit, static_argnames=(
    "grid_cells", "photons_per_pixel", "kn_grid", "independent_column",
    "gpt_chunk", "with_twostream", "with_raytracing", "with_clouds",
    "with_aerosols", "delta_cloud", "delta_aerosol", "with_mie",
    "output_bnd_fluxes", "scan_width", "spectral_mode", "nbnd",
    "return_gas_planes"))
def _solve_rt_impl(kd: KDist, cloud_lut, aerosol_lut, key,
                   p_lay, p_lev, t_lay, vmr, col_dry,
                   sfc_alb_dir, sfc_alb_dif, tsi_scaling, mu0, azi,
                   lwp, iwp, rel, dei, rh, aermr, grid_d,
                   mie_cdf, mie_ang, g_start=None, acc_in=None,
                   gas_planes=None,
                   *, grid_cells, kn_grid, photons_per_pixel: int,
                   independent_column: bool, gpt_chunk,
                   with_twostream: bool, with_raytracing: bool,
                   with_clouds: bool, with_aerosols: bool,
                   delta_cloud: bool, delta_aerosol: bool,
                   with_mie: bool = False,
                   output_bnd_fluxes: bool = False,
                   scan_width=None,
                   spectral_mode: str = "scan",
                   nbnd: Optional[int] = None,
                   return_gas_planes: bool = False):
    nz, ny, nx = grid_cells
    ncol, nlay = p_lay.shape
    dtype = p_lay.dtype
    # By-band accumulators always span the FULL band axis: with
    # --single-gpt the sliced kd shrinks nbnd to 1 while gpt2band keeps
    # GLOBAL band indices, so the caller passes the unsliced band count.
    nbnd = kd.nbnd if nbnd is None else nbnd

    # Canonical top-at-0 for the 1D work: flip (surface is at index 0).
    flip = lambda a: jnp.flip(a, axis=1)
    if gas_planes is None:
        colgas_flip = gas_ops.build_col_gas(flip(vmr), flip(col_dry))
        interp = gas_ops.interpolation(kd, flip(p_lay), flip(t_lay),
                                       colgas_flip)

    cld = aer = None
    if with_clouds:
        cld = cloud_ops.cloud_optics_2str(cloud_lut, lwp, iwp, rel, dei)
        if delta_cloud:
            cld = optics_ops.delta_scale(cld)      # banded, surface-at-0
    if with_aerosols:
        aer = aero_ops.aerosol_optics_2str(aerosol_lut, aermr, rh, p_lev)
        if delta_aerosol:
            aer = optics_ops.delta_scale(aer)

    mu0_safe = jnp.where(mu0 > 0.0, mu0, 1.0)

    # --- pass 1: per-g-point optics (gas) + two-stream accumulation ---
    step = gpt_chunk or kd.ngpt
    gas_tau_parts, gas_ssa_parts = [], []
    ts_up = jnp.zeros((ncol, nlay + 1), dtype)
    ts_dn = jnp.zeros((ncol, nlay + 1), dtype)
    ts_dir = jnp.zeros((ncol, nlay + 1), dtype)
    bnd_ts = (jnp.zeros((ncol, nlay + 1, nbnd), dtype),) * 3 \
        if (output_bnd_fluxes and with_twostream) else None

    cellw = (gas_ops.cellw_resolves(kd, interp)
             if gas_planes is None else None)
    for g0 in range(0, kd.ngpt, step) if gas_planes is None else ():
        g1 = min(g0 + step, kd.ngpt)
        kdc = kd.slice_gpt(g0, g1)
        tau_abs, tau_ray = gas_ops.tau_majmin_and_rayleigh(
            kdc, interp, flip(p_lay), flip(t_lay), colgas_flip,
            flip(col_dry), g0=g0, cellw=cellw)
        tau_g, ssa_g, _ = gas_ops.combine_abs_and_rayleigh(tau_abs, tau_ray)
        # back to surface-at-0 for the 3D work
        gas_tau_parts.append(flip(tau_g))
        gas_ssa_parts.append(flip(ssa_g))

        if with_twostream:
            op = optics_ops.OpticalProps2str(
                tau=tau_g, ssa=ssa_g, g=jnp.zeros_like(tau_g))
            if with_clouds:
                cldf = optics_ops.OpticalProps2str(
                    tau=flip(cld.tau), ssa=flip(cld.ssa), g=flip(cld.g))
                op = optics_ops.increment_2str_by_2str_bybnd(op, cldf, kdc.gpt2band)
            if with_aerosols:
                aerf = optics_ops.OpticalProps2str(
                    tau=flip(aer.tau), ssa=flip(aer.ssa), g=flip(aer.g))
                op = optics_ops.increment_2str_by_2str_bybnd(op, aerf, kdc.gpt2band)
            toa = (kdc.solar_source[None, :] * tsi_scaling[:, None]).astype(dtype)
            up, dn, fdir = rte_sw.sw_solver_2stream(
                op.tau, op.ssa, op.g, mu0_safe,
                flux_ops.expand_bands_to_gpt(sfc_alb_dir, kdc.gpt2band),
                flux_ops.expand_bands_to_gpt(sfc_alb_dif, kdc.gpt2band), toa)
            ts_up = ts_up + flux_ops.sum_broadband(up)
            ts_dn = ts_dn + flux_ops.sum_broadband(dn)
            ts_dir = ts_dir + flux_ops.sum_broadband(fdir)
            if bnd_ts is not None:
                bnd_ts = tuple(
                    acc + flux_ops.sum_byband(f, kdc.gpt2band, nbnd)
                    for acc, f in zip(bnd_ts, (up, dn, fdir)))

    day = (mu0 > 0.0).astype(dtype)[:, None]
    ts_out = ((flip(ts_up) * day, flip(ts_dn) * day, flip(ts_dir) * day)
              if with_twostream else (None, None, None))
    bnd_ts_out = (tuple(flip(a) * day[:, :, None] for a in bnd_ts)
                  if bnd_ts is not None else (None, None, None))
    # two-stream outputs flipped back to surface-at-0 level ordering.

    # Ray-traced grid height: one extra integrated cell above the domain
    # when the atmosphere extends past it (test_rte_rrtmgp_rt.cu:334).
    nz_rt = nz + 1 if nz < nlay else nz

    if not with_raytracing:
        zeros2 = jnp.zeros((ny, nx), dtype)
        zeros3 = jnp.zeros((nz_rt, ny, nx), dtype)
        return RTFluxes(zeros2, zeros2, zeros2, zeros2, zeros2, zeros3, zeros3,
                        *ts_out, *bnd_ts_out)

    if gas_planes is not None:
        gas_tau, gas_ssa = gas_planes
    else:
        gas_tau = jnp.concatenate(gas_tau_parts, axis=-1)  # (ncol, nlay, ngpt)
        gas_ssa = jnp.concatenate(gas_ssa_parts, axis=-1)
    if return_gas_planes:
        # Windowed-dispatch precompute: pass 1 only (gas optics for the
        # full spectrum), so the per-window dispatches don't redo it.
        return gas_tau, gas_ssa

    # --- pass 2: scan over g-points driving the Monte-Carlo tracer ---
    g2b = np.asarray(kd.gpt2band, dtype=np.int32)
    zero_b = jnp.zeros((ncol, nlay, nbnd), dtype)
    cld_tau_b = cld.tau if with_clouds else zero_b
    cld_ssa_b = cld.ssa if with_clouds else zero_b
    cld_g_b = cld.g if with_clouds else zero_b
    aer_tau_b = aer.tau if with_aerosols else zero_b
    aer_ssa_b = aer.ssa if with_aerosols else zero_b
    aer_g_b = aer.g if with_aerosols else zero_b
    nb = cld_tau_b.shape[-1]

    dz = grid_d[0]
    zen = jnp.arccos(jnp.clip(mu0_safe[0], -1.0, 1.0))
    sun_dir = jnp.stack([
        -jnp.sin(zen) * jnp.cos(0.5 * jnp.pi - azi[0]),
        -jnp.sin(zen) * jnp.sin(0.5 * jnp.pi - azi[0]),
        -jnp.cos(zen)])

    def to3d(col_field_lay):  # (ncol, nz_rt) -> (nz_rt, ny, nx)
        return col_field_lay.T.reshape(nz_rt, ny, nx)

    if with_clouds:
        # No clouds above the domain: zero r_eff in the extra TOD cell.
        rel3d = to3d(jnp.concatenate(
            [rel[:, :nz], jnp.zeros((ncol, nz_rt - nz), dtype)], axis=1))
    else:
        rel3d = jnp.zeros((nz_rt, ny, nx), dtype)

    def tod_compress(q):
        """(ncol, nlay) -> (ncol, nz_rt): in-domain cells keep their exact
        per-layer values; the extra top cell (if any) integrates every
        above-domain layer into one cell of height dz
        (bundles_optical_props_tod, Raytracer.cu:111-166)."""
        if nz_rt == nz:
            return q[:, :nz]
        top = q[:, nz:].sum(axis=1, keepdims=True)
        return jnp.concatenate([q[:, :nz], top], axis=1)

    def per_gpt(igpt, tau_g, ssa_g, solar_g):
        """One g-point's Monte-Carlo trace: returns the 7 flux fields and
        the band index (for by-band accumulation)."""
        band = jnp.asarray(g2b)[igpt]

        def pick_band(arr_b):   # (ncol, nlay, nbnd) -> (ncol, nlay)
            # mode="clip": jnp.take_along_axis defaults to 'fill' (NaN) for
            # out-of-bounds indices.
            return jnp.take_along_axis(
                arr_b, jnp.broadcast_to(band, (ncol, nlay, 1)).astype(jnp.int32),
                axis=2, mode="clip")[:, :, 0]

        tau_cld = pick_band(cld_tau_b)
        ssa_cld = pick_band(cld_ssa_b)
        g_cld = pick_band(cld_g_b)
        tau_aer = pick_band(aer_tau_b)
        ssa_aer = pick_band(aer_ssa_b)
        g_aer = pick_band(aer_g_b)

        # total optics per cell = gas + cloud + aerosol (increment op)
        tau_tot = tau_g + tau_cld + tau_aer
        tausca = tau_g * ssa_g + tau_cld * ssa_cld + tau_aer * ssa_aer
        ssa_tot = tausca / jnp.maximum(tau_tot, 1e-30)

        # TOD compression of scattering-weighted quantities.
        tau_tot_c = tod_compress(tau_tot)
        tausca_c = tod_compress(tausca)
        ssa_tot_c = tausca_c / jnp.maximum(tau_tot_c, 1e-30)
        tau_cld_c = tod_compress(tau_cld)
        tausca_cld_c = tod_compress(tau_cld * ssa_cld)
        ssa_cld_c = tausca_cld_c / jnp.maximum(tau_cld_c, 1e-30)
        asy_cld_c = tod_compress(tau_cld * ssa_cld * g_cld) \
            / jnp.maximum(tausca_cld_c, 1e-30)
        tau_aer_c = tod_compress(tau_aer)
        tausca_aer_c = tod_compress(tau_aer * ssa_aer)
        ssa_aer_c = tausca_aer_c / jnp.maximum(tau_aer_c, 1e-30)
        asy_aer_c = tod_compress(tau_aer * ssa_aer * g_aer) \
            / jnp.maximum(tausca_aer_c, 1e-30)

        k = rt.bundle_optical_props(
            to3d(tau_tot_c), to3d(ssa_tot_c),
            to3d(tau_cld_c), to3d(ssa_cld_c), to3d(asy_cld_c),
            to3d(tau_aer_c), to3d(ssa_aer_c), to3d(asy_aer_c), dz)

        alb_band = jnp.take_along_axis(
            sfc_alb_dir, jnp.broadcast_to(band, (ncol, 1)).astype(jnp.int32),
            axis=1, mode="clip")[:, 0].reshape(ny, nx)

        tod_dir = solar_g * tsi_scaling[0] * mu0_safe[0]
        key_g = jax.random.fold_in(key, igpt)
        mie_kw = {}
        if with_mie:
            # Per-band Mie phase-function subset (the reference's
            # mie_cdfs.subset per band, Radiation_solver_rt.cu:921-935).
            bidx = jnp.asarray(band, jnp.int32)
            mie_kw = dict(
                mie_cdf=jnp.take(mie_cdf, bidx, axis=0, mode="clip"),
                mie_ang=jnp.take(mie_ang, bidx, axis=0, mode="clip"))
        out = rt.trace_rays(
            key_g, k[0], k[1], k[2], k[3], k[4], k[5], rel3d, alb_band,
            kn_grid, grid_d, tod_dir, jnp.zeros((), dtype), sun_dir,
            photons_per_pixel=photons_per_pixel,
            independent_column=independent_column,
            # "auto": env > the persisted tune_rt.py winner > "fifo" —
            # the driver starts at the tuned point like the reference
            # loading rte_rrtmgp_kernel_tuning.txt (include/tuner.h:27-37).
            respawn_mode="auto", **mie_kw)

        flat = (out.flux_toa_down, out.flux_tod_up, out.flux_sfc_dir,
                out.flux_sfc_dif, out.flux_sfc_up, out.flux_abs_dir,
                out.flux_abs_dif)
        return flat, band

    def body(acc, xs):
        flat, band = per_gpt(*xs)
        bb = tuple(a + b for a, b in zip(acc[:7], flat))
        if not output_bnd_fluxes:
            return bb, None
        # By-band accumulation of the 2D ray-traced fluxes: one one-hot
        # outer product per accumulator (Fluxes_byband_rt analog).
        onehot = jax.nn.one_hot(band, nbnd, dtype=dtype)[:, None, None]
        bnd = tuple(a + f[None] * onehot for a, f in zip(acc[7:], flat[:5]))
        return bb + bnd, None

    zeros2 = jnp.zeros((ny, nx), dtype)
    zeros3 = jnp.zeros((nz_rt, ny, nx), dtype)
    acc0 = (zeros2, zeros2, zeros2, zeros2, zeros2, zeros3, zeros3)
    if output_bnd_fluxes:
        zb = jnp.zeros((nbnd, ny, nx), dtype)
        acc0 = acc0 + (zb,) * 5
    if acc_in is not None:
        acc0 = acc_in
    if scan_width is None:
        xs = (jnp.arange(kd.ngpt, dtype=jnp.int32),
              jnp.moveaxis(gas_tau, 2, 0),
              jnp.moveaxis(gas_ssa, 2, 0),
              jnp.asarray(kd.solar_source))
    else:
        # Dispatch-windowed scan: W g-points starting at the DYNAMIC
        # g_start, so every window reuses ONE compiled program.  One
        # device dispatch per window keeps long Monte-Carlo renders under
        # the TPU worker's execution watchdog (see radiation_bw).
        s0 = jnp.asarray(g_start, jnp.int32)
        dslice = lambda a: jax.lax.dynamic_slice_in_dim(a, s0, scan_width,
                                                        axis=2)
        xs = (s0 + jnp.arange(scan_width, dtype=jnp.int32),
              jnp.moveaxis(dslice(gas_tau), 2, 0),
              jnp.moveaxis(dslice(gas_ssa), 2, 0),
              jax.lax.dynamic_slice_in_dim(jnp.asarray(kd.solar_source),
                                           s0, scan_width, axis=0))
    if spectral_mode == "lanes":
        # Spectral-lane merge (see radiation_bw._render_impl): every
        # g-point of this dispatch traces concurrently in one batched
        # photon while_loop — iteration count becomes the max walk length
        # over the window instead of the sum.  Per-g RNG streams equal
        # scan mode's, so the two modes agree to accumulation order.
        flats, bands = jax.vmap(per_gpt)(*xs)
        acc = tuple(a + f.sum(axis=0) for a, f in zip(acc0[:7], flats))
        if output_bnd_fluxes:
            oh = jax.nn.one_hot(bands, nbnd, dtype=dtype)     # (W, nbnd)
            acc = acc + tuple(
                a + jnp.einsum("wb,wyx->byx", oh, f)
                for a, f in zip(acc0[7:], flats[:5]))
    else:
        acc, _ = jax.lax.scan(body, acc0, xs)

    day0 = (mu0[0] > 0.0).astype(dtype)
    acc = tuple(a * day0 for a in acc)
    if scan_width is not None:
        # Window mode: return the raw accumulators for chaining (the
        # day0 mask is 0/1 and idempotent over summed windows).
        return acc
    bnd_rt = acc[7:] if output_bnd_fluxes else (None,) * 5
    return RTFluxes(*acc[:7], *ts_out, *bnd_ts_out, *bnd_rt)


class RadiationSolverRT:
    """Shortwave 3D forward ray-tracing solver (per-g-point streaming)."""

    def __init__(self, kdist: KDist, cloud_lut=None, aerosol_lut=None,
                 mie_cdf=None, mie_ang=None):
        self.kdist = kdist
        self.cloud_lut = cloud_lut
        self.aerosol_lut = aerosol_lut
        self.mie_cdf = mie_cdf
        self.mie_ang = mie_ang

    def solve(self, gas_concs, p_lay, p_lev, t_lay, mu0, azi,
              sfc_alb_dir, sfc_alb_dif, grid_cells, grid_d, kn_grid,
              tsi_scaling=None, col_dry=None, lwp=None, iwp=None, rel=None,
              dei=None, rh=None, aermr=None, photons_per_pixel: int = 32,
              independent_column: bool = False, raytracing: bool = True,
              twostream: bool = False, delta_cloud: bool = False,
              delta_aerosol: bool = False, gpt_chunk: Optional[int] = None,
              single_gpt: Optional[int] = None,
              output_bnd_fluxes: bool = False,
              gpt_per_dispatch: Optional[int] = None,
              spectral_mode: str = "scan",
              key=None, dtype=None) -> RTFluxes:
        """grid_cells = (nz, ny, nx); grid_d = (dz, dy, dx) in meters.

        Surface must be at layer index 0 (LES-style ordering;
        p_lay[:, 0] > p_lay[:, -1]).

        ``gpt_per_dispatch``: run the Monte-Carlo g-point scan in windows
        of this many g-points, one device dispatch each (a full-spectrum
        scan is ONE device program; long renders trip the TPU worker's
        execution watchdog).  All windows reuse one compiled program
        (dynamic window start).  None = single dispatch.

        ``spectral_mode="lanes"``: trace every g-point of a dispatch
        concurrently (vmap-merged photon loop) instead of scanning them
        sequentially.  Memory scales with the window size (per-g 3D
        fields + per-g photon state live at once) — combine with
        ``gpt_per_dispatch`` on large domains; "lanes" over the FULL
        spectrum of an RCEMIP-size domain will exhaust device memory.
        """
        dtype = dtype or np.float32
        kd = self.kdist
        if single_gpt is not None:
            # Reference --single-gpt: trace one g-point only (1-based).
            kd = kd.slice_gpt(single_gpt - 1, single_gpt)
        p = np.asarray(p_lay)
        assert p[0, 0] > p[0, -1], "RT solver expects surface at layer 0"
        ncol, nlay = p.shape
        nz, ny, nx = grid_cells
        assert ncol == ny * nx and nz <= nlay

        vmr = gas_concs.materialize(kd.gas_names, ncol, nlay, dtype=dtype)
        if col_dry is None:
            h2o = gas_concs.expand("h2o", ncol, nlay)
            col_dry = np.asarray(gas_ops.get_col_dry(
                jnp.asarray(h2o, dtype), jnp.asarray(p_lev, dtype)))
        if tsi_scaling is None:
            tsi_scaling = np.ones(ncol)
        if key is None:
            key = jax.random.PRNGKey(0)

        cast = lambda a: jnp.asarray(a, dtype)
        with_clouds = lwp is not None
        with_aerosols = aermr is not None
        zeros = jnp.zeros((ncol, nlay), dtype)
        zeros3 = jnp.zeros((ncol, nlay, 11), dtype)
        with_mie = self.mie_cdf is not None
        nbnd = kd.nbnd
        mie_cdf = (jnp.asarray(self.mie_cdf, dtype) if with_mie
                   else jnp.zeros((nbnd, 1), dtype))
        mie_ang = (jnp.asarray(self.mie_ang, dtype) if with_mie
                   else jnp.zeros((nbnd, 1, 1), dtype))
        args = (kd, self.cloud_lut, self.aerosol_lut, key,
                cast(p_lay), cast(p_lev), cast(t_lay), cast(vmr),
                cast(col_dry),
                cast(sfc_alb_dir), cast(sfc_alb_dif), cast(tsi_scaling),
                cast(mu0), cast(azi),
                cast(lwp) if with_clouds else zeros,
                cast(iwp) if with_clouds else zeros,
                cast(rel) if with_clouds else zeros,
                cast(dei) if with_clouds else zeros,
                cast(rh) if with_aerosols else zeros,
                cast(aermr) if with_aerosols else zeros3,
                jnp.asarray(grid_d, dtype), mie_cdf, mie_ang)
        kw = dict(
            grid_cells=tuple(grid_cells), kn_grid=tuple(kn_grid),
            photons_per_pixel=photons_per_pixel,
            independent_column=independent_column, gpt_chunk=gpt_chunk,
            with_clouds=with_clouds, with_aerosols=with_aerosols,
            delta_cloud=delta_cloud, delta_aerosol=delta_aerosol,
            with_mie=with_mie, output_bnd_fluxes=output_bnd_fluxes,
            spectral_mode=spectral_mode)
        kw["nbnd"] = self.kdist.nbnd
        if gpt_per_dispatch is None or not raytracing:
            return _solve_rt_impl(*args, with_twostream=twostream,
                                  with_raytracing=raytracing, **kw)
        # Windowed MC dispatches: the two-stream pass runs once by itself;
        # then each window of W g-points is one device dispatch chaining
        # the ray-traced accumulators through acc_in.
        ts = _solve_rt_impl(*args, with_twostream=twostream,
                            with_raytracing=False, **kw) \
            if twostream else None
        # Full-spectrum gas optics runs ONCE; each window dispatch receives
        # the precomputed (tau, ssa) planes instead of redoing pass 1.
        planes = _solve_rt_impl(*args, with_twostream=False,
                                with_raytracing=True,
                                return_gas_planes=True, **kw)
        acc_box = [None]

        def run_window(s0, W):
            acc_box[0] = _solve_rt_impl(
                *args, jnp.int32(s0), acc_box[0], planes,
                with_twostream=False, with_raytracing=True,
                scan_width=W, **kw)
            # Block on real device work (fetch one scalar): the adaptive
            # sizer times this callback.
            float(jax.device_get(acc_box[0][0].ravel()[0]))

        if gpt_per_dispatch == "auto":
            # Size windows from the measured per-window time (the hand-set
            # constant either wastes dispatches or trips the ~1 min TPU
            # execution watchdog; reference analog: per-g-point launches,
            # Radiation_solver_rt.cu:760).
            from ..utils.dispatch import run_windowed

            # lanes mode holds W g-points of photon state + 3D fields at
            # once: cap the growth so memory stays bounded.
            run_windowed(kd.ngpt, run_window, w0=2,
                         max_w=16 if spectral_mode == "lanes" else None)
        else:
            W = min(gpt_per_dispatch, kd.ngpt)
            while kd.ngpt % W:
                W -= 1
            for s0 in range(0, kd.ngpt, W):
                run_window(s0, W)
        acc = acc_box[0]
        bnd_rt = acc[7:] if output_bnd_fluxes else (None,) * 5
        ts_f = ((ts.sw_flux_up, ts.sw_flux_dn, ts.sw_flux_dn_dir)
                if ts is not None else (None, None, None))
        bnd_ts = ((ts.sw_bnd_flux_up, ts.sw_bnd_flux_dn,
                   ts.sw_bnd_flux_dn_dir)
                  if ts is not None and output_bnd_fluxes
                  else (None, None, None))
        return RTFluxes(*acc[:7], *ts_f, *bnd_ts, *bnd_rt)
