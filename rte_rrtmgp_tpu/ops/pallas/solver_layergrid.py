"""Layer-grid RTE solver kernels: the vertical axis tiled across GRID steps.

Second-generation TPU design of the fused broadband solvers
(``solver_kernels.py``), built for the LAYER-MAJOR 2D interchange format:
every (column, layer) plane is a ``(nlay*ncol, G)`` array whose row for
cell ``(c, l)`` is ``l*ncol + c`` — the native ``{1,0}``-layout output of
the interpolation kernels, with g-points on lanes.

Why: the first-generation kernels hold a column's ENTIRE vertical slab in
VMEM (``(block, nlay*G)`` operands), which

* forces a physical retiling copy per operand — ``(N, G)`` kernel outputs
  must be re-tiled to ``(ncol, nlay*G)`` (measured ~0.23 ms x 12 planes
  per step at the bench shape, the dominant copy class in the round-5
  device trace), and
* shrinks the column block as nlay grows (the reference's 256-layer
  RCEMIP grid quarters the block), trading MXU/VPU efficiency for depth.

Here the grid is ``(ncol//B, nlay)`` with the layer axis innermost: each
grid step streams ONE ``(B, G)`` layer tile per operand through VMEM and
carries the vertical recurrence (radiance / albedo / direct beam) in a
``(B, G)`` scratch across steps — the Pallas accumulation pattern.  VMEM
holds O(B*G) regardless of nlay, so the block never shrinks: deep grids
run at the same per-cell cost as shallow ones (reference analog: the
in-thread sweeps of ``rte_solver_kernels.cu:35-94,196-286`` are equally
depth-blind).  The sequential dependence along nlay is preserved by the
grid's iteration order (last grid dimension fastest).

Sweeps that run in both directions become one pallas_call per direction,
with per-layer intermediates staged in HBM as layer-major planes between
passes — trading O(plane) HBM round-trips (~0.1 ms each at 2048x72x128)
for the retiling copies and the VMEM cap.  Both solvers RECOMPUTE the
per-layer optical quantities in whichever passes need them (trans/fact
for LW; the Meador-Weaver coefficients for SW) instead of staging them:
FLOPs are cheaper than HBM bandwidth here.  The SW solve stages only the
incident direct beam (pass 1) and the four pre-combined adding/flux
quantities c1/c0/a1/s1 (pass 2) — 13 plane round-trips total vs 18 for
the stage-everything form (the round-5 traffic cut).

Flux outputs are broadband-reduced in-kernel and written as
``((nlay+1)*ncol, 1)`` layer-major level rows; the wrappers reshape to
the public ``(ncol, nlev)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import config

_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)


def _pick_block(ncol: int, block: int) -> int:
    """Largest power-of-two <= block that divides ncol (callers pad ncol
    to a multiple of 8 first)."""
    while block > 8 and ncol % block:
        block //= 2
    return block


# ---------------------------------------------------------------------------
# LW no-scatter, one Gauss angle, broadband-reduced.
# ---------------------------------------------------------------------------


def _lw_optics(tau_ref, D, tau_thres):
    """Per-layer optical prep (trans, fact), shared by both sweeps: the up
    pass RECOMPUTES it from tau instead of reading staged trans/fact
    planes — one plane read replaces two writes + two reads of HBM per
    chunk (FLOPs are cheaper than bandwidth here; the reference's
    lw_step_1 stages them because its threads keep them in registers
    across the whole column)."""
    one = tau_ref.dtype.type(1.0)
    tl = tau_ref[...] * D
    trans = jnp.exp(-tl)
    safe = jnp.where(tl == 0.0, one, tl)
    fact = jnp.where(tl > tau_thres,
                     (one - trans) / safe - trans,
                     tl * (0.5 + tl * (-1.0 / 3.0 + tl * 0.125)))
    return trans, fact


def _lw_down_kernel(nlay, D, w, tau_thres,
                    tau_ref, lay_ref, lev_hi_ref, lev_last_ref, inc_ref,
                    dn_body_ref, dn_top_ref, rad_sfc_ref, rad_s):
    l = pl.program_id(1)
    one = tau_ref.dtype.type(1.0)

    @pl.when(l == 0)
    def _():
        rad0 = inc_ref[...] * (1.0 / (2.0 * np.pi * w))
        rad_s[...] = rad0
        dn_top_ref[...] = jnp.sum(rad0, axis=1, keepdims=True)

    trans, fact = _lw_optics(tau_ref, D, tau_thres)
    # lev[l+1]: inner rows for l < nlay-1, the surface boundary piece at
    # the last layer (pieces arrive separately so the caller never
    # concatenates a full (nlev*ncol, G) plane — a measured 0.64 ms copy
    # per chunk at the bench shape).
    lev_dn = jnp.where(l == nlay - 1, lev_last_ref[...], lev_hi_ref[...])
    src_dn = (one - trans) * lev_dn + 2.0 * fact * (lay_ref[...] - lev_dn)
    rad = trans * rad_s[...] + src_dn
    rad_s[...] = rad
    dn_body_ref[...] = jnp.sum(rad, axis=1, keepdims=True)

    @pl.when(l == nlay - 1)
    def _():
        rad_sfc_ref[...] = rad


def _lw_up_kernel(nlay, D, tau_thres,
                  tau_ref, lay_ref, lev_lo_ref, lev_first_ref,
                  emis_ref, ssrc_ref, sjac_ref, rad_sfc_ref,
                  up_body_ref, jac_body_ref, up_sfc_ref, jac_sfc_ref,
                  up_s, jac_s):
    t = pl.program_id(1)
    one = tau_ref.dtype.type(1.0)

    @pl.when(t == 0)
    def _():
        emis = emis_ref[...]
        up0 = rad_sfc_ref[...] * (one - emis) + emis * ssrc_ref[...]
        jac0 = emis * sjac_ref[...]
        up_s[...] = up0
        jac_s[...] = jac0
        up_sfc_ref[...] = jnp.sum(up0, axis=1, keepdims=True)
        jac_sfc_ref[...] = jnp.sum(jac0, axis=1, keepdims=True)

    trans, fact = _lw_optics(tau_ref, D, tau_thres)
    # lev[l] with l = nlay-1-t: inner rows for l > 0, the TOA boundary
    # piece at the top layer.
    lev_up = jnp.where(t == nlay - 1, lev_first_ref[...], lev_lo_ref[...])
    src_up = (one - trans) * lev_up \
        + 2.0 * fact * (lay_ref[...] - lev_up)
    up = trans * up_s[...] + src_up
    jac = trans * jac_s[...]
    up_s[...] = up
    jac_s[...] = jac
    up_body_ref[...] = jnp.sum(up, axis=1, keepdims=True)
    jac_body_ref[...] = jnp.sum(jac, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("ncol", "D", "w", "block"))
def lw_sweep_broadband_lm(tau_lm, lay_lm, lev_lm, sfc_emis, sfc_src,
                          sfc_src_jac, inc_flux, *, ncol: int, D: float,
                          w: float, block: int = 1024):
    """LW no-scatter sweep on LAYER-MAJOR planes.

    tau_lm/lay_lm: (nlay*ncol, G) with cell (c, l) at row l*ncol + c;
    lev_lm: ((nlay+1)*ncol, G) — or a TUPLE of pieces
    (lev0 (ncol, G), lev_inner ((nlay-1)*ncol, G), lev_last (ncol, G)),
    the natural outputs of ``planck_source_lm``; passing pieces avoids
    concatenating a full nlev plane (a measured 0.64 ms copy per chunk).
    The rest (ncol, G).  Returns broadband up, dn, jac each
    (ncol, nlay+1) (top at row 0, matching ``lw_sweep_broadband``)."""
    NG = tau_lm.shape[1]
    nlay = tau_lm.shape[0] // ncol
    dtype = tau_lm.dtype
    if not isinstance(lev_lm, (tuple, list)):
        lev_lm = (jax.lax.slice_in_dim(lev_lm, 0, ncol, axis=0),
                  jax.lax.slice_in_dim(lev_lm, ncol, nlay * ncol, axis=0),
                  jax.lax.slice_in_dim(lev_lm, nlay * ncol,
                                       (nlay + 1) * ncol, axis=0))
    lev0, lev_inner, lev_last = lev_lm
    if nlay == 1:
        lev_inner = lev0   # never selected; placeholder with valid shape

    pad = (-ncol) % 8
    # Pad the column axis of every plane (per layer row-block).
    if pad:
        def padc(a, nrows):
            return jnp.pad(a.reshape(nrows, ncol, NG),
                           ((0, 0), (0, pad), (0, 0))).reshape(-1, NG)
        tau_lm = padc(tau_lm, nlay)
        lay_lm = padc(lay_lm, nlay)
        lev_inner = padc(lev_inner, max(nlay - 1, 1))
        z2 = lambda a: jnp.pad(a, ((0, pad), (0, 0)))
        lev0, lev_last = z2(lev0), z2(lev_last)
        sfc_emis, sfc_src = z2(sfc_emis), z2(sfc_src)
        sfc_src_jac, inc_flux = z2(sfc_src_jac), z2(inc_flux)
    n = ncol + pad
    B = _pick_block(n, block)
    nb = n // B

    lane = lambda: pl.BlockSpec((B, NG), lambda cb, l: (l * nb + cb, 0),
                                memory_space=pltpu.VMEM)
    # lev[l+1] for the down sweep: inner block l for l < nlay-1 (clamped;
    # the kernel substitutes the boundary piece at the last layer).
    inner_hi = pl.BlockSpec(
        (B, NG),
        lambda cb, l: (jnp.clip(l, 0, max(nlay - 2, 0)) * nb + cb, 0),
        memory_space=pltpu.VMEM)
    col2d = pl.BlockSpec((B, NG), lambda cb, l: (cb, 0),
                         memory_space=pltpu.VMEM)
    out_body = pl.BlockSpec((B, 1), lambda cb, l: (l * nb + cb, 0),
                            memory_space=pltpu.VMEM)
    out_col1 = pl.BlockSpec((B, 1), lambda cb, l: (cb, 0),
                            memory_space=pltpu.VMEM)

    dn_body, dn_top, rad_sfc = pl.pallas_call(
        functools.partial(_lw_down_kernel, nlay, dtype.type(D),
                          float(w), dtype.type(config.tau_thres(dtype))),
        grid=(nb, nlay),
        in_specs=[lane(), lane(), inner_hi, col2d, col2d],
        out_specs=[out_body, out_col1, col2d],
        out_shape=[jax.ShapeDtypeStruct((nlay * n, 1), dtype),
                   jax.ShapeDtypeStruct((n, 1), dtype),
                   jax.ShapeDtypeStruct((n, NG), dtype)],
        scratch_shapes=[pltpu.VMEM((B, NG), dtype)],
        compiler_params=_PARAMS,
    )(tau_lm, lay_lm, lev_inner, lev_last, inc_flux)

    rev = lambda: pl.BlockSpec(
        (B, NG), lambda cb, t: ((nlay - 1 - t) * nb + cb, 0),
        memory_space=pltpu.VMEM)
    # lev[l] with l = nlay-1-t for the up sweep: inner block l-1 for
    # l > 0 (clamped; the kernel substitutes the TOA piece at the top).
    inner_lo = pl.BlockSpec(
        (B, NG),
        lambda cb, t: (jnp.clip(nlay - 2 - t, 0, max(nlay - 2, 0)) * nb
                       + cb, 0),
        memory_space=pltpu.VMEM)
    rev_out = pl.BlockSpec((B, 1), lambda cb, t: ((nlay - 1 - t) * nb + cb, 0),
                           memory_space=pltpu.VMEM)
    up_body, jac_body, up_sfc, jac_sfc = pl.pallas_call(
        functools.partial(_lw_up_kernel, nlay, dtype.type(D),
                          dtype.type(config.tau_thres(dtype))),
        grid=(nb, nlay),
        in_specs=[rev(), rev(), inner_lo, col2d, col2d, col2d, col2d,
                  col2d],
        out_specs=[rev_out, rev_out, out_col1, out_col1],
        out_shape=[jax.ShapeDtypeStruct((nlay * n, 1), dtype),
                   jax.ShapeDtypeStruct((nlay * n, 1), dtype),
                   jax.ShapeDtypeStruct((n, 1), dtype),
                   jax.ShapeDtypeStruct((n, 1), dtype)],
        scratch_shapes=[pltpu.VMEM((B, NG), dtype)] * 2,
        compiler_params=_PARAMS,
    )(tau_lm, lay_lm, lev_inner, lev0, sfc_emis, sfc_src, sfc_src_jac,
      rad_sfc)

    scale = dtype.type(np.pi * w)
    # dn body rows hold levels 1..nlay (written on the down sweep), up/jac
    # body rows hold levels 0..nlay-1 (written on the up sweep); the
    # missing boundary level of each is its own (n, 1) output.
    dn = jnp.concatenate(
        [dn_top.reshape(1, n), dn_body.reshape(nlay, n)],
        axis=0).T[:ncol] * scale
    up = jnp.concatenate(
        [up_body.reshape(nlay, n), up_sfc.reshape(1, n)],
        axis=0).T[:ncol] * scale
    jac = jnp.concatenate(
        [jac_body.reshape(nlay, n), jac_sfc.reshape(1, n)],
        axis=0).T[:ncol] * scale
    return up, dn, jac


# ---------------------------------------------------------------------------
# SW two-stream + adding, broadband-reduced: three layer-grid passes.
# ---------------------------------------------------------------------------


def _sw_dir_kernel(nlay, tau_ref, mu0_ref, incdir_ref,
                   fdir_in_ref, dir_body_ref, dir_top_ref, fdir_s):
    """Direct-beam down sweep ONLY (rte_solver_kernels.cu:543-560): stages
    the per-layer INCIDENT beam fdir_in (the value entering layer l) for
    the adding pass, which recomputes the Meador-Weaver coefficients
    in-register instead of reading four staged coefficient planes — the
    round-5 traffic cut (18 -> 13 plane round-trips for the SW solve;
    see sw_2stream_broadband_lm)."""
    l = pl.program_id(1)
    mu0 = mu0_ref[...]

    @pl.when(l == 0)
    def _():
        f0 = incdir_ref[...] * mu0
        fdir_s[...] = f0
        dir_top_ref[...] = jnp.sum(f0, axis=1, keepdims=True)

    fdir = fdir_s[...]
    fdir_in_ref[...] = fdir
    fdir = jnp.exp(-tau_ref[...] / mu0) * fdir
    fdir_s[...] = fdir
    dir_body_ref[...] = jnp.sum(fdir, axis=1, keepdims=True)


def _sw_coeff_adding_kernel(nlay, kmin, tmin,
                            tau_ref, ssa_ref, g_ref, fdir_in_ref, mu0_ref,
                            adir_ref, adif_ref, incdif_ref,
                            c1_ref, c0_ref, a1_ref, s1_ref, up_top_ref,
                            alb_s, src_s):
    """Meador-Weaver coefficients (recomputed from tau/ssa/g — FLOPs are
    cheaper than staging four planes) fused with the adding-method
    albedo/source up sweep (:216-227).  Emits per layer the EXACT
    quantities the flux down-sweep consumes:

      c1 = tdif * denom,  c0 = (rdif*src_in + sdn) * denom,
      a1 = alb_in,        s1 = src_in       (denom = 1/(1 - rdif*alb_in))

    where alb_in/src_in are the level-(l+1) adding state (this step's
    carry BEFORE its update) — so the down sweep is a pure 2-term
    recurrence with no boundary substitution and no coefficient reads.
    The t == nlay-1 step also emits the TOA up flux."""
    t = pl.program_id(1)
    dt = tau_ref.dtype
    one = dt.type(1.0)
    mu0 = mu0_ref[...]

    tau = tau_ref[...]
    ssa = ssa_ref[...]
    g = g_ref[...]
    gamma1 = (8.0 - ssa * (5.0 + 3.0 * g)) * 0.25
    gamma2 = 3.0 * (ssa * (1.0 - g)) * 0.25
    gamma3 = (2.0 - 3.0 * mu0 * g) * 0.25
    gamma4 = one - gamma3
    alpha1 = gamma1 * gamma4 + gamma2 * gamma3
    alpha2 = gamma1 * gamma3 + gamma2 * gamma4

    k = jnp.sqrt(jnp.maximum((gamma1 - gamma2) * (gamma1 + gamma2), kmin))
    exp_mkt = jnp.exp(-tau * k)
    exp_m2kt = exp_mkt * exp_mkt
    rt_term = one / (k * (one + exp_m2kt) + gamma1 * (one - exp_m2kt))
    rdif = rt_term * gamma2 * (one - exp_m2kt)
    tdif = rt_term * 2.0 * k * exp_mkt
    t_noscat = jnp.exp(-tau / mu0)

    k_mu = k * mu0
    k_g3 = k * gamma3
    k_g4 = k * gamma4
    fact = jnp.where(jnp.abs(one - k_mu * k_mu) > tmin,
                     one - k_mu * k_mu, tmin)
    rt2 = ssa * rt_term / fact
    r_dir = rt2 * ((one - k_mu) * (alpha2 + k_g3)
                   - (one + k_mu) * (alpha2 - k_g3) * exp_m2kt
                   - 2.0 * (k_g3 - alpha2 * k_mu) * exp_mkt * t_noscat)
    t_dir = -rt2 * ((one + k_mu) * (alpha1 + k_g4) * t_noscat
                    - (one - k_mu) * (alpha1 - k_g4) * exp_m2kt * t_noscat
                    - 2.0 * (k_g4 + alpha1 * k_mu) * exp_mkt)
    # Ukkonen clamp (energy conservation in single precision).
    r_dir = jnp.maximum(tmin, jnp.minimum(r_dir, one - t_noscat))
    t_dir = jnp.maximum(tmin, jnp.minimum(t_dir, one - t_noscat - r_dir))

    fdir = fdir_in_ref[...]
    sup = r_dir * fdir
    sdn = t_dir * fdir

    @pl.when(t == 0)
    def _():
        alb_s[...] = adif_ref[...]
        # Surface source: the beam EXITS the bottom layer attenuated.
        src_s[...] = (t_noscat * fdir) * adir_ref[...]

    alb = alb_s[...]
    src = src_s[...]
    denom = one / (one - rdif * alb)
    td = tdif * denom
    c1_ref[...] = td
    c0_ref[...] = (rdif * src + sdn) * denom
    a1_ref[...] = alb
    s1_ref[...] = src
    src_new = sup + td * (src + alb * sdn)
    alb_new = rdif + tdif * td * alb
    alb_s[...] = alb_new
    src_s[...] = src_new

    @pl.when(t == nlay - 1)
    def _():
        dn0 = incdif_ref[...]
        up_top_ref[...] = jnp.sum(dn0 * alb_new + src_new,
                                  axis=1, keepdims=True)


def _sw_flux_dn_kernel(nlay, c1_ref, c0_ref, a1_ref, s1_ref, incdif_ref,
                       up_body_ref, dn_body_ref, dn_top_ref, dn_s):
    """Diffuse-flux down sweep (:231-243) on the pre-combined adding
    quantities: dn <- c1*dn + c0, up[l+1] = dn*a1 + s1."""
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        dn0 = incdif_ref[...]
        dn_s[...] = dn0
        dn_top_ref[...] = jnp.sum(dn0, axis=1, keepdims=True)

    dn = c1_ref[...] * dn_s[...] + c0_ref[...]
    dn_s[...] = dn
    up_body_ref[...] = jnp.sum(dn * a1_ref[...] + s1_ref[...],
                               axis=1, keepdims=True)
    dn_body_ref[...] = jnp.sum(dn, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("ncol", "block"))
def sw_2stream_broadband_lm(tau_lm, ssa_lm, g_lm, mu0, sfc_alb_dir,
                            sfc_alb_dif, inc_flux_dir, inc_flux_dif=None,
                            *, ncol: int, block: int = 1024):
    """SW two-stream + adding on LAYER-MAJOR planes.

    tau_lm/ssa_lm/g_lm: (nlay*ncol, G), mu0 (ncol,), albedos/inc fluxes
    (ncol, G).  Returns broadband up, dn (diffuse+direct), dir each
    (ncol, nlay+1), matching ``sw_2stream_broadband``."""
    NG = tau_lm.shape[1]
    nlay = tau_lm.shape[0] // ncol
    dtype = tau_lm.dtype
    if inc_flux_dif is None:
        inc_flux_dif = jnp.zeros_like(inc_flux_dir)

    pad = (-ncol) % 8
    if pad:
        def padc(a, nrows):
            return jnp.pad(a.reshape(nrows, ncol, NG),
                           ((0, 0), (0, pad), (0, 0))).reshape(-1, NG)
        tau_lm, ssa_lm, g_lm = (padc(a, nlay) for a in (tau_lm, ssa_lm, g_lm))
        z2 = lambda a: jnp.pad(a, ((0, pad), (0, 0)))
        sfc_alb_dir, sfc_alb_dif = z2(sfc_alb_dir), z2(sfc_alb_dif)
        inc_flux_dir, inc_flux_dif = z2(inc_flux_dir), z2(inc_flux_dif)
        mu0 = jnp.pad(mu0, ((0, pad),), constant_values=1.0)
    n = ncol + pad
    B = _pick_block(n, block)
    nb = n // B

    lane = lambda: pl.BlockSpec((B, NG), lambda cb, l: (l * nb + cb, 0),
                                memory_space=pltpu.VMEM)
    rev = lambda: pl.BlockSpec(
        (B, NG), lambda cb, t: ((nlay - 1 - t) * nb + cb, 0),
        memory_space=pltpu.VMEM)
    col2d = pl.BlockSpec((B, NG), lambda cb, l: (cb, 0),
                         memory_space=pltpu.VMEM)
    col1 = pl.BlockSpec((B, 1), lambda cb, l: (cb, 0),
                        memory_space=pltpu.VMEM)
    out_body = pl.BlockSpec((B, 1), lambda cb, l: (l * nb + cb, 0),
                            memory_space=pltpu.VMEM)
    out_col1 = pl.BlockSpec((B, 1), lambda cb, l: (cb, 0),
                            memory_space=pltpu.VMEM)
    rev_lane_out = pl.BlockSpec(
        (B, NG), lambda cb, t: ((nlay - 1 - t) * nb + cb, 0),
        memory_space=pltpu.VMEM)
    plane = lambda: jax.ShapeDtypeStruct((nlay * n, NG), dtype)
    lvl1 = lambda: jax.ShapeDtypeStruct((nlay * n, 1), dtype)
    coln = lambda w=1: jax.ShapeDtypeStruct((n, w), dtype)

    fdir_in, dir_body, dir_top = pl.pallas_call(
        functools.partial(_sw_dir_kernel, nlay),
        grid=(nb, nlay),
        in_specs=[lane(), col1, col2d],
        out_specs=[lane(), out_body, out_col1],
        out_shape=[plane(), lvl1(), coln()],
        scratch_shapes=[pltpu.VMEM((B, NG), dtype)],
        compiler_params=_PARAMS,
    )(tau_lm, mu0.reshape(-1, 1), inc_flux_dir)

    c1, c0, a1, s1, up_top = pl.pallas_call(
        functools.partial(_sw_coeff_adding_kernel, nlay,
                          dtype.type(config.k_min(dtype)),
                          dtype.type(config.eps(dtype))),
        grid=(nb, nlay),
        in_specs=[rev(), rev(), rev(), rev(), col1, col2d, col2d, col2d],
        out_specs=[rev_lane_out, rev_lane_out, rev_lane_out, rev_lane_out,
                   out_col1],
        out_shape=[plane(), plane(), plane(), plane(), coln()],
        scratch_shapes=[pltpu.VMEM((B, NG), dtype)] * 2,
        compiler_params=_PARAMS,
    )(tau_lm, ssa_lm, g_lm, fdir_in, mu0.reshape(-1, 1), sfc_alb_dir,
      sfc_alb_dif, inc_flux_dif)

    up_body, dn_body, dn_top = pl.pallas_call(
        functools.partial(_sw_flux_dn_kernel, nlay),
        grid=(nb, nlay),
        in_specs=[lane(), lane(), lane(), lane(), col2d],
        out_specs=[out_body, out_body, out_col1],
        out_shape=[lvl1(), lvl1(), coln()],
        scratch_shapes=[pltpu.VMEM((B, NG), dtype)],
        compiler_params=_PARAMS,
    )(c1, c0, a1, s1, inc_flux_dif)

    fdir = jnp.concatenate(
        [dir_top.reshape(1, n), dir_body.reshape(nlay, n)], axis=0).T[:ncol]
    up = jnp.concatenate(
        [up_top.reshape(1, n), up_body.reshape(nlay, n)], axis=0).T[:ncol]
    dn = jnp.concatenate(
        [dn_top.reshape(1, n), dn_body.reshape(nlay, n)], axis=0).T[:ncol]
    return up, dn + fdir, fdir
