"""Forward Monte-Carlo ray tracer (3D cloudy domains) — TPU-native.

Re-design of the reference's null-collision (Woodcock) delta-tracking
tracer (``src_kernels_cuda_rt/raytracer_kernels.cu`` +
``src_cuda_rt/Raytracer.cu``) for SIMD execution:

* the CUDA design runs 256x512 persistent threads, each looping photons and
  branching per event; the TPU design launches **one lane per photon**
  (pixels x photons-per-pixel, pixel-stratified start positions) and steps
  *all* photons together through a ``lax.while_loop`` whose body evaluates
  every event type with masks — divergence costs idle lanes instead of
  warp splits,
* cuRAND Sobol/XORWOW becomes counter-based ``jax.random`` (threefry), one
  fresh key fold per step,
* ``atomicAdd`` scoring becomes masked scatter-adds (``.at[].add``) into the
  count fields carried through the loop,
* the max-k null-collision acceleration grid (``create_knull_grid``,
  Raytracer.cu:40-75) is a block max-reduction computed once per g-point.

Physics preserved exactly: Iwabuchi 2006 absorption weighting with Russian
roulette at w < 0.5, Rayleigh / Henyey-Greenstein / Mie-LUT phase sampling,
Lambertian surface, cyclic x/y boundaries, independent-column mode, photon
kinds (direct/diffuse) split by the two-stream TOD fluxes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config

W_THRES = 0.5  # Russian-roulette threshold (raytracer_kernels.cu:11)


def _resolve_respawn_mode(mode: str) -> str:
    """``"auto"`` -> env > persisted autotune winner (tuning/tune_rt.py,
    the reference's rte_rrtmgp_kernel_tuning.txt analog) > ``"fifo"``."""
    if mode != "auto":
        return mode
    import os

    env = os.environ.get("RTE_RRTMGP_RT_RESPAWN")
    if env:
        return env
    try:
        from ..utils import tuner

        t = tuner.best_workload_opts("rt_trace") or {}
        return t.get("respawn_mode") or "fifo"
    except Exception:
        return "fifo"


class RaytracerOutput(NamedTuple):
    flux_toa_down: object   # (ny, nx) W m-2
    flux_tod_up: object
    flux_sfc_dir: object
    flux_sfc_dif: object
    flux_sfc_up: object
    flux_abs_dir: object    # (nz, ny, nx) W m-3
    flux_abs_dif: object


def _coarse_reduce_axis(a, axis: int, k: int, op):
    """Reduce a fine axis of length n onto k coarse cells, where each fine
    cell contributes to every coarse cell it geometrically overlaps (the
    reference's overlapping-range loop, Raytracer.cu:55-73).  op is
    jax.ops.segment_max or segment_min."""
    n = a.shape[axis]
    assert k <= n, (k, n)
    i = np.arange(n)
    ids_left = (i * k) // n
    ids_right = np.minimum(k - 1, ((i + 1) * k - 1) // n)
    a2 = jnp.moveaxis(a, axis, 0)
    lo = op(a2, jnp.asarray(ids_left), num_segments=k)
    hi = op(a2, jnp.asarray(ids_right), num_segments=k)
    out = jnp.maximum(lo, hi) if op is jax.ops.segment_max else jnp.minimum(lo, hi)
    return jnp.moveaxis(out, 0, axis)


def coarse_grid_reduce(k_ext, kn_shape, op):
    out = k_ext
    for axis, k in enumerate(kn_shape):
        out = _coarse_reduce_axis(out, axis, k, op)
    return out


def create_knull_grid(k_ext, kn_shape, k_ext_null_min=1e-3):
    """Max-k acceleration grid (Raytracer.cu:40-75).  k_ext: (nz, ny, nx);
    kn_shape: (knz, kny, knx) coarse dims (any sizes <= the fine grid)."""
    return jnp.maximum(coarse_grid_reduce(k_ext, kn_shape, jax.ops.segment_max),
                       k_ext_null_min)


def _rayleigh_sample(u):
    """Analytic inverse CDF of the Rayleigh phase function
    (raytracer_functions.h:72-78)."""
    q = 4.0 * u - 2.0
    d = 1.0 + q * q
    cbrt = jnp.cbrt(-q + jnp.sqrt(d))
    return cbrt - 1.0 / cbrt


def _henyey_sample(g, u):
    """Henyey-Greenstein inverse CDF (raytracer_functions.h:81-87)."""
    a = (1.0 - g * g) ** 2
    b = 2.0 * g * (2.0 * u * g + 1.0 - g) ** 2
    c = -g / 2.0 - 1.0 / (2.0 * g)
    return -(a / b) - c


def _mie_sample(mie_cdf, mie_ang, u, r_eff):
    """Mie scattering angle from cdf+angle LUTs
    (raytracer_functions.h:109-125).  mie_cdf: (n_mie,) descending;
    mie_ang: (n_re, n_mie).  Returns cos(theta)."""
    n_re, n_mie = mie_ang.shape
    r_idx = jnp.clip((r_eff - 2.5).astype(jnp.int32), 0, n_re - 2)
    r_rest = jnp.mod(r_eff - 2.5, 1.0)
    # mie_cdf is descending; find i with cdf[i] >= u > cdf[i+1].
    i = jnp.clip(jnp.searchsorted(-mie_cdf, -u, side="right") - 1, 0, n_mie - 2)
    c0 = mie_cdf[i]
    c1 = mie_cdf[i + 1]
    dr = jnp.abs(c1 - c0)
    w0 = jnp.abs(u - c1) / jnp.maximum(dr, 1e-30)
    w1 = jnp.abs(c0 - u) / jnp.maximum(dr, 1e-30)
    ang_lwr = w0 * mie_ang[r_idx, i] + w1 * mie_ang[r_idx, i + 1]
    ang_upr = w0 * mie_ang[r_idx + 1, i] + w1 * mie_ang[r_idx + 1, i + 1]
    return jnp.cos(ang_lwr * (1.0 - r_rest) + ang_upr * r_rest)


def _mie_phase_value(mie_phase_ang, mie_phase, scat_ang, r_eff):
    """Mie phase-function VALUE at scattering angle ``scat_ang`` (radians)
    — the next-event-estimation weight (mie_interpolate_phase_table,
    raytracer_functions.h:128-147).  ``mie_phase_ang``: (n_ang,) equally
    spaced angles 0..pi; ``mie_phase``: (n_re, n_ang) phase values per
    effective radius (r_eff grid 2.5..2.5+n_re-1 um, like the cdf tables).
    Returns phase per steradian."""
    n_re, n_ang = mie_phase.shape
    r_idx = jnp.clip((r_eff - 2.5).astype(jnp.int32), 0, n_re - 2)
    r_rest = jnp.mod(r_eff - 2.5, 1.0)
    d_ang = mie_phase_ang[1] - mie_phase_ang[0]     # uniform grid spacing
    i = jnp.clip((scat_ang / d_ang).astype(jnp.int32), 0, n_ang - 2)
    a0 = mie_phase_ang[i]
    a1 = mie_phase_ang[i + 1]
    dr = jnp.maximum(jnp.abs(a1 - a0), 1e-30)
    w0 = jnp.abs(scat_ang - a1) / dr
    w1 = jnp.abs(a0 - scat_ang) / dr
    p_lwr = w0 * mie_phase[r_idx, i] + w1 * mie_phase[r_idx, i + 1]
    p_upr = w0 * mie_phase[r_idx + 1, i] + w1 * mie_phase[r_idx + 1, i + 1]
    return p_lwr * (1.0 - r_rest) + p_upr * r_rest


def _scatter_direction(direction, cos_scat, u_phi):
    """Rotate ``direction`` by scattering angle with random azimuth
    (raytracer_kernels.cu:385-404).  direction: (N, 3)."""
    eps = config.eps(direction.dtype)
    sin_scat = jnp.maximum(0.0, jnp.sqrt(1.0 - cos_scat ** 2 + eps))

    ax, ay, az = jnp.abs(direction[:, 0]), jnp.abs(direction[:, 1]), jnp.abs(direction[:, 2])
    # Pick the smallest component as the helper axis.
    use_x = (ax < ay) & (ax < az)
    use_y = (~use_x) & (ay < az)
    t1 = jnp.stack([use_x.astype(direction.dtype),
                    use_y.astype(direction.dtype),
                    (~(use_x | use_y)).astype(direction.dtype)], axis=1)
    proj = jnp.sum(t1 * direction, axis=1, keepdims=True)
    t1 = t1 - direction * proj
    t1 = t1 / jnp.linalg.norm(t1, axis=1, keepdims=True)
    t2 = jnp.cross(direction, t1)

    phi = 2.0 * jnp.pi * u_phi
    new_dir = (cos_scat[:, None] * direction
               + sin_scat[:, None] * (jnp.sin(phi)[:, None] * t1
                                      + jnp.cos(phi)[:, None] * t2))
    return new_dir


def _small_lookup(table, idx):
    """table[idx] for a TINY (G,) table without a gather op: a gather's
    per-index cost on TPU is ~hundreds of cycles regardless of table size
    (tools/microbench_rt_mem.py), while a one-hot contraction over a
    G-wide axis is pure vector work."""
    G = table.shape[0]
    oh = (idx[:, None] == jnp.arange(G, dtype=idx.dtype)[None, :])
    return jnp.sum(jnp.where(oh, table[None, :], 0), axis=1)


class _PhotonState(NamedTuple):
    pos: object          # (N, 3)
    direction: object    # (N, 3)
    weight: object       # (N,)
    is_direct: object    # (N,) bool
    alive: object        # (N,) bool
    tau: object          # (N,) remaining sampled optical path
    d_max: object        # (N,) distance to knull-cell boundary (0 = recompute)
    k_null: object       # (N,)
    transition: object   # (N,) bool
    count: object        # (N,) photons already launched by this lane
                         # (stride modes; None in fifo mode)
    lane_id: object      # (N,) ORIGINAL lane index (pool identity; stable
                         # across width compaction; None in fifo mode)
    gid: object          # (N,) g-point index of the lane's CURRENT photon
                         # (pooled windows; constant 0 when G == 1)


def trace_rays(key,
               k_ext, k_sca_gas, k_sca_cld, k_sca_aer, asy_cld, asy_aer,
               r_eff, surface_albedo, kn_grid_shape,
               grid_d, tod_inc_direct, tod_inc_diffuse, sun_direction,
               photons_per_pixel: int,
               independent_column: bool = False,
               mie_cdf: Optional[object] = None,
               mie_ang: Optional[object] = None,
               max_steps: int = 50_000,
               k_ext_null_min: float = 1e-3,
               photons_per_lane: Optional[int] = None,
               compact: bool = True,
               compact_floor: int = 128,
               respawn_mode: str = "fifo",
               return_aux: bool = False) -> RaytracerOutput:
    """Trace one spectral band/g-point through a 3D domain.

    All 3D fields are (nz, ny, nx) with z the vertical (index 0 at the
    surface); ``surface_albedo``: (ny, nx); ``grid_d``: (dz, dy, dx) cell
    sizes in m; ``sun_direction``: unit vector with negative z (downward).
    ``tod_inc_direct/diffuse``: W m-2 entering the domain top (from the
    1D two-stream solve above the domain, Radiation_solver_rt.cu:903-956).

    ``photons_per_lane``: each SIMD lane traces this many photons
    sequentially, respawning as soon as its current photon dies (the
    analog of the reference's photons-per-thread loop,
    Raytracer.cu:344-374).  Idle-lane waste from the long-lived-photon
    tail is amortized over the lane's whole quota.  Default: the largest
    quota (<= 8) that still keeps >= 32k lanes in flight — below ~32k
    lanes the per-iteration dispatch latency dominates the step (the
    width threshold measured in PERF.md), so small workloads run quota 1.

    Returns fluxes in W m-2 (2D) / W m-3 (3D absorption).
    """
    return _trace_impl(
        key, k_ext[None], k_sca_gas[None], k_sca_cld[None],
        k_sca_aer[None], asy_cld[None], asy_aer[None], r_eff,
        surface_albedo[None], kn_grid_shape, grid_d,
        jnp.asarray(tod_inc_direct, k_ext.dtype)[None],
        jnp.asarray(tod_inc_diffuse, k_ext.dtype)[None], sun_direction,
        photons_per_pixel=photons_per_pixel,
        independent_column=independent_column,
        mie_cdf=mie_cdf, mie_ang=mie_ang, max_steps=max_steps,
        k_ext_null_min=k_ext_null_min, photons_per_lane=photons_per_lane,
        compact=compact, compact_floor=compact_floor,
        return_aux=return_aux, respawn_mode=respawn_mode)


def trace_rays_pooled(key,
                      k_ext, k_sca_gas, k_sca_cld, k_sca_aer,
                      asy_cld, asy_aer,
                      r_eff, surface_albedo, kn_grid_shape,
                      grid_d, tod_inc_direct, tod_inc_diffuse,
                      sun_direction,
                      photons_per_pixel: int,
                      independent_column: bool = False,
                      mie_cdf: Optional[object] = None,
                      mie_ang: Optional[object] = None,
                      max_steps: int = 200_000,
                      k_ext_null_min: float = 1e-3,
                      photons_per_lane: Optional[int] = None,
                      compact: bool = True,
                      compact_floor: int = 128,
                      respawn_mode: str = "fifo",
                      return_aux: bool = False) -> RaytracerOutput:
    """Trace a WINDOW of G g-points in ONE photon loop (spectral pooling).

    All optics fields carry a leading spectral axis: ``k_*``/``asy_*``
    are (G, nz, ny, nx), ``surface_albedo`` (G, ny, nx),
    ``tod_inc_direct/diffuse`` (G,).  ``r_eff`` stays (nz, ny, nx) —
    effective radius is spectrally flat.  ``mie_cdf``/``mie_ang`` are the
    single band's tables (pooled windows must not cross band boundaries
    when Mie is on).

    Why: the per-g-point tracer pays the long-walk TAIL once per g-point
    — measured 62% of all while iterations process the last <8k photons
    (tools/diag_rt_tail.py, PERF.md round 4).  Pooling assigns lanes to
    photons from the WHOLE window's launch pool, so lanes respawn into
    the next g-point's photons the moment theirs die: the vector stays
    saturated until the window's entire pool is dry and the tail is paid
    once per window instead of once per g-point.  This is the SIMD
    equivalent of the reference's persistent-thread photon loop
    (raytracer_kernels.cu:120-404) extended across its host-side g-point
    loop (Radiation_solver_rt.cu:903-956).

    Scoring is flux-weighted at scatter time (each lane's deposit is
    scaled by its g-point's W m-2 per photon), so the returned
    RaytracerOutput holds the window's SUMMED physical fluxes
    (W m-2 / W m-3) directly.
    """
    return _trace_impl(
        key, k_ext, k_sca_gas, k_sca_cld, k_sca_aer, asy_cld, asy_aer,
        r_eff, surface_albedo, kn_grid_shape, grid_d,
        jnp.asarray(tod_inc_direct, k_ext.dtype),
        jnp.asarray(tod_inc_diffuse, k_ext.dtype), sun_direction,
        photons_per_pixel=photons_per_pixel,
        independent_column=independent_column,
        mie_cdf=mie_cdf, mie_ang=mie_ang, max_steps=max_steps,
        k_ext_null_min=k_ext_null_min, photons_per_lane=photons_per_lane,
        compact=compact, compact_floor=compact_floor,
        return_aux=return_aux, respawn_mode=respawn_mode)


def _trace_impl(key,
                k_ext, k_sca_gas, k_sca_cld, k_sca_aer, asy_cld, asy_aer,
                r_eff, surface_albedo, kn_grid_shape,
                grid_d, tod_inc_direct, tod_inc_diffuse, sun_direction,
                photons_per_pixel: int,
                independent_column: bool,
                mie_cdf, mie_ang, max_steps: int,
                k_ext_null_min: float,
                photons_per_lane,
                compact: bool, compact_floor: int,
                return_aux: bool, respawn_mode: str = "fifo"):
    """Shared G-aware tracer core (see trace_rays / trace_rays_pooled)."""
    respawn_mode = _resolve_respawn_mode(respawn_mode)
    if respawn_mode not in ("fifo", "arith", "pool"):
        raise ValueError(f"unknown respawn_mode {respawn_mode!r}; "
                         "expected 'fifo', 'arith', 'pool', or 'auto'")
    dtype = k_ext.dtype
    eps = config.eps(dtype)
    G, nz, ny, nx = k_ext.shape
    ncell = ny * nx
    ncol = ncell * nz                       # cells per g-point
    n_photons_g = ncell * photons_per_pixel
    n_photons = G * n_photons_g
    # Photon ids and flat accumulator indices are int32 on purpose (TPU
    # gathers/scatters want 32-bit indices); guard the ranges explicitly.
    if n_photons >= 2 ** 31 or 2 * ncell * nz + 4 * ncell >= 2 ** 31:
        raise ValueError(
            f"photon pool too large for int32 ids: G={G} ncell={ncell} "
            f"ppp={photons_per_pixel} -> n_photons={n_photons}")
    if photons_per_lane is None:
        if G == 1:
            photons_per_lane = max(1, min(8, photons_per_pixel,
                                          n_photons // 32768))
        else:
            photons_per_lane = max(1, n_photons // 32768)
    while n_photons % photons_per_lane:
        photons_per_lane -= 1
    ppl = photons_per_lane
    n_lanes = n_photons // ppl
    grid_d = jnp.asarray(grid_d, dtype)
    dz, dy, dx = grid_d[0], grid_d[1], grid_d[2]
    size_z, size_y, size_x = nz * dz, ny * dy, nx * dx
    s_min = jnp.maximum(size_z, jnp.maximum(size_y, size_x)) * eps

    knz, kny, knx = kn_grid_shape
    kn_ncell = knz * kny * knx
    k_null_grid = jax.vmap(
        lambda k: create_knull_grid(k, kn_grid_shape, k_ext_null_min))(k_ext)
    kn_d = (size_z / knz, size_y / kny, size_x / knx)

    sun_direction = jnp.asarray(sun_direction, dtype)
    tod_dir = jnp.asarray(tod_inc_direct, dtype)       # (G,)
    tod_dif = jnp.asarray(tod_inc_diffuse, dtype)
    diff_frac = tod_dif / jnp.maximum(tod_dir + tod_dif, eps)
    # W m-2 credited per photon of each g-point; deposits are scaled by
    # this at scatter time so pooled windows can share one accumulator.
    flux_per_ray = (tod_dir + tod_dif) / photons_per_pixel   # (G,)

    # One packed row per cell -> a single row gather per step instead of
    # six element gathers (TPU gathers cost per INDEX, not per byte).
    # The 8th slot carries the COLUMN's surface albedo: the crossing and
    # collision branches are disjoint per lane, so one merged row gather
    # (index = surface pixel for crossing lanes, collision cell otherwise)
    # also serves the surface-reflection albedo read — the separate
    # (ncell,) gather measured as expensive as the whole 8-wide row gather
    # (per-INDEX cost; tools/profile_rt.py trace, PERF.md round 3).
    # Pooled windows stack the G g-points' rows: row = g*ncell*nz + cell.
    reff_col = (r_eff.reshape(-1) if r_eff is not None
                else jnp.zeros(ncol, dtype))
    alb = surface_albedo.reshape(G, ncell).astype(dtype)
    fields = jnp.concatenate([
        k_ext.reshape(G, ncol, 1), k_sca_gas.reshape(G, ncol, 1),
        k_sca_cld.reshape(G, ncol, 1), k_sca_aer.reshape(G, ncol, 1),
        asy_cld.reshape(G, ncol, 1), asy_aer.reshape(G, ncol, 1),
        jnp.broadcast_to(reff_col[None, :, None], (G, ncol, 1)),
        jnp.broadcast_to(jnp.tile(alb, (1, nz))[:, :, None], (G, ncol, 1)),
    ], axis=2).reshape(G * ncol, 8)
    # Force ONE materialized row table: without the barrier XLA may keep
    # `fields` as a concatenate-of-broadcasts and decompose the in-loop
    # row gather into one gather PER SOURCE OPERAND (per-index cost x8).
    fields = jax.lax.optimization_barrier(fields)
    knull_flat = k_null_grid.reshape(-1)               # (G*kn_ncell,)
    use_mie = mie_cdf is not None

    # Launch-state construction.  Every photon id in [0, n_photons) is
    # launched exactly once, so toa_down is credited in full up front
    # (exact whenever the loop runs to natural termination; the max_steps
    # fuse is a safety net far past any real walk length).  Pool order is
    # g-major: pid -> g = pid // n_photons_g, pixel = pid % ncell.
    #
    # respawn_mode:
    # * "fifo" (default): a GLOBAL photon queue — the SIMD analog of the
    #   reference's persistent-thread photon counter
    #   (raytracer_kernels.cu:120-134).  Respawning lanes take the next
    #   queue ids (carried scalar + cumsum rank over this step's dying
    #   lanes), so (a) load balance is perfect — a lane with one long
    #   photon never strands a static quota, and (b) in pooled windows the
    #   in-flight pid window stays TIGHT, keeping the row-gather's index
    #   locality (the measured G=8 gather cost was 4x the G=1 cost purely
    #   from index spread).  Launch states are recomputed arithmetically
    #   from the id + five fresh per-step uniforms.
    # * "arith": static stride assignment (pid = lane + n_lanes*count),
    #   launch states recomputed arithmetically.
    # * "pool": stride assignment + precomputed-pool row gather (round-3
    #   design) — the gather measured as the top per-iteration op.
    def launch_state(pid, u5row):
        """Stratified launch state for photon ids ``pid`` from 5 uniforms
        (rows of shape pid.shape)."""
        g = pid // n_photons_g
        pix = pid % ncell
        px = (pix % nx).astype(dtype)
        py = (pix // nx).astype(dtype)
        lpos = jnp.stack([(px + u5row[0]) * dx, (py + u5row[1]) * dy,
                          jnp.full(pid.shape, size_z - s_min, dtype)],
                         axis=1)
        ldirect = u5row[2] >= (diff_frac[0] if G == 1
                               else _small_lookup(diff_frac, g))
        mu_s = jnp.sqrt(u5row[3])
        az_s = 2.0 * jnp.pi * u5row[4]
        dif_dir = jnp.stack([mu_s * jnp.sin(az_s), mu_s * jnp.cos(az_s),
                             -jnp.sqrt(1.0 - mu_s ** 2 + eps)], axis=1)
        ldir = jnp.where(ldirect[:, None], sun_direction[None, :], dif_dir)
        return lpos, ldir, ldirect, g

    pid_all = jnp.arange(n_photons, dtype=jnp.int32)
    g_all = pid_all // n_photons_g
    pix_all = pid_all % ncell
    key, k0 = jax.random.split(key)
    if respawn_mode == "pool":
        u5 = jax.random.uniform(k0, (5, n_photons), dtype)
        pool_pos, pool_dir, pool_direct, _ = launch_state(pid_all, u5)
        pool = jnp.concatenate(
            [pool_pos, pool_dir, pool_direct[:, None].astype(dtype)],
            axis=1)
    else:
        u5 = jax.random.uniform(k0, (5, n_lanes), dtype)
        pool_pos, pool_dir, pool_direct, _ = launch_state(
            pid_all[:n_lanes], u5)

    fifo = respawn_mode == "fifo"
    state = _PhotonState(
        pos=pool_pos[:n_lanes], direction=pool_dir[:n_lanes],
        weight=jnp.ones(n_lanes, dtype),
        is_direct=pool_direct[:n_lanes],
        alive=jnp.ones(n_lanes, dtype=bool),
        tau=jnp.zeros(n_lanes, dtype),
        d_max=jnp.zeros(n_lanes, dtype),
        k_null=jnp.ones(n_lanes, dtype),
        transition=jnp.zeros(n_lanes, dtype=bool),
        count=None if fifo else jnp.zeros(n_lanes, jnp.int32),
        lane_id=None if fifo else jnp.arange(n_lanes, dtype=jnp.int32),
        gid=g_all[:n_lanes],
    )
    counts = dict(
        toa_down=jnp.zeros(ncell, dtype).at[pix_all].add(
            flux_per_ray[g_all]),
        # one packed FLAT accumulator: entries 2*r+c for cell rows
        # r in [0, ncell*nz) with c=(0 absorb_dir, 1 absorb_dif), then a
        # per-pixel block at offset 2*ncell*nz with 4 channels
        # (0 tod_up, 1 sfc_dir, 2 sfc_dif, 3 sfc_up).  Absorption rows
        # get exactly the 2 channels they use — the round-5 device trace
        # showed the while-carried accumulator MIGRATING memory spaces
        # around the scatter every iteration (~0.11 ms/iter of 16.8 MB
        # copies), so its size is on the per-iteration critical path, not
        # just footprint.  Measured (tools/microbench_scatter.py, v5e):
        # flat single-element scatter-adds cost ~19-26 cycles/index where
        # the previous (N, 4) row scatter cost ~84-87 — the row form made
        # XLA's serial RMW loop move 4-wide vectors per index.
        acc=jnp.zeros(2 * ncell * nz + 4 * ncell, dtype),
    )

    def cell_index(p, d, n, nmax):
        i = (p / d).astype(jnp.int32)
        return jnp.clip(i, 0, nmax - 1)

    def body(carry):
        state, counts, key, step, next_pid = carry
        width = state.alive.shape[0]
        key, ku = jax.random.split(key)
        # Six draws per step: rows 3/4 are SHARED between the surface branch
        # (Lambertian mu/azimuth) and the collision branch (scatter
        # type/angle) — a lane is in exactly one branch per step, so each
        # uniform is consumed once and independence is preserved.  With
        # arithmetic respawn, five more rows feed the respawn launch
        # states (consumed only by lanes whose photon died this step).
        n_rows = 6 if respawn_mode == "pool" else 11
        u = jax.random.uniform(ku, (n_rows, width), dtype)

        pos, direction = state.pos, state.direction
        alive = state.alive

        # 1. (re)establish knull cell + distance to its boundary.
        need_grid = state.d_max == 0.0
        i_n = cell_index(pos[:, 0], kn_d[2], knx, knx)
        j_n = cell_index(pos[:, 1], kn_d[1], kny, kny)
        k_n = cell_index(pos[:, 2], kn_d[0], knz, knz)

        def dist(p, dcell, idx, vdir):
            hi = (idx + 1).astype(dtype) * dcell
            lo = idx.astype(dtype) * dcell
            return jnp.abs(jnp.where(vdir > 0, (hi - p), (lo - p))
                           / jnp.where(vdir == 0, eps, vdir))

        sx = dist(pos[:, 0], kn_d[2], i_n, direction[:, 0])
        sy = dist(pos[:, 1], kn_d[1], j_n, direction[:, 1])
        sz = dist(pos[:, 2], kn_d[0], k_n, direction[:, 2])
        d_new = sz if independent_column else jnp.minimum(sx, jnp.minimum(sy, sz))
        ijk_n = (k_n * kny + j_n) * knx + i_n
        if G > 1:
            ijk_n = ijk_n + state.gid * kn_ncell
        # Coarse knull grids (the measured sweep winners are 64-512
        # cells) read via the one-hot contraction — a gather pays
        # ~hundreds of cycles PER INDEX regardless of table size (a
        # 512-entry knull gather measured 269 us/iter at 32k lanes in
        # the pooled-mode device trace, vs ~tens of us for the fused
        # compare/select/reduce).
        if G * kn_ncell <= 1024:
            k_null_new = _small_lookup(knull_flat, ijk_n)
        else:
            k_null_new = knull_flat[ijk_n]
        d_max = jnp.where(need_grid, d_new, state.d_max)
        k_null = jnp.where(need_grid, k_null_new, state.k_null)

        # 2. sample tau unless resuming across a cell boundary.
        tau_sampled = -jnp.log(1.0 - u[0] + eps)
        tau = jnp.where(state.transition, state.tau, tau_sampled)
        dn = jnp.maximum(eps, tau / k_null)

        crossing = dn >= d_max

        # ---- crossing branch: advance to the cell boundary ----
        step_len = s_min + d_max
        adv = jnp.where(independent_column,
                        jnp.stack([jnp.zeros_like(step_len),
                                   jnp.zeros_like(step_len),
                                   direction[:, 2] * step_len], axis=1),
                        direction * step_len[:, None])
        pos_cross = pos + adv

        hit_sfc = pos_cross[:, 2] < eps
        hit_tod = pos_cross[:, 2] >= size_z

        # surface interaction
        pix_s_i = cell_index(pos_cross[:, 0], dx, nx, nx)
        pix_s_j = cell_index(pos_cross[:, 1], dy, ny, ny)
        pix_s = pix_s_j * nx + pix_s_i

        m_cross = alive & crossing
        m_sfc = m_cross & hit_sfc
        m_tod = m_cross & hit_tod & ~hit_sfc
        m_pass = m_cross & ~hit_sfc & ~hit_tod

        # Lambertian reflection for surviving surface hits.
        mu_r = jnp.sqrt(u[3])
        az_r = 2.0 * jnp.pi * u[4]
        refl_dir = jnp.stack([mu_r * jnp.sin(az_r), mu_r * jnp.cos(az_r),
                              jnp.sqrt(1.0 - mu_r ** 2 + eps)], axis=1)

        # cell-boundary pass: nudge, cyclic BCs, keep remaining tau.
        nudge = jnp.where(direction > 0, s_min, -s_min)
        pos_pass = pos_cross + jnp.where(
            independent_column,
            jnp.stack([jnp.zeros_like(s_min + pos[:, 0]),
                       jnp.zeros_like(pos[:, 1]), nudge[:, 2]], axis=1),
            nudge)
        pos_pass = pos_pass.at[:, 0].set(jnp.mod(pos_pass[:, 0], size_x))
        pos_pass = pos_pass.at[:, 1].set(jnp.mod(pos_pass[:, 1], size_y))
        tau_pass = tau - d_max * k_null

        # ---- collision branch: move dn inside the knull cell ----
        dn_clip = dn
        move = direction * dn_clip[:, None]
        if independent_column:
            move = move.at[:, :2].set(0.0)
        # clamp into the current knull cell (kernel :317-325)
        lo = jnp.stack([i_n.astype(dtype) * kn_d[2],
                        j_n.astype(dtype) * kn_d[1],
                        k_n.astype(dtype) * kn_d[0]], axis=1) + s_min
        hi = jnp.stack([(i_n + 1).astype(dtype) * kn_d[2],
                        (j_n + 1).astype(dtype) * kn_d[1],
                        (k_n + 1).astype(dtype) * kn_d[0]], axis=1) - s_min
        pos_col = jnp.clip(pos + move, lo, hi)
        if independent_column:
            pos_col = pos_col.at[:, :2].set(pos[:, :2])

        ci = cell_index(pos_col[:, 0], dx, nx, nx)
        cj = cell_index(pos_col[:, 1], dy, ny, ny)
        ck = cell_index(pos_col[:, 2], dz, nz, nz)
        ijk = (ck * ny + cj) * nx + ci

        # ONE merged row gather for both branches (disjoint per lane):
        # crossing lanes read the surface-pixel row (its 8th slot is the
        # column albedo), collision lanes their cell row.  Pooled windows
        # offset into the lane's g-point block of the stacked table.
        idx = jnp.where(crossing, pix_s, ijk)
        row = idx if G == 1 else idx + state.gid * ncol
        cell = jnp.take(fields, row, axis=0)   # (N, 8)
        k_here = cell[:, 0]
        ksca_c = cell[:, 2]
        ksca_a = cell[:, 3]
        k_sca_tot = cell[:, 1] + ksca_c + ksca_a
        ssa_tot = k_sca_tot / jnp.maximum(k_here, eps)
        f_no_abs = 1.0 - (1.0 - ssa_tot) * (k_here / k_null)

        w = state.weight
        counts = dict(counts)
        m_col = alive & ~crossing
        w_abs = w * (1.0 - f_no_abs)
        w_sfc = w * cell[:, 7]

        # Flat single-element scatter scoring (see the ``acc`` layout
        # note): each lane's event writes exactly one primary channel —
        # collision lanes their absorption cell/channel, tod lanes
        # tod_up, surface lanes sfc_dir/sfc_dif.  Single-element flat
        # scatters are ~3.2x cheaper per index than the former (N, 4)
        # row scatter (PERF.md round 4).  Deposits are scaled by the
        # lane's g-point flux-per-photon so pooled windows share ONE
        # physical-units accumulator.
        #
        # sfc_up: every surface deposit is w * albedo(pixel), so the
        # per-pixel up-flux is EXACTLY albedo * (sfc_dir + sfc_dif) —
        # with a single g-point per accumulator (the production scan
        # mode) it is reconstructed after the loop and the second
        # scatter disappears (the two chained 32k-index scatters were
        # ~65% of the step body in the round-5 device trace).  Pooled
        # windows (G > 1) merge g-points whose albedos differ into one
        # accumulator, so they keep the explicit scatter.
        scale = (flux_per_ray[0] if G == 1
                 else _small_lookup(flux_per_ray, state.gid))
        dir_off = jnp.where(state.is_direct, 0, 1)
        sfc0 = 2 * ncell * nz
        idx_a = jnp.where(
            m_col, 2 * idx + dir_off,
            sfc0 + 4 * pix_s + jnp.where(m_tod, 0, 1 + dir_off))
        val_a = scale * jnp.where(m_col, w_abs,
                                  jnp.where(m_tod | m_sfc, w, 0.0))
        if G == 1:
            counts["acc"] = counts["acc"].at[idx_a].add(val_a)
        else:
            idx_b = sfc0 + 4 * pix_s + 3
            val_b = scale * jnp.where(m_sfc, w_sfc, 0.0)
            counts["acc"] = (counts["acc"].at[idx_a].add(val_a)
                             .at[idx_b].add(val_b))

        # Russian roulette after surface reflection.
        w_after = jnp.where(m_sfc, w_sfc, w)
        roulette = m_sfc & (w_after < W_THRES)
        w_after = jnp.where(roulette,
                            jnp.where(u[1] > w_after, 0.0, 1.0), w_after)
        sfc_alive = m_sfc & (w_after > 0.0)

        w_col = w * f_no_abs
        roulette_c = m_col & (w_col < W_THRES)
        w_col = jnp.where(roulette_c, jnp.where(u[1] > w_col, 0.0, 1.0), w_col)
        col_alive = m_col & (w_col > 0.0)

        # null collision vs scattering (kernel :345-352)
        p_scat = ssa_tot / (ssa_tot - 1.0 + k_null / jnp.maximum(k_here, eps))
        is_null = u[2] >= p_scat
        m_scat = col_alive & ~is_null

        # scatter type: 0 gas (Rayleigh), 1 cloud (Mie/HG), 2 aerosol (HG)
        sr = u[3] * jnp.maximum(k_sca_tot, eps)
        type_aer = sr < ksca_a
        type_cld = (~type_aer) & (sr < ksca_a + ksca_c)
        g_cld = jnp.minimum(1.0 - eps, cell[:, 4])
        g_aer = jnp.minimum(1.0 - eps, cell[:, 5])

        cos_ray = _rayleigh_sample(u[4])
        cos_aer = _henyey_sample(jnp.where(jnp.abs(g_aer) < 1e-4, 1e-4, g_aer), u[4])
        if use_mie:
            cos_cld = _mie_sample(mie_cdf, mie_ang, u[4], cell[:, 6])
        else:
            cos_cld = _henyey_sample(jnp.where(jnp.abs(g_cld) < 1e-4, 1e-4, g_cld), u[4])
        cos_scat = jnp.where(type_aer, cos_aer,
                             jnp.where(type_cld, cos_cld, cos_ray))
        cos_scat = jnp.clip(cos_scat, -1.0, 1.0)
        scat_dir = _scatter_direction(direction, cos_scat, u[5])

        # ---- merge all branches into the next state ----
        new_pos = jnp.where(m_col[:, None], pos_col,
                            jnp.where(m_sfc[:, None],
                                      pos_cross.at[:, 2].set(eps),
                                      jnp.where(m_pass[:, None], pos_pass, pos)))
        new_dir = jnp.where((sfc_alive)[:, None], refl_dir,
                            jnp.where(m_scat[:, None], scat_dir, direction))
        new_weight = jnp.where(m_sfc, w_after, jnp.where(m_col, w_col, w))
        new_direct = state.is_direct & ~sfc_alive & ~m_scat
        died = (m_sfc & ~sfc_alive) | m_tod | (m_col & ~col_alive)
        new_alive = alive & ~died

        # d_max bookkeeping: reset on scatter/surface/tod; decrement on null.
        null_continue = col_alive & is_null
        new_dmax = jnp.where(null_continue, d_max - dn_clip,
                             jnp.where(m_pass, 0.0,
                                       jnp.where(m_scat | m_sfc | m_tod, 0.0,
                                                 d_max)))
        new_dmax = jnp.where(m_col & ~null_continue, 0.0, new_dmax)
        new_trans = m_pass
        new_tau = jnp.where(m_pass, tau_pass, tau)

        # ---- respawn: a lane whose photon died launches its next photon
        # immediately (reference photons-per-thread loop) — one packed row
        # gather from the precomputed launch pool ----
        # Static no-respawn fast path: when every photon already has a
        # lane (quota 1 / queue exhausted at launch), skip the respawn
        # arithmetic entirely — measured ~6% of the bw step body at
        # sub-32k pools.  The uniform draw SHAPES are unchanged so the
        # RNG stream (and the frozen goldens) are identical.
        if (n_lanes == n_photons) if fifo else (ppl == 1):
            new_state = _PhotonState(
                pos=new_pos, direction=new_dir, weight=new_weight,
                is_direct=new_direct, alive=new_alive, tau=new_tau,
                d_max=new_dmax, k_null=k_null, transition=new_trans,
                count=state.count, lane_id=state.lane_id, gid=state.gid)
            return new_state, counts, key, step + 1, next_pid
        if fifo:
            # Global photon queue: dying lanes take the next queue ids in
            # lane order (scalar counter + exclusive cumsum rank).
            dying = alive & ~new_alive
            # dtype=int32 on the reductions: under jax_enable_x64 a plain
            # sum/cumsum of int32 promotes to int64, which would change the
            # next_pid while_loop carry dtype and fail the loop typecheck.
            rank = jnp.cumsum(dying, dtype=jnp.int32) - 1
            respawn = dying & (next_pid + rank < n_photons)
            pid = jnp.minimum(next_pid + jnp.maximum(rank, 0),
                              n_photons - 1)
            new_count = None
            new_next = jnp.minimum(
                next_pid + jnp.sum(dying, dtype=jnp.int32),
                jnp.int32(n_photons))
            lpos, ldir, ldirect, lgid = launch_state(pid, u[6:11])
        else:
            respawn = alive & ~new_alive & (state.count < ppl - 1)
            new_count = jnp.where(respawn, state.count + 1, state.count)
            pid = state.lane_id + n_lanes * new_count
            new_next = next_pid
            if respawn_mode == "pool":
                launch = jnp.take(pool, pid, axis=0)
                lpos, ldir = launch[:, 0:3], launch[:, 3:6]
                ldirect = launch[:, 6] > 0.5
                lgid = pid // n_photons_g
            else:
                lpos, ldir, ldirect, lgid = launch_state(pid, u[6:11])
        new_pos = jnp.where(respawn[:, None], lpos, new_pos)
        new_dir = jnp.where(respawn[:, None], ldir, new_dir)
        new_weight = jnp.where(respawn, 1.0, new_weight)
        new_direct = jnp.where(respawn, ldirect, new_direct)
        new_alive = new_alive | respawn
        new_dmax = jnp.where(respawn, 0.0, new_dmax)
        new_trans = new_trans & ~respawn
        new_gid = (state.gid if G == 1
                   else jnp.where(respawn, lgid, state.gid))

        new_state = _PhotonState(
            pos=new_pos, direction=new_dir, weight=new_weight,
            is_direct=new_direct, alive=new_alive, tau=new_tau,
            d_max=new_dmax, k_null=k_null, transition=new_trans,
            count=new_count, lane_id=state.lane_id, gid=new_gid)
        return new_state, counts, key, step + 1, new_next

    # Staged width compaction (the long-walk tail killer): the measured
    # alive-lane profile is ~25 events per photon but a ~50x longer maximum
    # walk, so >90% of while iterations would run with almost every lane
    # dead — and the per-iteration cost (scatter/gather, per-INDEX on TPU)
    # is paid for dead lanes too.  Each phase runs a while_loop at a fixed
    # width W until fewer than W/4 lanes are alive (or the fuse), then
    # packs the alive lanes (alive-first stable argsort) into a W/4-wide
    # state and continues.  Physics is unchanged: dead lanes carry no
    # state, the launch pool is indexed by the carried original lane_id,
    # and every count accumulator is width-independent.  The CUDA analog
    # is persistent threads pulling new photons forever
    # (raytracer_kernels.cu:120-404) — compaction is how a lock-step SIMD
    # machine gets the same effect once the photon pool runs dry.
    widths = [n_lanes]
    if compact:
        floor = min(compact_floor, n_lanes)
        while widths[-1] > floor:
            widths.append(max(floor, widths[-1] // 4))

    step = jnp.zeros((), jnp.int32)
    next_pid0 = jnp.int32(n_lanes)
    phase_steps = []
    for phase, width in enumerate(widths):
        is_last = phase == len(widths) - 1

        def cond(carry, _last=is_last, _w=width):
            state, counts, key, step, next_pid = carry
            go = jnp.logical_and(jnp.any(state.alive), step < max_steps)
            if not _last:
                go = jnp.logical_and(
                    go, jnp.sum(state.alive.astype(jnp.int32)) > _w // 4)
            return go

        state, counts, key, step, next_pid0 = jax.lax.while_loop(
            cond, body, (state, counts, key, step, next_pid0))
        phase_steps.append(step)
        if not is_last:
            nxt = widths[phase + 1]
            order = jnp.argsort(jnp.logical_not(state.alive))[:nxt]
            state = jax.tree_util.tree_map(lambda a: a[order], state)
    steps = step

    # Deposits were flux-scaled at scatter time; only the volumetric
    # normalization remains.
    def f2(c):
        return c.reshape(ny, nx)

    def f3(c):
        return (c / dz).reshape(nz, ny, nx)

    absorb = counts["acc"][:2 * ncell * nz].reshape(ncell * nz, 2)
    sfc = counts["acc"][2 * ncell * nz:].reshape(ncell, 4)
    # G == 1: sfc_up reconstructed from the incident deposits (see the
    # scoring note — exactly albedo * (dir + dif) per pixel).
    sfc_up = (sfc[:, 3] if G > 1
              else alb[0] * (sfc[:, 1] + sfc[:, 2]))
    out = RaytracerOutput(
        flux_toa_down=f2(counts["toa_down"]),
        flux_tod_up=f2(sfc[:, 0]),
        flux_sfc_dir=f2(sfc[:, 1]),
        flux_sfc_dif=f2(sfc[:, 2]),
        flux_sfc_up=f2(sfc_up),
        flux_abs_dir=f3(absorb[:, 0]),
        flux_abs_dif=f3(absorb[:, 1]),
    )
    if return_aux:
        return out, {"steps": steps, "n_lanes": n_lanes, "ppl": ppl,
                     "phase_steps": jnp.stack(phase_steps),
                     "phase_widths": np.asarray(widths)}
    return out


def bundle_optical_props(tau_tot, ssa_tot, tau_cld, ssa_cld, asy_cld,
                         tau_aer, ssa_aer, asy_aer, dz):
    """Per-cell extinction decomposition (bundles_optical_props,
    Raytracer.cu:78-108).  All (nz, ny, nx) per-g-point fields; returns
    (k_ext, k_sca_gas, k_sca_cld, k_sca_aer, asy_cld, asy_aer)."""
    k_ext = tau_tot / dz
    k_cld = tau_cld / dz
    k_aer = tau_aer / dz
    k_sca_cld = k_cld * ssa_cld
    k_sca_aer = k_aer * ssa_aer
    k_sca_gas = k_ext * ssa_tot - k_sca_cld - k_sca_aer
    return k_ext, jnp.maximum(k_sca_gas, 0.0), k_sca_cld, k_sca_aer, asy_cld, asy_aer


def sun_direction_from_angles(zenith_angle: float, azimuth_angle: float):
    """Unit vector of the direct beam (Raytracer.cu:341-343: azimuth 0 =
    north, clockwise positive).  Returned as (x, y, z) with z < 0."""
    import math

    return np.array([
        -math.sin(zenith_angle) * math.cos(0.5 * math.pi - azimuth_angle),
        -math.sin(zenith_angle) * math.sin(0.5 * math.pi - azimuth_angle),
        -math.cos(zenith_angle),
    ])
