"""Backward (camera) Monte-Carlo ray tracer — radiance rendering.

TPU-native re-design of ``src_kernels_cuda_rt/raytracer_kernels_bw.cu`` +
``src_cuda_rt/Raytracer_bw.cu``:

* per camera-sample lanes (npix x photons-per-pixel), SIMD-stepped through
  a ``lax.while_loop`` exactly like the forward tracer,
* backward delta-tracking through the 3D domain plus a 1D background
  column between domain top and TOA (``bg_idx`` layer walking),
* **next-event estimation toward the sun** at every scattering and surface
  event: phase-function value x sun solid angle x direct-sun transmission;
  the transmission uses the Villefranque et al. 2019 decomposition
  (k_min integrated deterministically, k_max-k_min as null-collision russian
  roulette) in a masked inner while_loop,
* phase kinds: Lambertian / Specular (water surfaces, direct beam) /
  Rayleigh / Henyey-Greenstein / Mie (LUT cdf sampling + NEE phase value,
  raytracer_kernels_bw.cu:276-292,328),
* camera models: fisheye (0), rectangular a la Villefranque (1),
  top-of-atmosphere nadir radiances (2).

Radiance calibration matches the reference: count += w * phase(sun) *
sun_solid_angle * T_sun; pixel radiance = count * toa_src * toa_factor /
photons_per_pixel (``count_to_flux_2d``, Raytracer_bw.cu:275-289).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from .raytracer import (_henyey_sample, _mie_phase_value, _mie_sample,
                        _rayleigh_sample, _scatter_direction, W_THRES)

# Sun disc: half angle 0.266 deg (raytracer_kernels_bw.h:27-30).
COS_HALF_ANGLE = 0.9999891776066407
SUN_SOLID_ANGLE = 6.799910294339209e-05


def rayleigh_phase(cos_a):
    return 3.0 / (16.0 * np.pi) * (1.0 + cos_a * cos_a)


def henyey_phase(g, cos_a):
    eps = 1.1920929e-07
    denom = jnp.maximum(eps, 1.0 + g * g - 2.0 * g * cos_a)
    return 1.0 / (4.0 * np.pi) * (1.0 - g * g) / (denom * jnp.sqrt(denom))


def lambertian_phase():
    return 1.0 / np.pi


@dataclasses.dataclass(frozen=True)
class Camera:
    """Camera description (reference Camera struct,
    raytracer_kernels_bw.h:40-91).  Frozen/hashable so it can be a static
    jit argument.  ``position`` is an (x, y, z) tuple in meters."""

    position: tuple = (0.0, 0.0, 0.0)
    cam_type: int = 1              # 0 fisheye, 1 rectangular, 2 TOA nadir
    yaw_deg: float = 0.0
    pitch_deg: float = 0.0
    roll_deg: float = 0.0
    f_zoom: float = 1.0
    fov: float = 80.0
    nx: int = 128
    ny: int = 128

    @property
    def npix(self) -> int:
        return self.nx * self.ny

    def rotation(self):
        y, p, r = (np.deg2rad(self.yaw_deg), np.deg2rad(self.pitch_deg),
                   np.deg2rad(self.roll_deg))
        mx = np.array([np.cos(y) * np.cos(p),
                       np.cos(y) * np.sin(p) * np.sin(r) - np.sin(y) * np.cos(r),
                       np.cos(y) * np.sin(p) * np.cos(r) + np.sin(y) * np.sin(r)])
        my = np.array([np.sin(y) * np.cos(p),
                       np.sin(y) * np.sin(p) * np.sin(r) + np.cos(y) * np.cos(r),
                       np.sin(y) * np.sin(p) * np.cos(r) - np.cos(y) * np.sin(r)])
        mz = np.array([-np.sin(p), np.cos(p) * np.sin(r), np.cos(p) * np.cos(r)])
        return mx, my, mz

    def rect_basis(self):
        """cam_width/height/depth for the rectangular camera
        (setup_normal_camera, raytracer_kernels_bw.h:68-86)."""
        mx, my, mz = self.rotation()
        dir_tmp = np.array([1.0, 0.0, 0.0])
        dir_up = np.array([0.0, 0.0, 1.0])
        dir_cam = np.array([mx @ dir_tmp, my @ dir_tmp, mz @ dir_tmp])
        dir_cam /= np.linalg.norm(dir_cam)
        cam_height = np.array([mx @ dir_up, my @ dir_up, mz @ dir_up])
        cam_height /= np.linalg.norm(cam_height)
        cam_width = -np.cross(dir_cam, dir_up)
        cam_width /= np.linalg.norm(cam_width)
        cam_depth = dir_cam / np.tan(np.deg2rad(self.fov) / 2.0)
        if self.nx > self.ny:
            cam_height = cam_height * self.ny / self.nx
        elif self.ny > self.nx:
            cam_width = cam_width * self.nx / self.ny
        return cam_width, cam_height, cam_depth


def _camera_rays(camera: Camera, key, n_photons, size, z_top, dtype):
    """Initial positions/directions for npix*ppp camera samples."""
    npix = camera.npix
    lane = jnp.arange(n_photons, dtype=jnp.int32)
    pix = lane % npix
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (n_photons,), dtype)
    u2 = jax.random.uniform(k2, (n_photons,), dtype)
    return (pix,) + _camera_rays_for(camera, pix, u1, u2, size, z_top, dtype)


def _camera_rays_for(camera: Camera, pix, u1, u2, size, z_top, dtype):
    """Positions/directions for given pixel ids with stratified jitter
    (u1, u2) — the respawnable core of :func:`_camera_rays`."""
    n_photons = pix.shape[0]
    ui = (pix % camera.nx).astype(dtype) + u1
    uj = (pix // camera.nx).astype(dtype) + u2
    i = ui / camera.nx
    j = uj / camera.ny
    size_x, size_y, size_z = size

    if camera.cam_type == 0:
        mx, my, mz = camera.rotation()
        # float(): a NumPy f64 scalar would promote the ray state to f64
        # under jax_enable_x64 even for f32 inputs.
        zen = i * float(0.5 * np.deg2rad(camera.fov))
        azi = j * 2.0 * np.pi
        dt = jnp.stack([jnp.cos(zen), jnp.sin(zen) * jnp.cos(azi),
                        jnp.sin(zen) * jnp.sin(azi)], axis=1)
        M = jnp.asarray(np.stack([mx, my, mz]), dtype)     # (3, 3)
        direction = dt @ M.T
        pos = jnp.broadcast_to(jnp.asarray(camera.position, dtype)[None, :],
                               (n_photons, 3))
    elif camera.cam_type == 1:
        w, h, d = camera.rect_basis()
        direction = ((2.0 * i - 1.0)[:, None] * jnp.asarray(w, dtype)[None, :]
                     + (2.0 * j - 1.0)[:, None] * jnp.asarray(h, dtype)[None, :]
                     + jnp.asarray(d, dtype)[None, :])
        direction = direction / jnp.linalg.norm(direction, axis=1, keepdims=True)
        pos = jnp.broadcast_to(jnp.asarray(camera.position, dtype)[None, :],
                               (n_photons, 3))
    else:  # TOA nadir
        direction = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, -1.0], dtype)[None, :], (n_photons, 3))
        px = ((pix % camera.nx).astype(dtype) + 0.5) * (size_x / camera.nx)
        py = ((pix // camera.nx).astype(dtype) + 0.5) * (size_y / camera.ny)
        pos = jnp.stack([px, py, jnp.full((n_photons,), z_top, dtype)], axis=1)

    # Bring rays starting above TOA down to z_top along their direction.
    above = (pos[:, 2] > z_top) & (direction[:, 2] < 0)
    ds = (pos[:, 2] - z_top) / jnp.where(direction[:, 2] == 0, -1.0,
                                         direction[:, 2])
    pos_adj = pos + direction * ds[:, None]
    pos = jnp.where(above[:, None],
                    pos_adj.at[:, 2].set(z_top), pos)
    pos = pos.at[:, 0].set(jnp.mod(pos[:, 0], size_x))
    pos = pos.at[:, 1].set(jnp.mod(pos[:, 1], size_y))
    return pos, direction


class _BwState(NamedTuple):
    pos: object
    direction: object
    weight: object
    is_direct: object
    alive: object
    tau: object
    d_max: object
    k_null: object
    transition: object
    bg_idx: object      # (N,) int32 background-layer index
    pix: object         # (N,) int32 camera pixel of the lane's current ray
    count: object       # (N,) int32 rays already launched by this lane
    lane_id: object     # (N,) int32 ORIGINAL lane index (pool identity;
                        # stable across staged width compaction)
    nee: object = None  # (N,) lane-carried NEE sum (no-respawn fast path:
                        # the lane's pixel is FIXED, so per-step deposits
                        # accumulate in-lane — pure VPU — and flush to the
                        # camera count with ONE scatter per phase instead
                        # of one 32k-index scatter per step)


def trace_rays_bw(key, camera: Camera,
                  k_ext, k_sca_gas, k_sca_cld, k_sca_aer, asy_cld, asy_aer,
                  k_ext_bg, ssa_bg, asy_split_bg, z_lev_bg,
                  surface_albedo, land_use_map, kn_grid_shape,
                  grid_d, sun_direction, mu0,
                  photons_per_pixel: int,
                  max_steps: int = 20_000,
                  sun_sub_steps: int = 400,
                  k_ext_null_min: float = 1e-3,
                  rays_per_lane: Optional[int] = None,
                  compact: bool = True,
                  nee_mode: str = "walk",
                  respawn_mode: str = "auto",
                  r_eff: Optional[object] = None,
                  mie_cdf: Optional[object] = None,
                  mie_ang: Optional[object] = None,
                  mie_phase: Optional[object] = None,
                  mie_phase_ang: Optional[object] = None):
    """Render one spectral interval.  Returns per-pixel count and shot
    arrays (ny, nx); radiance = count * toa_src * toa_factor / ppp.

    ``sun_direction`` points TOWARD the sun (z > 0) — opposite to the
    forward tracer's photon-travel convention (the reference does the same:
    compare Raytracer_bw.cu's sun vector with Raytracer.cu:341-343).

    Mie scattering (reference ``Phase_kind::Mie``): with ``mie_cdf`` /
    ``mie_ang`` given (plus per-cell ``r_eff`` (nz, ny, nx)), cloud scatter
    events sample the Mie LUT instead of Henyey-Greenstein
    (raytracer_kernels_bw.cu:714-718); with ``mie_phase`` (n_re, n_ang) /
    ``mie_phase_ang`` (n_ang,) given, the sun next-event estimation
    evaluates the Mie phase VALUE at the sun angle
    (probability_from_sun, raytracer_kernels_bw.cu:276-292).  The two
    gates are independent, matching the reference's separate
    mie_cdf_table_size / mie_phase_table_size checks.

    Background column: ``k_ext_bg`` (kbg,), ``ssa_bg`` (kbg,),
    ``asy_split_bg`` (kbg, 3) scattering fractions [gas, cld, aer] are the
    1D profile above the domain; ``z_lev_bg`` (kbg+1,) with z_lev_bg[0] ==
    domain top height and z_lev_bg[-1] == TOA.

    ``respawn_mode``: how a lane whose ray died picks its next camera ray —
    ``"fifo"`` (global ray queue: scalar next-id carry + per-step cumsum
    ranks, launch states recomputed arithmetically from the ray id — the
    forward tracer's measured-fastest mode), ``"pool"`` (static per-lane
    quota + precomputed launch-table row gather, the round-4 design), or
    ``"auto"`` (env RTE_RRTMGP_BW_RESPAWN > persisted tune_bw.py winner >
    ``"pool"``).
    """
    if respawn_mode == "auto":
        import os

        respawn_mode = os.environ.get("RTE_RRTMGP_BW_RESPAWN") or ""
        if not respawn_mode:
            try:
                from ..utils import tuner

                t = tuner.best_workload_opts("bw_render") or {}
                respawn_mode = t.get("respawn_mode") or "pool"
            except Exception:
                respawn_mode = "pool"
    if respawn_mode not in ("fifo", "pool"):
        raise ValueError(f"unknown respawn_mode {respawn_mode!r}; "
                         "expected 'fifo', 'pool', or 'auto'")
    fifo = respawn_mode == "fifo"
    dtype = k_ext.dtype
    eps = config.eps(dtype)
    nz, ny, nx = k_ext.shape
    npix = camera.npix
    n_photons = npix * photons_per_pixel
    # Each SIMD lane traces ``rays_per_lane`` camera rays sequentially,
    # respawning from a precomputed launch pool as soon as its ray dies
    # (same photons-per-thread amortization as the forward tracer,
    # Raytracer.cu:344-374) — the long-lived-ray tail no longer idles the
    # whole vector.
    if rays_per_lane is None:
        # Below ~32k lanes the while_loop is iteration-latency-bound and
        # narrowing the vector buys nothing (respawn then only ADDS
        # iterations); above it, per-iteration cost grows ~linearly with
        # width and the amortization wins.  Target ~32k lanes.
        rays_per_lane = max(1, min(photons_per_pixel,
                                   n_photons // 32768))
    while n_photons % rays_per_lane:
        rays_per_lane -= 1
    rpl = rays_per_lane
    n_lanes = n_photons // rpl
    dz, dy, dx = grid_d[0], grid_d[1], grid_d[2]
    size_z, size_y, size_x = nz * dz, ny * dy, nx * dx
    kbg = k_ext_bg.shape[0]
    z_top = z_lev_bg[-1]
    s_min = jnp.maximum(size_z, jnp.maximum(size_y, size_x)) * eps
    s_min_bg = jnp.maximum(z_top, jnp.maximum(size_y, size_x)) * eps

    knz, kny, knx = kn_grid_shape
    # Decomposition grid: both max and min of k_ext per coarse cell.
    from .raytracer import _small_lookup, coarse_grid_reduce
    kn_max = jnp.maximum(
        coarse_grid_reduce(k_ext, kn_grid_shape, jax.ops.segment_max),
        k_ext_null_min).reshape(-1)
    kn_min = coarse_grid_reduce(k_ext, kn_grid_shape,
                                jax.ops.segment_min).reshape(-1)
    kn_d = (size_z / knz, size_y / kny, size_x / knx)
    # Coarse knull grids read via the one-hot contraction instead of a
    # gather (gathers cost per INDEX on TPU — a 512-entry knull gather
    # measured ~269 us/iter at 32k lanes; see models/raytracer.py).  The
    # sun-transmission walk reads the grid EVERY inner sub-step, so this
    # matters twice over for the camera renderer.
    kn_small = knz * kny * knx <= 1024

    def _kn_read(table, ijk):
        return _small_lookup(table, ijk) if kn_small else table[ijk]

    sun_direction = jnp.asarray(sun_direction, dtype)
    # Cumulative background optical depth along the sun path
    # (ray_tracer_kernel_bw preamble): bg_tau_cum[k] = sum_{k'>=k} tau/mu.
    dz_bg = jnp.abs(z_lev_bg[1:] - z_lev_bg[:-1])
    bg_tau = k_ext_bg * dz_bg / mu0
    bg_tau_cum = jnp.cumsum(bg_tau[::-1])[::-1]   # (kbg,)

    kflat = k_ext.reshape(-1)
    # One packed row per cell -> a single row gather per collision instead
    # of six element gathers (TPU gathers cost per INDEX, not per byte).
    ncell3 = nz * ny * nx
    use_mie_sample = mie_cdf is not None
    use_mie_phase = mie_phase is not None
    reff_col = (r_eff.reshape(-1).astype(dtype)
                if r_eff is not None else jnp.zeros(ncell3, dtype))
    fields = jnp.stack([
        kflat, k_sca_gas.reshape(-1), k_sca_cld.reshape(-1),
        k_sca_aer.reshape(-1), asy_cld.reshape(-1), asy_aer.reshape(-1),
        reff_col, jnp.zeros(ncell3, dtype)], axis=1)
    # Packed surface row: (albedo, land-use).
    sfc_fields = jnp.stack([surface_albedo.reshape(-1),
                            land_use_map.reshape(-1).astype(dtype)], axis=1)

    def cell_index(p, d, nmax):
        return jnp.clip((p / d).astype(jnp.int32), 0, nmax - 1)

    def grid_ijk(pos):
        ci = cell_index(pos[:, 0], dx, nx)
        cj = cell_index(pos[:, 1], dy, ny)
        ck = cell_index(pos[:, 2], dz, nz)
        return (ck * ny + cj) * nx + ci

    # ------------------------------------------------------------------
    # Optional deterministic sun-transmission field (nee_mode="field"):
    # tau_lev[k, j, i] = integral of k_ext from level k at cell center
    # (i, j) to the domain top along the sun direction, periodic
    # horizontal BC — ONE tilted cumulative scan per spectral step.  NEE
    # then reads exp(-tau) with a single gather instead of running the
    # stochastic null-collision walk per event: zero variance and ~10x
    # fewer gathers, but a cell-discretized path.  In HIGH-CONTRAST blocky
    # media (per-cell tau ~> 1) the half-cell path misassignment is a real
    # bias (measured: −9% scene radiance on a binary 0/1.25-tau cloud
    # deck vs both the walk and a brute-force ray march; <1% on smooth
    # fields).  The reference-exact unbiased walk (kernels_bw.cu:42-170)
    # is therefore the DEFAULT; "field" is the fast preview mode.
    s_z = jnp.maximum(sun_direction[2], jnp.asarray(1e-4, dtype))
    drift_cx = sun_direction[0] / s_z * dz / dx    # cells of x drift/layer
    drift_cy = sun_direction[1] / s_z * dz / dy
    path_layer = dz / s_z                          # meters of path/layer

    def shift_sample(plane, scx, scy):
        """Bilinear sample of (ny, nx) plane at (+scy, +scx) cell offsets
        (uniform shift, periodic)."""
        x0f = jnp.floor(scx)
        y0f = jnp.floor(scy)
        tx = scx - x0f
        ty = scy - y0f
        xi = jnp.arange(nx, dtype=jnp.int32)
        yi = jnp.arange(ny, dtype=jnp.int32)
        x0 = (xi + x0f.astype(jnp.int32)) % nx
        x1 = (x0 + 1) % nx
        y0 = (yi + y0f.astype(jnp.int32)) % ny
        y1 = (y0 + 1) % ny
        p00 = plane[y0][:, x0]
        p01 = plane[y0][:, x1]
        p10 = plane[y1][:, x0]
        p11 = plane[y1][:, x1]
        return ((1 - ty) * ((1 - tx) * p00 + tx * p01)
                + ty * ((1 - tx) * p10 + tx * p11))

    # tau_lev[k](x) = sum_{j>=k} k_ext[j](x + (j-k+0.5)*drift) * path.
    # Accumulate V_k(y) = sum_{j>=k} k_ext[j](y + (j+0.5)*drift) — each
    # layer resampled ONCE at its absolute offset — then shift V_k back by
    # -k*drift per level.  (A naive carry-resampling recurrence compounds
    # the bilinear smoothing over nz layers; exp(-smeared tau) then
    # systematically underestimates transmission in broken cloud fields.)
    def v_body(carry, inp):
        kx_layer, j = inp
        v = carry + shift_sample(kx_layer, (j + 0.5) * drift_cx,
                                 (j + 0.5) * drift_cy)
        return v, v

    _, v_desc = jax.lax.scan(
        v_body, jnp.zeros((ny, nx), dtype),
        (jnp.flip(k_ext, axis=0), jnp.arange(nz - 1, -1, -1, dtype=dtype)))
    v_lev = jnp.flip(v_desc, axis=0)               # V_k, k = 0..nz-1
    k_idx = jnp.arange(nz, dtype=dtype)
    tau_body = jax.vmap(lambda v, k: shift_sample(
        v, -k * drift_cx, -k * drift_cy))(v_lev, k_idx) * path_layer
    tau_lev = jnp.concatenate(
        [tau_body, jnp.zeros((1, ny, nx), dtype)], axis=0)
    tau_lev_flat = tau_lev.reshape(-1)              # ((nz+1)*ny*nx,)
    zl_bg = jnp.asarray(z_lev_bg, dtype)
    # small-table one-hot selects (no gathers) for the background branch
    bg_iota = jnp.arange(kbg, dtype=jnp.int32)

    def _bg_sel(table, bgi):
        onehot = (bg_iota[None, :] == bgi[:, None]).astype(dtype)
        return onehot @ table

    def sun_trans_field(pos, bg_idx, k_cell, at_sfc):
        """exp(-tau_sun) at ``pos``: one element gather into tau_lev_flat
        (drifted nearest column one level up + k_cell * partial path; the
        exact undrifted level-0 row for surface events) plus analytic
        background layers above the domain."""
        z = pos[:, 2]
        ck = cell_index(z, dz, nz)
        z_up = (ck + 1).astype(dtype) * dz
        t_up = (z_up - z) / s_z
        xs = pos[:, 0] + sun_direction[0] / s_z * (z_up - z)
        ys = pos[:, 1] + sun_direction[1] / s_z * (z_up - z)
        ci = ((xs / dx).astype(jnp.int32)) % nx
        cj = ((ys / dy).astype(jnp.int32)) % ny
        idx_dom = ((ck + 1) * ny + cj) * nx + ci
        idx_sfc = (cell_index(pos[:, 1], dy, ny) * nx
                   + cell_index(pos[:, 0], dx, nx))
        idx = jnp.where(at_sfc, idx_sfc, idx_dom)
        tau0 = jnp.take(tau_lev_flat, idx)
        tau_dom = jnp.where(at_sfc, tau0, tau0 + k_cell * t_up) \
            + bg_tau_cum[0]
        # background region: cumulative minus the part below z
        bgi = jnp.clip(bg_idx, 0, kbg - 1)
        tau_bg = (_bg_sel(bg_tau_cum, bgi)
                  - _bg_sel(k_ext_bg, bgi)
                  * jnp.maximum(z - _bg_sel(zl_bg[:-1], bgi), 0.0) / s_z)
        in_bg = z > size_z
        return jnp.exp(-jnp.where(in_bg, tau_bg, tau_dom))

    # ------------------------------------------------------------------
    def sun_transmission(pos0, bg_idx0, active, key):
        """Vectorized transmission_direct_sun (kernels_bw.cu:42-170)."""

        def s_cond(c):
            live, *_ , step = c
            return jnp.logical_and(jnp.any(live), step < sun_sub_steps)

        def s_body(c):
            live, pos, tau, tau_min, d_max, kmx, kmn, trans_flag, result, key, step = c
            key, ku = jax.random.split(key)
            u = jax.random.uniform(ku, (2, pos.shape[0]), dtype)

            in_bg = pos[:, 2] > size_z
            # Lanes reaching the background exit with accumulated tau + bg.
            bgi = jnp.clip(((pos[:, 2] - z_lev_bg[0])
                            / jnp.maximum(z_lev_bg[1] - z_lev_bg[0], 1.0)
                            ).astype(jnp.int32), 0, kbg - 1)
            # use precomputed cumulative from layer 0 (domain top): photons
            # always exit the dynamic domain at its top -> bg_tau_cum[0].
            exit_T = jnp.exp(-(tau_min + bg_tau_cum[0]))
            result = jnp.where(live & in_bg, exit_T, result)
            live = live & ~in_bg

            need = d_max == 0.0
            i_n = cell_index(pos[:, 0], kn_d[2], knx)
            j_n = cell_index(pos[:, 1], kn_d[1], kny)
            k_n = cell_index(pos[:, 2], kn_d[0], knz)

            def dist(p, dcell, idx, vdir):
                hi = (idx + 1).astype(dtype) * dcell
                lo = idx.astype(dtype) * dcell
                return jnp.abs(jnp.where(vdir > 0, hi - p, lo - p)
                               / jnp.where(vdir == 0, eps, vdir))

            sx = dist(pos[:, 0], kn_d[2], i_n, sun_direction[0])
            sy = dist(pos[:, 1], kn_d[1], j_n, sun_direction[1])
            sz = (k_n + 1).astype(dtype) * kn_d[0] - pos[:, 2]
            sz = sz / jnp.maximum(sun_direction[2], eps)
            dmax_new = jnp.minimum(sx, jnp.minimum(sy, sz))
            ijk_n = (k_n * kny + j_n) * knx + i_n
            kmn_new = _kn_read(kn_min, ijk_n)
            kmx_new = _kn_read(kn_max, ijk_n) - kmn_new
            d_max = jnp.where(need, dmax_new, d_max)
            kmx = jnp.where(need, jnp.maximum(kmx_new, eps), kmx)
            kmn = jnp.where(need, kmn_new, kmn)

            tau_s = -jnp.log(1.0 - u[0] + eps)
            tau = jnp.where(trans_flag, tau, tau_s)
            dn = jnp.maximum(eps, tau / kmx)

            crossing = dn >= d_max
            # crossing: integrate k_min over d_max, move, wrap.
            tmin_c = tau_min + kmn * d_max
            pos_c = pos + sun_direction[None, :] * d_max[:, None]
            exit_top = pos_c[:, 2] >= size_z - s_min
            pos_c = jnp.where((crossing & exit_top)[:, None],
                              pos_c.at[:, 2].set(size_z + s_min_bg), pos_c)
            nudge = jnp.where(sun_direction > 0, s_min, -s_min)[None, :]
            pos_cc = pos_c + nudge
            pos_cc = pos_cc.at[:, 0].set(jnp.mod(pos_cc[:, 0], size_x))
            pos_cc = pos_cc.at[:, 1].set(jnp.mod(pos_cc[:, 1], size_y))
            pos_c = jnp.where((crossing & ~exit_top)[:, None], pos_cc, pos_c)
            tau_c = tau - d_max * kmx
            # collision: move dn, compare against local k
            tmin_h = tau_min + kmn * dn
            pos_h = pos + sun_direction[None, :] * dn[:, None]
            ijk = grid_ijk(pos_h)
            k_tot = kflat[ijk] - kmn
            absorbed = u[1] < (k_tot / kmx)

            live_c = live & crossing
            live_h = live & ~crossing
            result = jnp.where(live_h & absorbed, 0.0, result)

            new_live = (live_c) | (live_h & ~absorbed)
            new_pos = jnp.where(crossing[:, None], pos_c, pos_h)
            new_tau = jnp.where(crossing, tau_c, tau)
            new_tmin = jnp.where(crossing, tmin_c, tmin_h)
            new_dmax = jnp.where(crossing, 0.0, d_max - dn)
            new_trans = crossing
            return (new_live, new_pos, new_tau, new_tmin, new_dmax, kmx, kmn,
                    new_trans, result, key, step + 1)

        nw = pos0.shape[0]
        zeros = jnp.zeros(nw, dtype)
        init = (active, pos0, zeros, zeros, zeros, jnp.ones(nw, dtype),
                zeros, jnp.zeros(nw, dtype=bool), zeros, key,
                jnp.zeros((), jnp.int32))
        out = jax.lax.while_loop(s_cond, s_body, init)
        return out[8]

    # ------------------------------------------------------------------
    key, kc, kinit = jax.random.split(key, 3)
    # ALL launch states (every lane's rays_per_lane generations) are
    # precomputed up front: ray id = lane + n_lanes*count covers every
    # pixel exactly photons_per_pixel times; the direct-sun view at launch
    # (reset_photon :257-268) is ONE batched shadow walk over the whole
    # pool, and in-loop respawn is a single packed row gather.
    lane_g = jnp.arange(n_photons, dtype=jnp.int32)
    pix_all = lane_g % npix
    k1, k2 = jax.random.split(kc)
    u1 = jax.random.uniform(k1, (n_photons,), dtype)
    u2 = jax.random.uniform(k2, (n_photons,), dtype)
    pos_all, dir_all = _camera_rays_for(camera, pix_all, u1, u2,
                                        (size_x, size_y, size_z), z_top,
                                        dtype)
    camera_shot = jnp.zeros(npix, dtype).at[pix_all].add(1.0)
    camera_count = jnp.zeros(npix, dtype)

    # initial bg layer index per launch
    zl = jnp.asarray(z_lev_bg, dtype)
    bg_all = jnp.clip(jnp.searchsorted(zl, pos_all[:, 2], side="right") - 1,
                      0, kbg - 1).astype(jnp.int32)

    sees_sun = jnp.sum(dir_all * sun_direction[None, :], axis=1) > COS_HALF_ANGLE
    if nee_mode == "field":
        k_launch = jnp.take(kflat, grid_ijk(pos_all))
        t_direct = sun_trans_field(pos_all, bg_all, k_launch,
                                   jnp.zeros(n_photons, bool))
    else:
        t_direct = sun_transmission(pos_all, bg_all, sees_sun, kinit)
    camera_count = camera_count.at[pix_all].add(
        jnp.where(sees_sun, t_direct, 0.0))

    # Packed launch table: (pos3, dir3, pix, bg_idx) per ray id ("pool"
    # mode only — fifo recomputes launch states arithmetically).
    launch_table = None if fifo else jnp.concatenate(
        [pos_all, dir_all, pix_all.astype(dtype)[:, None],
         bg_all.astype(dtype)[:, None]], axis=1)

    def launch_state_for(pid, u1, u2):
        """Arithmetic launch state for ray ids ``pid`` with fresh
        stratified jitter (statistically equivalent to the pool rays whose
        launch-time sun view was credited in the batched pre-pass)."""
        pix = pid % npix
        lpos, ldir = _camera_rays_for(camera, pix, u1, u2,
                                      (size_x, size_y, size_z), z_top,
                                      dtype)
        lbg = jnp.clip(jnp.searchsorted(zl, lpos[:, 2], side="right") - 1,
                       0, kbg - 1).astype(jnp.int32)
        return lpos, ldir, pix, lbg

    pix0 = pix_all[:n_lanes]
    # Static no-respawn detection (shared with the body's fast path):
    # lanes keep their camera pixel forever, enabling in-lane NEE
    # accumulation (see _BwState.nee).
    lane_acc = (n_lanes == n_photons) if fifo else (rpl == 1)
    state = _BwState(
        pos=pos_all[:n_lanes], direction=dir_all[:n_lanes],
        weight=jnp.ones(n_lanes, dtype),
        is_direct=jnp.ones(n_lanes, dtype=bool),
        alive=jnp.ones(n_lanes, dtype=bool),
        tau=jnp.zeros(n_lanes, dtype),
        d_max=jnp.zeros(n_lanes, dtype),
        k_null=jnp.ones(n_lanes, dtype),
        transition=jnp.zeros(n_lanes, dtype=bool),
        bg_idx=bg_all[:n_lanes],
        pix=pix0,
        count=None if fifo else jnp.zeros(n_lanes, jnp.int32),
        lane_id=None if fifo else jnp.arange(n_lanes, dtype=jnp.int32),
        nee=jnp.zeros(n_lanes, dtype) if lane_acc else None,
    )

    def body(carry):
        state, count, key, step, next_pid = carry
        key, ku, ksun = jax.random.split(key, 3)
        # fifo respawn consumes two extra uniform rows (the respawned
        # ray's stratified sub-pixel jitter).
        u = jax.random.uniform(ku, (10 if fifo else 8,
                                    state.alive.shape[0]), dtype)
        pos, direction, alive = state.pos, state.direction, state.alive
        w = state.weight

        tau_sampled = -jnp.log(1.0 - u[0] + eps)
        tau = jnp.where(state.transition, state.tau, tau_sampled)

        in_bg = pos[:, 2] > size_z

        # ============ background 1D region ============
        bgi = state.bg_idx
        kbg_here = jnp.maximum(k_ext_bg[bgi], eps)
        dn_bg = jnp.maximum(eps, tau / kbg_here)
        up = direction[:, 2] > 0
        dmax_bg = jnp.abs(jnp.where(up, zl[bgi + 1] - pos[:, 2],
                                    zl[bgi] - pos[:, 2])
                          / jnp.where(direction[:, 2] == 0, eps, direction[:, 2]))
        bg_crossing = dn_bg >= dmax_bg

        # crossing a bg layer boundary
        pos_bgc = pos + direction * dmax_bg[:, None]
        pos_bgc = pos_bgc.at[:, 2].set(
            jnp.where(up, zl[bgi + 1] + s_min_bg, zl[bgi] - s_min_bg))
        enter_domain = pos_bgc[:, 2] <= size_z + s_min_bg
        leave_toa = pos_bgc[:, 2] >= z_top
        tau_bgc = tau - kbg_here * (dmax_bg + s_min_bg)
        pos_bgc2 = pos_bgc.at[:, 2].set(
            jnp.where(enter_domain, size_z - s_min, pos_bgc[:, 2]))
        pos_bgc2 = pos_bgc2.at[:, 0].set(jnp.mod(pos_bgc2[:, 0], size_x))
        pos_bgc2 = pos_bgc2.at[:, 1].set(jnp.mod(pos_bgc2[:, 1], size_y))
        bgi_next = jnp.where(enter_domain, bgi,
                             jnp.where(up, bgi + 1, bgi - 1)).astype(jnp.int32)
        bgi_next = jnp.clip(bgi_next, 0, kbg - 1)

        # bg scattering event
        pos_bgh = pos + direction * dn_bg[:, None]
        ssa_here = ssa_bg[bgi]
        w_bg = w * ssa_here
        roulette_bg = w_bg < W_THRES
        w_bg = jnp.where(roulette_bg, jnp.where(u[1] > w_bg, 0.0, 1.0), w_bg)
        frac = asy_split_bg[bgi]          # (N, 3): gas, cld, aer fractions
        sr = u[5]
        bg_aer = sr < frac[:, 2]
        bg_cld = (~bg_aer) & (sr < frac[:, 2] + frac[:, 1])
        # background is a clear-sky profile: cld/aer use HG with g=0-ish
        cos_bg = _rayleigh_sample(u[6])

        # ============ dynamic 3D domain ============
        need_grid = state.d_max == 0.0
        i_n = cell_index(pos[:, 0], kn_d[2], knx)
        j_n = cell_index(pos[:, 1], kn_d[1], kny)
        k_n = cell_index(pos[:, 2], kn_d[0], knz)

        def dist(p, dcell, idx, vdir):
            hi = (idx + 1).astype(dtype) * dcell
            lo = idx.astype(dtype) * dcell
            return jnp.abs(jnp.where(vdir > 0, hi - p, lo - p)
                           / jnp.where(vdir == 0, eps, vdir))

        sx = dist(pos[:, 0], kn_d[2], i_n, direction[:, 0])
        sy = dist(pos[:, 1], kn_d[1], j_n, direction[:, 1])
        sz = dist(pos[:, 2], kn_d[0], k_n, direction[:, 2])
        d_new = jnp.minimum(sx, jnp.minimum(sy, sz))
        ijk_n = (k_n * kny + j_n) * knx + i_n
        d_max = jnp.where(need_grid, d_new, state.d_max)
        k_null = jnp.where(need_grid, _kn_read(kn_max, ijk_n), state.k_null)

        dn = jnp.maximum(eps, tau / k_null)
        crossing = dn >= d_max

        # crossing events
        pos_cross = pos + direction * d_max[:, None]
        hit_sfc = pos_cross[:, 2] < eps
        hit_tod = pos_cross[:, 2] >= size_z

        # surface: albedo + NEE + reflected direction (one packed gather)
        sfc_ij = (cell_index(pos_cross[:, 1], dy, ny) * nx
                  + cell_index(pos_cross[:, 0], dx, nx))
        sfc_row = jnp.take(sfc_fields, sfc_ij, axis=0)   # (N, 2)
        w_sfc = w * sfc_row[:, 0]
        is_water = sfc_row[:, 1] == 0
        specular_sfc = is_water & state.is_direct
        # NEE from the surface
        spec_dir = direction - 2.0 * direction[:, 2:3] * jnp.asarray(
            [0.0, 0.0, 1.0], dtype)[None, :]
        spec_to_sun = jnp.sum(spec_dir * sun_direction[None, :], axis=1) > COS_HALF_ANGLE
        p_sun_sfc = jnp.where(specular_sfc,
                              spec_to_sun.astype(dtype),
                              lambertian_phase() * SUN_SOLID_ANGLE)
        roulette_s = w_sfc < W_THRES
        w_sfc_rr = jnp.where(roulette_s, jnp.where(u[1] > w_sfc, 0.0, 1.0), w_sfc)
        mu_r = jnp.sqrt(u[2])
        az_r = 2.0 * jnp.pi * u[3]
        lamb_dir = jnp.stack([mu_r * jnp.sin(az_r), mu_r * jnp.cos(az_r),
                              jnp.sqrt(1.0 - mu_r ** 2 + eps)], axis=1)
        sfc_new_dir = jnp.where(specular_sfc[:, None], spec_dir, lamb_dir)

        # TOD exit into background
        tau_tod = tau - d_max * k_null

        # plain knull-cell pass
        nudge = jnp.where(direction > 0, s_min, -s_min)
        pos_pass = pos_cross + nudge
        pos_pass = pos_pass.at[:, 0].set(jnp.mod(pos_pass[:, 0], size_x))
        pos_pass = pos_pass.at[:, 1].set(jnp.mod(pos_pass[:, 1], size_y))
        tau_pass = tau - d_max * k_null

        # collision events
        lo = jnp.stack([i_n.astype(dtype) * kn_d[2],
                        j_n.astype(dtype) * kn_d[1],
                        k_n.astype(dtype) * kn_d[0]], axis=1) + s_min
        hi = jnp.stack([(i_n + 1).astype(dtype) * kn_d[2],
                        (j_n + 1).astype(dtype) * kn_d[1],
                        (k_n + 1).astype(dtype) * kn_d[0]], axis=1) - s_min
        pos_col = jnp.clip(pos + direction * dn[:, None], lo, hi)
        ijk = grid_ijk(pos_col)
        cell = jnp.take(fields, ijk, axis=0)   # (N, 8) one row gather
        k_here = cell[:, 0]
        ksca_c, ksca_a = cell[:, 2], cell[:, 3]
        k_sca_tot = cell[:, 1] + ksca_c + ksca_a
        ssa_tot = k_sca_tot / jnp.maximum(k_here, eps)
        f_no_abs = 1.0 - (1.0 - ssa_tot) * (k_here / k_null)
        w_col = w * f_no_abs
        roulette_c = w_col < W_THRES
        w_col = jnp.where(roulette_c, jnp.where(u[1] > w_col, 0.0, 1.0), w_col)
        p_scat = ssa_tot / (ssa_tot - 1.0 + k_null / jnp.maximum(k_here, eps))
        is_null = u[4] >= p_scat

        sr3 = u[5] * jnp.maximum(k_sca_tot, eps)
        t_aer = sr3 < ksca_a
        t_cld = (~t_aer) & (sr3 < ksca_a + ksca_c)
        g_cld = jnp.minimum(1.0 - eps, cell[:, 4])
        g_aer = jnp.minimum(1.0 - eps, cell[:, 5])
        g_eff = jnp.where(t_aer, g_aer, jnp.where(t_cld, g_cld, 0.0))
        cos_ray3 = _rayleigh_sample(u[6])
        g_safe = jnp.where(jnp.abs(g_eff) < 1e-4, 1e-4, g_eff)
        cos_hg3 = _henyey_sample(g_safe, u[6])
        if use_mie_sample:
            # Cloud scatter angle from the Mie cdf LUT (kernels_bw.cu:714-718)
            cos_cld3 = _mie_sample(mie_cdf, mie_ang, u[6], cell[:, 6])
            cos_dom = jnp.where(t_aer, cos_hg3,
                                jnp.where(t_cld, cos_cld3, cos_ray3))
        else:
            cos_dom = jnp.where(t_aer | t_cld, cos_hg3, cos_ray3)

        # ============ masks ============
        m_bg = alive & in_bg
        m_bgc = m_bg & bg_crossing
        m_bgh = m_bg & ~bg_crossing
        m_dom = alive & ~in_bg
        m_cross = m_dom & crossing
        m_sfc = m_cross & hit_sfc
        m_tod = m_cross & hit_tod & ~hit_sfc
        m_pass = m_cross & ~hit_sfc & ~hit_tod
        m_col = m_dom & ~crossing
        m_scat_dom = m_col & (w_col > 0.0) & ~is_null
        m_null = m_col & (w_col > 0.0) & is_null
        m_scat_bg = m_bgh & (w_bg > 0.0)
        sfc_alive = m_sfc & (w_sfc_rr > 0.0)

        # ============ next-event estimation (scatter + surface) ============
        need_nee = m_scat_dom | m_scat_bg | m_sfc
        # phase value toward the sun
        cos_sun = jnp.clip(jnp.sum(direction * sun_direction[None, :], axis=1),
                           -1.0, 1.0)
        p_dom = jnp.where(
            t_aer | t_cld, henyey_phase(g_safe, cos_sun), rayleigh_phase(cos_sun)
        )
        if use_mie_phase:
            # Phase_kind::Mie for cloud scatter NEE (kernels_bw.cu:276-292)
            p_mie = _mie_phase_value(mie_phase_ang, mie_phase,
                                     jnp.arccos(cos_sun), cell[:, 6])
            p_dom = jnp.where(t_cld, p_mie, p_dom)
        p_dom = p_dom * SUN_SOLID_ANGLE
        p_bg = rayleigh_phase(cos_sun) * SUN_SOLID_ANGLE
        p_evt = jnp.where(m_sfc, p_sun_sfc, jnp.where(m_bgh, p_bg, p_dom))
        w_evt = jnp.where(m_sfc, w_sfc, jnp.where(m_bgh, w_bg, w_col))
        nee_pos = jnp.where(m_sfc[:, None], pos_cross.at[:, 2].set(eps),
                            jnp.where(m_bgh[:, None], pos_bgh, pos_col))
        if nee_mode == "field":
            t_sun = sun_trans_field(nee_pos, state.bg_idx, k_here, m_sfc)
        else:
            t_sun = sun_transmission(nee_pos, state.bg_idx, need_nee, ksun)
        dep = jnp.where(need_nee, w_evt * p_evt * t_sun, 0.0)
        if lane_acc:
            # No-respawn fast path: the lane's pixel never changes, so
            # the deposit accumulates in-lane (VPU add) and flushes with
            # ONE scatter per compaction phase — the per-step
            # pixel-indexed scatter (per-INDEX cost at full width)
            # disappears from the loop.
            nee_new = state.nee + dep
        else:
            count = count.at[state.pix].add(dep)

        # ============ merge new state ============
        new_pos = jnp.where(m_bgc[:, None], pos_bgc2,
                    jnp.where(m_bgh[:, None], pos_bgh,
                      jnp.where(m_col[:, None], pos_col,
                        jnp.where(m_sfc[:, None], pos_cross.at[:, 2].set(eps),
                          jnp.where(m_tod[:, None],
                                    pos_cross.at[:, 2].set(size_z + s_min_bg),
                                    jnp.where(m_pass[:, None], pos_pass, pos))))))

        scat_dir_dom = _scatter_direction(direction, jnp.clip(cos_dom, -1, 1), u[7])
        scat_dir_bg = _scatter_direction(direction, jnp.clip(cos_bg, -1, 1), u[7])
        new_dir = jnp.where(sfc_alive[:, None], sfc_new_dir,
                    jnp.where(m_scat_dom[:, None], scat_dir_dom,
                      jnp.where(m_scat_bg[:, None], scat_dir_bg, direction)))

        new_w = jnp.where(m_sfc, w_sfc_rr, jnp.where(m_col, w_col,
                          jnp.where(m_bgh, w_bg, w)))

        died = ((m_sfc & ~sfc_alive) | (m_col & (w_col <= 0.0))
                | (m_bgh & (w_bg <= 0.0))
                | (m_bgc & leave_toa & ~enter_domain))
        new_alive = alive & ~died

        keep_direct = ~(sfc_alive & ~specular_sfc) & ~m_scat_dom & ~m_scat_bg
        new_direct = state.is_direct & keep_direct

        new_dmax = jnp.where(m_null, d_max - dn, 0.0)
        new_dmax = jnp.where(alive & ~m_null & ~m_pass & ~m_sfc & ~m_tod
                             & ~m_col & ~m_bg, d_max, new_dmax)
        new_trans = m_pass | m_bgc | m_tod
        new_tau = jnp.where(m_pass, tau_pass,
                            jnp.where(m_tod, tau_tod,
                                      jnp.where(m_bgc, tau_bgc, tau)))
        new_bgi = jnp.where(m_bgc, bgi_next,
                            jnp.where(m_tod, 0, state.bg_idx)).astype(jnp.int32)

        # ---- respawn: a lane whose ray died launches its next camera ray
        # (its launch-time direct-sun view was already scored in the
        # batched pre-pass) ----
        # Static no-respawn fast path (see models/raytracer.py): at
        # sub-32k pools the quota is 1 / the queue is exhausted at launch,
        # so the per-step launch-table gather (pool) or queue arithmetic
        # (fifo) is dead weight.  Draw shapes unchanged -> RNG stream and
        # frozen goldens identical.
        if lane_acc:
            new_state = _BwState(
                pos=new_pos, direction=new_dir, weight=new_w,
                is_direct=new_direct, alive=new_alive, tau=new_tau,
                d_max=new_dmax, k_null=k_null, transition=new_trans,
                bg_idx=new_bgi, pix=state.pix, count=state.count,
                lane_id=state.lane_id, nee=nee_new)
            return new_state, count, key, step + 1, next_pid
        if fifo:
            # Global ray queue, as in the forward tracer: dying lanes take
            # the next queue ids in lane order (scalar counter + exclusive
            # cumsum rank).  dtype=int32 on the reductions: under x64 a
            # plain sum/cumsum of int32 promotes to int64 and changes the
            # while_loop carry dtype.
            dying = alive & ~new_alive
            rank = jnp.cumsum(dying, dtype=jnp.int32) - 1
            respawn = dying & (next_pid + rank < n_photons)
            pid = jnp.minimum(next_pid + jnp.maximum(rank, 0),
                              n_photons - 1)
            new_next = jnp.minimum(
                next_pid + jnp.sum(dying, dtype=jnp.int32),
                jnp.int32(n_photons))
            new_count = None
            lpos, ldir, lpix, lbg = launch_state_for(pid, u[8], u[9])
        else:
            respawn = alive & ~new_alive & (state.count < rpl - 1)
            new_count = jnp.where(respawn, state.count + 1, state.count)
            new_next = next_pid
            launch = jnp.take(launch_table,
                              state.lane_id
                              + jnp.asarray(n_lanes, jnp.int32) * new_count,
                              axis=0)                   # (N, 8) row gather
            lpos, ldir = launch[:, 0:3], launch[:, 3:6]
            lpix = launch[:, 6].astype(jnp.int32)
            lbg = launch[:, 7].astype(jnp.int32)
        new_pos = jnp.where(respawn[:, None], lpos, new_pos)
        new_dir = jnp.where(respawn[:, None], ldir, new_dir)
        new_pix = jnp.where(respawn, lpix, state.pix)
        new_bgi = jnp.where(respawn, lbg, new_bgi)
        new_w = jnp.where(respawn, 1.0, new_w)
        new_direct = new_direct | respawn
        new_alive = new_alive | respawn
        new_dmax = jnp.where(respawn, 0.0, new_dmax)
        new_trans = new_trans & ~respawn

        new_state = _BwState(
            pos=new_pos, direction=new_dir, weight=new_w,
            is_direct=new_direct, alive=new_alive, tau=new_tau,
            d_max=new_dmax, k_null=k_null, transition=new_trans,
            bg_idx=new_bgi, pix=new_pix, count=new_count,
            lane_id=state.lane_id)
        return new_state, count, key, step + 1, new_next

    # Staged width compaction, as in the forward tracer
    # (models/raytracer.py): each phase runs a fixed-width while_loop
    # until fewer than W/4 lanes are alive, then packs the alive lanes
    # (alive-first stable argsort) into a W/4-wide state.  The camera
    # count accumulator is width-independent and the launch pool is
    # indexed by the carried lane_id, so physics and RNG-per-event are
    # unchanged; the long-walk tail stops paying full-width
    # scatter/gather costs.
    widths = [n_lanes]
    if compact:
        floor = min(2048, n_lanes)
        while widths[-1] > floor:
            widths.append(max(floor, widths[-1] // 4))

    step = jnp.zeros((), jnp.int32)
    # fifo: the first n_lanes ray ids seed the lanes; the queue hands out
    # the rest.  (pool mode carries the scalar unused.)
    next_pid = jnp.int32(n_lanes)
    for phase, width in enumerate(widths):
        is_last = phase == len(widths) - 1

        def cond(carry, _last=is_last, _w=width):
            state, count, key, step, next_pid = carry
            go = jnp.logical_and(jnp.any(state.alive), step < max_steps)
            if not _last:
                go = jnp.logical_and(
                    go, jnp.sum(state.alive.astype(jnp.int32)) > _w // 4)
            return go

        state, camera_count, key, step, next_pid = jax.lax.while_loop(
            cond, body, (state, camera_count, key, step, next_pid))
        if lane_acc:
            # Flush the lane-carried NEE sums (once per phase — dead
            # lanes' accumulated deposits must land before compaction
            # drops them).
            camera_count = camera_count.at[state.pix].add(state.nee)
            state = state._replace(nee=jnp.zeros_like(state.nee))
        if not is_last:
            nxt = widths[phase + 1]
            order = jnp.argsort(jnp.logical_not(state.alive))[:nxt]
            state = jax.tree_util.tree_map(lambda a: a[order], state)

    return (camera_count.reshape(camera.ny, camera.nx),
            camera_shot.reshape(camera.ny, camera.nx))


def count_to_radiance(count, toa_src, toa_factor, photons_per_pixel):
    """count_to_flux_2d (Raytracer_bw.cu:275-289)."""
    return count * (toa_src * toa_factor / photons_per_pixel)


def accumulate_clouds(camera: Camera, grid_d, grid_cells,
                      lwp3d, iwp3d, tau_cloud3d, dtype=jnp.float32):
    """Per-camera-pixel cloud columns along the view ray (the reference's
    ``accumulate_clouds_kernel``, raytracer_kernels_bw.cu:773-889, driven by
    the --cloud-cam flag): deterministic pixel-center rays marched cell by
    cell through the 3D domain, accumulating

    * liwp_cam: path-weighted liquid+ice water (g m-2 equivalents / dz),
    * tauc_cam: path-weighted cloud optical depth / dz,
    * dist_cam: distance to the first cloudy cell (-1 if none met),
    * zen_cam:  the ray zenith angle.

    lwp3d/iwp3d/tau_cloud3d: (nz, ny, nx) per-cell fields; returns four
    (ny, nx) images (camera pixel raster)."""
    nz, ny, nx = grid_cells
    dz, dy, dx = (float(grid_d[0]), float(grid_d[1]), float(grid_d[2]))
    size = (nx * dx, ny * dy, nz * dz)
    size_x, size_y, size_z = size
    eps = config.eps(jnp.zeros((), dtype).dtype)
    s_eps = max(size) * eps

    npix = camera.npix
    # Deterministic pixel-center rays: reuse _camera_rays with a fixed key
    # but replace the stratified jitter with centers via ppp=1 + zero key.
    pixi = jnp.arange(npix, dtype=jnp.int32)
    i = ((pixi % camera.nx).astype(dtype) + 0.5) / camera.nx
    j = ((pixi // camera.nx).astype(dtype) + 0.5) / camera.ny

    if camera.cam_type == 0:
        mx, my, mz = camera.rotation()
        # float(): a NumPy f64 scalar would promote the ray state to f64
        # under jax_enable_x64 even for f32 inputs.
        zen = i * float(0.5 * np.deg2rad(camera.fov))
        azi = j * 2.0 * np.pi
        dt = jnp.stack([jnp.cos(zen), jnp.sin(zen) * jnp.cos(azi),
                        jnp.sin(zen) * jnp.sin(azi)], axis=1)
        M = jnp.asarray(np.stack([mx, my, mz]), dtype)
        direction = dt @ M.T
        pos = jnp.broadcast_to(jnp.asarray(camera.position, dtype)[None, :],
                               (npix, 3))
    elif camera.cam_type == 1:
        w, h, d = camera.rect_basis()
        direction = ((2.0 * i - 1.0)[:, None] * jnp.asarray(w, dtype)[None, :]
                     + (2.0 * j - 1.0)[:, None] * jnp.asarray(h, dtype)[None, :]
                     + jnp.asarray(d, dtype)[None, :])
        direction = direction / jnp.linalg.norm(direction, axis=1,
                                                keepdims=True)
        pos = jnp.broadcast_to(jnp.asarray(camera.position, dtype)[None, :],
                               (npix, 3))
    else:
        direction = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, -1.0], dtype)[None, :], (npix, 3))
        pos = jnp.stack([i * size_x, j * size_y,
                         jnp.full((npix,), size_z - 2 * s_eps, dtype)], axis=1)

    # Bring rays above the domain down to its top.
    pos = pos.astype(dtype)
    direction = direction.astype(dtype)
    above = (pos[:, 2] >= size_z - s_eps) & (direction[:, 2] < 0)
    ds = jnp.abs((pos[:, 2] - size_z)
                 / jnp.where(direction[:, 2] == 0, -1.0, direction[:, 2]))
    pos_adj = pos + direction * ds[:, None] - s_eps
    pos = jnp.where(above[:, None], pos_adj, pos)
    pos = pos.at[:, 0].set(jnp.mod(pos[:, 0], size_x))
    pos = pos.at[:, 1].set(jnp.mod(pos[:, 1], size_y))

    lw = (lwp3d + iwp3d).reshape(-1)
    tc = tau_cloud3d.reshape(-1)

    def cell(p, d, n):
        return jnp.clip((p / d).astype(jnp.int32), 0, n - 1)

    def cond(c):
        pos, *_ , alive, step = c
        return jnp.logical_and(jnp.any(alive), step < 4 * (nx + ny + nz))

    def body(c):
        pos, liwp, tauc, dist, reached, alive, step = c
        ci = cell(pos[:, 0], dx, nx)
        cj = cell(pos[:, 1], dy, ny)
        ck = cell(pos[:, 2], dz, nz)
        ijk = (ck * ny + cj) * nx + ci

        def bdist(p, d, idx, dcell):
            hi = (idx + 1).astype(dtype) * dcell
            lo = idx.astype(dtype) * dcell
            return jnp.abs(jnp.where(d > 0, hi - p, lo - p)
                           / jnp.where(d == 0, eps, d))

        sx = bdist(pos[:, 0], direction[:, 0], ci, dx)
        sy = bdist(pos[:, 1], direction[:, 1], cj, dy)
        sz = bdist(pos[:, 2], direction[:, 2], ck, dz)
        s = jnp.minimum(sx, jnp.minimum(sy, sz))

        m = alive.astype(dtype)
        liwp = liwp + m * s * lw[ijk]
        tauc = tauc + m * s * tc[ijk]
        dist = dist + m * (1.0 - reached.astype(dtype)) * s
        reached = reached | (alive & (tc[ijk] > 0))

        newpos = pos + direction * s[:, None]
        newpos = newpos + jnp.where(direction >= 0, s_eps, -s_eps)
        newpos = newpos.at[:, 0].set(jnp.mod(newpos[:, 0], size_x))
        newpos = newpos.at[:, 1].set(jnp.mod(newpos[:, 1], size_y))
        pos = jnp.where(alive[:, None], newpos, pos)
        alive = alive & (pos[:, 2] <= size_z - s_eps) & (pos[:, 2] >= s_eps)
        return pos, liwp, tauc, dist, reached, alive, step + 1

    zeros = jnp.zeros(npix, dtype)
    alive0 = (pos[:, 2] <= size_z - s_eps) & (pos[:, 2] >= s_eps)
    pos, liwp, tauc, dist, reached, alive, _ = jax.lax.while_loop(
        cond, body,
        (pos, zeros, zeros, zeros, jnp.zeros(npix, bool), alive0,
         jnp.zeros((), jnp.int32)))

    shape = (camera.ny, camera.nx)
    return (
        (liwp / dz).reshape(shape),
        (tauc / dz).reshape(shape),
        jnp.where(reached, dist, -1.0).reshape(shape),
        jnp.arccos(jnp.clip(direction[:, 2], -1.0, 1.0)).reshape(shape),
    )
