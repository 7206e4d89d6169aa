"""Forward Monte-Carlo ray-tracer benchmark at the reference's flagship
RCEMIP-like scale (rcemip/test_rcemip_input.py: 64x64 columns; photon grid
per src_cuda_rt/Raytracer.cu:344-374).

Workload: 64x64x64 cells, idealized cloud deck + exponential gas
extinction, 32 photons per pixel, a scan over NGPT g-points (the rt
driver's spectral streaming).  Reports photons/s and ms per g-point.

Timing: fetch-synchronized, value-varying (tunneled-runtime safe; see
bench.py docstring).

Usage: python tools/bench_rt.py [nx] [nz] [ppp] [ngpt]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

def _argv_int(i, default):
    """argv parsing safe under IMPORT by other tools (tune_rt.py imports
    make_fields/measure_mc while holding its own argv)."""
    try:
        return int(sys.argv[i])
    except (IndexError, ValueError):
        return default


NX = _argv_int(1, 64)
NZ = _argv_int(2, 64)
PPP = _argv_int(3, 32)
NGPT = _argv_int(4, 2)
ITERS = 3


def make_fields(nz, ny, nx, seed=0):
    """Idealized RCEMIP-ish single-g-point optics: exponential gas profile
    with Rayleigh scattering + a broken cloud deck.  The gas extinction is
    normalized to a FIXED column optical depth (the nz=64 value) so deeper
    grids refine the same atmosphere instead of thickening it — at the
    un-normalized 256-layer depth the column hit ~12 optical depths and no
    photon reached the surface."""
    rng = np.random.default_rng(seed)
    z = (np.arange(nz) + 0.5) / nz
    k_gas = (64.0 / nz) * (
        0.3e-3 * np.exp(-3.0 * z))[:, None, None] * np.ones((nz, ny, nx))
    ssa_gas = 0.3
    cloud = np.zeros((nz, ny, nx), np.float32)
    deck = (rng.random((ny, nx)) < 0.4)
    zc0, zc1 = int(0.2 * nz), int(0.3 * nz)
    cloud[zc0:zc1] = (64.0 / nz) * 10e-3 * deck \
        * rng.uniform(0.5, 1.5, (zc1 - zc0, ny, nx))
    k_ext = (k_gas + cloud).astype(np.float32)
    k_sca_gas = (k_gas * ssa_gas).astype(np.float32)
    k_sca_cld = (cloud * 0.9999).astype(np.float32)
    asy_cld = np.full((nz, ny, nx), 0.86, np.float32)
    zeros = np.zeros((nz, ny, nx), np.float32)
    return k_ext, k_sca_gas, k_sca_cld, zeros, asy_cld, zeros


def measure_mc(nx=64, nz=256, ppp=32, ngpt=1, kn=(4, 4, 4), mode="scan",
               compact=True, respawn="fifo", iters=3, reps=3):
    """Measure the forward MC tracer at the bench workload; returns a
    result dict.  Shared by the standalone CLI below and the repo-root
    bench.py (identical traces -> the persistent compilation cache hits
    across both entry points)."""
    import jax
    import jax.numpy as jnp

    from rte_rrtmgp_tpu.models import raytracer as rt

    ny = nx
    fields = [jnp.asarray(f) for f in make_fields(nz, ny, nx)]
    alb = jnp.full((ny, nx), 0.06, jnp.float32)
    sun = jnp.asarray(rt.sun_direction_from_angles(0.64, 0.0), jnp.float32)
    grid_d = (500.0, 100.0, 100.0)
    NGPT, PPP = ngpt, ppp
    ITERS = iters

    def one_gpt(key, kx, g):
        out = rt.trace_rays(
            jax.random.fold_in(key, g), kx, *fields[1:], None, alb,
            kn, grid_d, jnp.float32(1361.0 * 0.8 / NGPT),
            jnp.float32(0.0), sun, photons_per_pixel=PPP,
            independent_column=False, compact=compact,
            respawn_mode=respawn)
        return out.flux_sfc_dir + out.flux_sfc_dif

    def run(key, kx):
        if mode == "pooled":
            # Spectral pooling (trace_rays_pooled): all NGPT g-points'
            # photons share ONE launch pool; lanes respawn into the next
            # g-point's photons so the long-walk tail is paid once per
            # window instead of once per g-point (62% of iterations were
            # tail at NGPT=1; tools/diag_rt_tail.py).
            stacked = [jnp.broadcast_to(f, (NGPT,) + f.shape) for f in
                       [kx, *fields[1:]]]
            out = rt.trace_rays_pooled(
                key, *stacked, None,
                jnp.broadcast_to(alb, (NGPT,) + alb.shape), kn, grid_d,
                jnp.full((NGPT,), 1361.0 * 0.8 / NGPT, jnp.float32),
                jnp.zeros((NGPT,), jnp.float32), sun,
                photons_per_pixel=PPP, independent_column=False,
                compact=compact, respawn_mode=respawn)
            return out.flux_sfc_dir + out.flux_sfc_dif
        if mode == "lanes":
            # Spectral-lane merge (the drivers' --spectral-mode lanes): all
            # NGPT g-points trace concurrently in ONE batched photon loop —
            # NGPT x the vector width, iteration count = the max walk
            # length over the window instead of the sum.
            return jax.vmap(lambda g: one_gpt(key, kx, g))(
                jnp.arange(NGPT)).sum(axis=0)
        def gpt_body(acc, g):
            return acc + one_gpt(key, kx, g), None
        acc, _ = jax.lax.scan(gpt_body, jnp.zeros((ny, nx), jnp.float32),
                              jnp.arange(NGPT))
        return acc

    fn = jax.jit(run)
    # BENCH_RT_RNG=rbg swaps the counter-based threefry generator for the
    # hardware RBG (the step draws 13 x n_lanes uniforms per iteration;
    # threefry is a large share of the body's VPU work — the reference
    # uses cheap XORWOW/Sobol, raytracer_kernels.cu:13-50).  rbg output is
    # hardware-dependent, so it is a bench knob, not the default.
    impl = os.environ.get("BENCH_RT_RNG", "threefry2x32")
    key = jax.random.key(0, impl=impl)
    out = fn(key, fields[0])
    warm = float(np.asarray(out).mean())
    assert np.isfinite(warm) and warm > 0, warm

    best = float("inf")
    kx0 = fields[0]
    for rep in range(reps):
        kx = kx0
        t0 = time.perf_counter()
        for it in range(ITERS):
            out = fn(jax.random.fold_in(key, 1000 + rep * ITERS + it), kx)
            kx = kx0 * (1.0 + 1e-6 * (it + 1)) + 0.0 * out[0, 0]
        float(out.sum())
        best = min(best, (time.perf_counter() - t0) / ITERS)

    n_photons = ny * nx * PPP * NGPT
    return {
        "metric": f"MC forward tracer photons/s ({nx}x{nx}x{nz}, "
                  f"{NGPT} gpt, {PPP} ppp, {mode})",
        "value": round(n_photons / best, 1),
        "unit": "photons/s",
        "ms_per_gpt": round(best / NGPT * 1e3, 2),
        "sfc_mean_wm2": round(warm, 3),
        "respawn": respawn,
        "knull": list(kn),
    }


def main():
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    _cfg.enable_compilation_cache()
    import jax

    # knull grid: default (4,4,4), the round-4 sweep winner (PERF.md) —
    # the SIMD tracer pays one while iteration per knull-cell crossing,
    # so coarse beats the reference's rcemip ngrid (48, 48, 32)
    # (test_rcemip_input_rt.py:171-173) by 4.1x at equal physics.
    # Override for A/Bs via BENCH_RT_KNULL=z,y,x (tools/ab_rt_knull.py
    # measures wall AND while-loop iterations per shape).
    kn_env = os.environ.get("BENCH_RT_KNULL")
    kn = (tuple(int(v) for v in kn_env.split(",")) if kn_env
          else (4, 4, 4))
    res = measure_mc(
        nx=NX, nz=NZ, ppp=PPP, ngpt=NGPT, kn=kn,
        mode=os.environ.get("BENCH_RT_MODE", "scan"),
        # BENCH_RT_COMPACT=0 disables staged width compaction (A/B knob);
        # BENCH_RT_RESPAWN selects the respawn strategy (fifo/arith/pool).
        compact=os.environ.get("BENCH_RT_COMPACT", "1") != "0",
        respawn=os.environ.get("BENCH_RT_RESPAWN", "fifo"))
    res["platform"] = jax.devices()[0].platform
    print(json.dumps(res))


if __name__ == "__main__":
    main()
