"""Backward (camera) ray-tracer benchmark — ms per rendered frame.

Set BENCH_BW_NEE=field to time the deterministic sun-transmission-field
preview mode instead of the default unbiased stochastic walk.

The reference's hottest rt kernel is the backward camera render
(``src_kernels_cuda_rt/raytracer_kernels_bw.cu:309``); its driver renders
one camera frame by looping over the spectral steps
(``src_test/Radiation_solver_bw.cu:960-1120``).  This bench renders a
broadband fisheye frame over a cloudy domain with a reduced spectral
resolution (1 g-point per SW band, the knob the reference exposes through
its coefficient files) and reports ms/frame plus camera rays/s
(pixels x ppp x spectral steps / s).

Timing: fetch-synchronized, value-varying (see bench.py docstring).

Usage: python tools/bench_bw.py [cam_px] [ppp]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

CAM = int(sys.argv[1]) if len(sys.argv) > 1 else 256
PPP = int(sys.argv[2]) if len(sys.argv) > 2 else 16
ITERS = 2


def main():
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    _cfg.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from rte_rrtmgp_tpu.data import synthetic
    from rte_rrtmgp_tpu.models import KDist
    from rte_rrtmgp_tpu.models import raytracer_bw as rbw
    from rte_rrtmgp_tpu.models.radiation_bw import RadiationSolverBW
    from rte_rrtmgp_tpu.cases.profiles import make_atmosphere

    sys.path.insert(0, "tests")
    from helpers import GASES

    kd = KDist.from_raw(synthetic.make_kdist_raw(False, gpt_per_band=1),
                        GASES, dtype=np.float32)
    ny = nx = 32
    nz, nlay = 24, 36
    atm = make_atmosphere(ny * nx, nlay, seed=4, perturb=True)
    cam = rbw.Camera(cam_type=0, ny=CAM, nx=CAM, fov=180.0,
                     position=(nx * 500.0 / 2, ny * 500.0 / 2, 100.0))
    z_lev = np.arange(nlay + 1) * 400.0
    solver = RadiationSolverBW(kd)
    t_lay0 = np.asarray(atm["t_lay"])

    def render(key, t_lay):
        return solver.solve(
            gas_concs=atm["gas_concs"], p_lay=atm["p_lay"],
            p_lev=atm["p_lev"], t_lay=t_lay,
            mu0=np.full(ny * nx, 0.7), azi=np.zeros(ny * nx),
            sfc_alb=np.full((ny * nx, kd.nbnd), 0.1),
            land_use_map=np.zeros(ny * nx), camera=cam,
            grid_cells=(nz, ny, nx), grid_d=(400.0, 500.0, 500.0),
            kn_grid=(4, 4, 4), z_lev=z_lev, photons_per_pixel=PPP,
            mode="broadband", key=key,
            nee_mode=os.environ.get("BENCH_BW_NEE", "walk"),
            spectral_mode=os.environ.get("BENCH_BW_SPECTRAL", "scan"),
            steps_per_dispatch=int(os.environ.get("BENCH_BW_SPD", "4")))

    key = jax.random.PRNGKey(0)
    out = render(key, t_lay0)
    rad = np.asarray(out["radiance"])
    assert np.isfinite(rad).all() and rad.max() > 0, rad

    best = float("inf")
    for rep in range(3):
        t_lay = t_lay0
        t0 = time.perf_counter()
        for it in range(ITERS):
            out = render(jax.random.fold_in(key, 1 + rep * ITERS + it),
                         jnp.asarray(t_lay))
            t_lay = t_lay0 * (1.0 + 1e-6 * (it + 1))
        float(np.asarray(out["radiance"]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / ITERS)

    n_rays = CAM * CAM * PPP * kd.ngpt
    print(json.dumps({
        "metric": f"bw camera render ({CAM}x{CAM} px, {PPP} ppp, "
                  f"{kd.ngpt} spectral steps, {nx}x{ny}x{nz} domain)",
        "value": round(best * 1e3, 2),
        "unit": "ms/frame",
        "camera_rays_per_s": round(n_rays / best, 1),
        "radiance_mean": round(float(rad.mean()), 4),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
