"""Autotune the backward (camera) renderer's knobs on the live device.

Sweeps the respawn mode (pool row-gather vs fifo global ray queue) and
steps-per-dispatch at the flagship frame workload (64x64 px broadband
fisheye over a cloudy domain — the PERF.md bar configuration), persists
the winner under the ``bw_render`` key, which
``raytracer_bw.trace_rays_bw(respawn_mode="auto")`` consults at trace
time.  Candidates run in their own subprocess (knobs are read at trace
time — see tune_radiation.py).

Usage: python tuning/tune_bw.py [cam_px] [ppp]
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

CAM = int(os.environ.get("TUNE_BW_CAM", "64"))
PPP = int(os.environ.get("TUNE_BW_PPP", "8"))
ITERS = 1


def run_candidate(cand):
    import jax
    import jax.numpy as jnp

    from rte_rrtmgp_tpu.data import synthetic
    from rte_rrtmgp_tpu.models import KDist
    from rte_rrtmgp_tpu.models import raytracer_bw as rbw
    from rte_rrtmgp_tpu.models.radiation_bw import RadiationSolverBW
    from rte_rrtmgp_tpu.cases.profiles import make_atmosphere

    sys.path.insert(0, os.path.join(_REPO, "tests"))
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
            steps_per_dispatch=cand.get("steps_per_dispatch", 4))

    key = jax.random.PRNGKey(0)
    out = render(key, t_lay0)
    rad = np.asarray(out["radiance"])
    assert np.isfinite(rad).all() and rad.max() > 0, rad
    best = float("inf")
    for rep in range(2):
        t_lay = t_lay0
        t0 = time.perf_counter()
        for it in range(ITERS):
            out = render(jax.random.fold_in(key, 1 + rep * ITERS + it),
                         jnp.asarray(t_lay))
            t_lay = t_lay0 * (1.0 + 1e-6 * (it + 1))
        float(np.asarray(out["radiance"]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main():
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    _cfg.enable_compilation_cache()
    from rte_rrtmgp_tpu.utils import tuner

    candidates = [
        {"respawn_mode": "pool", "steps_per_dispatch": 4},
        {"respawn_mode": "fifo", "steps_per_dispatch": 4},
        {"respawn_mode": "fifo", "steps_per_dispatch": 14},
    ]

    results = []
    for cand in candidates:
        env = dict(os.environ, TUNE_BW_CAM=str(CAM), TUNE_BW_PPP=str(PPP),
                   RTE_RRTMGP_BW_RESPAWN=cand["respawn_mode"])
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 json.dumps(cand)],
                env=env, capture_output=True, text=True, timeout=3000,
                cwd=_REPO)
        except subprocess.TimeoutExpired:
            print(f"{cand}: FAILED (timeout)", flush=True)
            continue
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("RESULT ")), None)
        if proc.returncode != 0 or line is None:
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
            print(f"{cand}: FAILED ({' | '.join(tail)})", flush=True)
            continue
        dt = float(line.split()[1])
        results.append((dt, cand))
        print(f"{cand}: {dt:8.2f} s/frame", flush=True)

    if not results:
        print("no candidate succeeded")
        sys.exit(1)
    results.sort(key=lambda r: r[0])
    best_dt, best = results[0]
    print(f"\nwinner: {best} ({best_dt:.2f} s/frame)")

    entry = {
        "config": best, "ms": best_dt * 1e3,
        "all": [{"config": c, "ms": d * 1e3} for d, c in results],
    }
    key = tuner._key("bw_render", {"cam": CAM, "ppp": PPP})
    tuner._load_disk()
    with tuner._lock:
        tuner._memory_cache[key] = entry
        tuner._save_disk()
    print(f"persisted to {tuner._cache_path()}")

    import platform as _platform

    import jax
    defaults_path = tuner._repo_defaults_path()
    try:
        with open(defaults_path) as f:
            defaults = json.load(f)
    except (OSError, ValueError):
        defaults = {}
    defaults[key] = dict(entry, platform=jax.devices()[0].platform,
                         host=_platform.machine())
    with open(defaults_path, "w") as f:
        json.dump(defaults, f, indent=1, sort_keys=True)
    print(f"persisted to {defaults_path}")


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        print(f"RESULT {run_candidate(json.loads(sys.argv[2]))}")
    else:
        if len(sys.argv) > 1:
            CAM = int(sys.argv[1])
        if len(sys.argv) > 2:
            PPP = int(sys.argv[2])
        main()
