"""Autotune the forward MC tracer's step-body knobs on the live device.

Per-workload counterpart of ``tune_radiation.py`` for the ray tracer
(the reference tunes its rt kernels the same way it tunes the batch
kernels — ``include/tuner.h:79-182`` wraps ``ray_tracer_kernel`` launches
too).  Sweeps (respawn_mode, compact_floor, photons_per_lane) at a given
domain, persists the winner to the tuner cache AND the checked-in
``tuning/tuned_defaults.json`` under the ``rt_trace`` key, which
``raytracer.trace_rays(respawn_mode="auto")`` consults at trace time.

Each candidate runs in its own subprocess (knobs are read at trace time;
see tune_radiation.py for why in-process flips would silently reuse the
first-traced executable).

Usage: python tuning/tune_rt.py [nx] [nz] [ppp]
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

NX = int(os.environ.get("TUNE_RT_NX", "64"))
NZ = int(os.environ.get("TUNE_RT_NZ", "256"))
PPP = int(os.environ.get("TUNE_RT_PPP", "32"))
ITERS = 2


def run_candidate(cand):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from bench_rt import make_fields

    from rte_rrtmgp_tpu.models import raytracer as rt

    ny = nx = NX
    fields = [jnp.asarray(f) for f in make_fields(NZ, ny, nx)]
    alb = jnp.full((ny, nx), 0.06, jnp.float32)
    sun = jnp.asarray(rt.sun_direction_from_angles(0.64, 0.0), jnp.float32)

    def run(key, kx):
        out = rt.trace_rays(
            key, kx, *fields[1:], None, alb, (4, 4, 4),
            (500.0, 100.0, 100.0), jnp.float32(1361.0 * 0.8),
            jnp.float32(0.0), sun, photons_per_pixel=PPP,
            independent_column=False,
            respawn_mode=cand["respawn_mode"],
            compact_floor=cand["compact_floor"],
            photons_per_lane=cand.get("photons_per_lane"))
        return out.flux_sfc_dir + out.flux_sfc_dif

    fn = jax.jit(run)
    key = jax.random.key(0)
    kx0 = fields[0]
    warm = float(np.asarray(fn(key, kx0)).mean())
    assert np.isfinite(warm) and warm > 0, warm
    best = float("inf")
    for rep in range(2):
        kx = kx0
        t0 = time.perf_counter()
        for it in range(ITERS):
            out = fn(jax.random.fold_in(key, 1 + rep * ITERS + it), kx)
            kx = kx0 * (1.0 + 1e-6 * (it + 1)) + 0.0 * out[0, 0]
        float(out.sum())
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main():
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    _cfg.enable_compilation_cache()
    from rte_rrtmgp_tpu.utils import tuner

    candidates = []
    for mode in ("fifo", "arith"):
        for floor in (128, 512):
            candidates.append({"respawn_mode": mode, "compact_floor": floor})
    candidates.append({"respawn_mode": "fifo", "compact_floor": 128,
                       "photons_per_lane": 1})

    results = []
    for cand in candidates:
        env = dict(os.environ, TUNE_RT_NX=str(NX), TUNE_RT_NZ=str(NZ),
                   TUNE_RT_PPP=str(PPP))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 json.dumps(cand)],
                env=env, capture_output=True, text=True, timeout=1800,
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
        photons = NX * NX * PPP
        print(f"{cand}: {dt*1e3:8.1f} ms = {photons/dt:9.0f} photons/s",
              flush=True)

    if not results:
        print("no candidate succeeded")
        sys.exit(1)
    results.sort(key=lambda r: r[0])
    best_dt, best = results[0]
    print(f"\nwinner: {best} ({best_dt*1e3:.1f} ms)")

    entry = {
        "config": best, "ms": best_dt * 1e3,
        "all": [{"config": c, "ms": d * 1e3} for d, c in results],
    }
    key = tuner._key("rt_trace", {"nx": NX, "nz": NZ, "ppp": PPP})
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
            NX = int(sys.argv[1])
        if len(sys.argv) > 2:
            NZ = int(sys.argv[2])
        if len(sys.argv) > 3:
            PPP = int(sys.argv[3])
        main()
