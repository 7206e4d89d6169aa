"""A/B the pooled spectral-window tracer vs per-g-point scan, with
while-iteration counts, so the tail-amortization win and the bigger
gather-table cost are separated (PERF.md round 4).

Usage: python tools/ab_rt_pooled.py [nx] [nz] [ppp] [gpts...]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

NX = int(sys.argv[1]) if len(sys.argv) > 1 else 64
NZ = int(sys.argv[2]) if len(sys.argv) > 2 else 256
PPP = int(sys.argv[3]) if len(sys.argv) > 3 else 32
GS = [int(v) for v in sys.argv[4:]] or [1, 2, 4, 8]


def main():
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    _cfg.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench_rt import make_fields
    from rte_rrtmgp_tpu.models import raytracer as rt

    ny = nx = NX
    fields = [jnp.asarray(f) for f in make_fields(NZ, ny, nx)]
    alb = jnp.full((ny, nx), 0.06, jnp.float32)
    sun = jnp.asarray(rt.sun_direction_from_angles(0.64, 0.0), jnp.float32)
    grid_d = (500.0, 100.0, 100.0)
    kn = (4, 4, 4)

    for G in GS:
        def run(key, kx, G=G):
            stacked = [jnp.broadcast_to(f, (G,) + f.shape) for f in
                       [kx, *fields[1:]]]
            out, aux = rt.trace_rays_pooled(
                key, *stacked, None, jnp.broadcast_to(alb, (G,) + alb.shape),
                kn, grid_d, jnp.full((G,), 1361.0 * 0.8 / G, jnp.float32),
                jnp.zeros((G,), jnp.float32), sun,
                photons_per_pixel=PPP, return_aux=True)
            return out.flux_sfc_dir + out.flux_sfc_dif, aux["steps"]

        fn = jax.jit(run)
        key = jax.random.key(0)
        out, steps = fn(key, fields[0])
        warm = float(np.asarray(out).mean())
        nsteps = int(steps)
        assert np.isfinite(warm) and warm > 0, warm

        kx0 = fields[0]
        best = float("inf")
        for rep in range(2):
            kx = kx0 * (1.0 + 1e-6 * rep)
            t0 = time.perf_counter()
            out, steps = fn(jax.random.fold_in(key, 1 + rep), kx)
            float(out.sum())
            best = min(best, time.perf_counter() - t0)
        pps = NX * NX * PPP * G / best
        print(json.dumps({
            "G": G, "s_per_window": round(best, 3),
            "photons_per_s": round(pps, 1), "while_steps": nsteps,
            "steps_per_gpt": round(nsteps / G, 1),
            "us_per_step": round(best / nsteps * 1e6, 1),
            "sfc_mean": round(warm, 3)}), flush=True)


if __name__ == "__main__":
    main()
