"""A/B the MC tracer's knull-grid shape on hardware (VERDICT r3 item 1).

The round-3 final commit changed the bench knull grid from coarse (4,4,4)
to reference-parity-fine (z, 48, 48) without an A/B; the lock-step SIMD
tracer pays ONE while_loop iteration per knull-cell boundary crossing, so
a fine grid multiplies iterations on near-ballistic paths, while a coarse
grid multiplies null collisions under the cloud-deck max.  This measures
both the wall time AND the loop-iteration count per shape so the winner
is explained, not guessed.

Usage: python tools/ab_rt_knull.py [nx] [nz] [ppp]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

NX = int(sys.argv[1]) if len(sys.argv) > 1 else 64
NZ = int(sys.argv[2]) if len(sys.argv) > 2 else 64
PPP = int(sys.argv[3]) if len(sys.argv) > 3 else 32
ITERS = 2


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

    shapes = [
        (4, 4, 4),
        (8, 8, 8),
        (16, 16, 16),
        (max(2, NZ // 8), 48, 48),
        (min(32, NZ), 48, 48),
        (max(2, NZ // 4), 16, 16),
    ]
    seen = set()
    results = []
    for kn in shapes:
        if kn in seen:
            continue
        seen.add(kn)

        def run(key, kx, kn=kn):
            out, aux = rt.trace_rays(
                key, kx, *fields[1:], None, alb, kn, grid_d,
                jnp.float32(1361.0 * 0.8), jnp.float32(0.0), sun,
                photons_per_pixel=PPP, independent_column=False,
                return_aux=True)
            return out.flux_sfc_dir + out.flux_sfc_dif, aux["steps"]

        fn = jax.jit(run)
        key = jax.random.key(0)
        out, steps = fn(key, fields[0])
        warm = float(np.asarray(out).mean())
        nsteps = int(steps)
        assert np.isfinite(warm) and warm > 0, warm

        best = float("inf")
        kx0 = fields[0]
        for rep in range(2):
            kx = kx0
            t0 = time.perf_counter()
            for it in range(ITERS):
                out, steps = fn(jax.random.fold_in(key, 1 + rep * ITERS + it),
                                kx)
                kx = kx0 * (1.0 + 1e-6 * (it + 1)) + 0.0 * out[0, 0]
            float(out.sum())
            best = min(best, (time.perf_counter() - t0) / ITERS)
        pps = NX * NX * PPP / best
        results.append({"kn": kn, "s_per_gpt": round(best, 3),
                        "photons_per_s": round(pps, 1),
                        "while_steps": nsteps,
                        "us_per_step": round(best / nsteps * 1e6, 1),
                        "sfc_mean": round(warm, 3)})
        print(json.dumps(results[-1]), flush=True)

    best = max(results, key=lambda r: r["photons_per_s"])
    print(json.dumps({"winner": best, "workload":
                      f"{NX}x{NX}x{NZ}, {PPP} ppp"}))


if __name__ == "__main__":
    main()
