"""Diagnose the MC tracer's long-walk tail: per-phase while-iteration
counts + wall time per (knull, compact_floor) combination.

The hypothesis (VERDICT r3 item 1 follow-up): mean walk is ~25 events but
the max walk is ~50x longer, so most iterations run at the compaction
floor with a handful of alive lanes, and per-iteration latency does not
shrink with width — making the tail latency-bound.  This measures where
the iterations actually go.

Usage: python tools/diag_rt_tail.py [nx] [nz] [ppp]
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

    combos = [
        ((4, 4, 4), 2048),
        ((4, 4, 4), 512),
        ((4, 4, 4), 128),
        ((2, 2, 2), 2048),
        ((1, 1, 1), 2048),
        ((2, 4, 4), 512),
    ]
    for kn, floor in combos:
        def run(key, kx, kn=kn, floor=floor):
            out, aux = rt.trace_rays(
                key, kx, *fields[1:], None, alb, kn, grid_d,
                jnp.float32(1361.0 * 0.8), jnp.float32(0.0), sun,
                photons_per_pixel=PPP, independent_column=False,
                compact_floor=floor, return_aux=True)
            return (out.flux_sfc_dir + out.flux_sfc_dif,
                    aux["steps"], aux["phase_steps"])

        fn = jax.jit(run)
        key = jax.random.key(0)
        out, steps, psteps = fn(key, fields[0])
        warm = float(np.asarray(out).mean())
        assert np.isfinite(warm) and warm > 0, warm
        pst = np.asarray(psteps).tolist()

        kx0 = fields[0]
        best = float("inf")
        for rep in range(2):
            kx = kx0 * (1.0 + 1e-6 * rep)
            t0 = time.perf_counter()
            out, steps, psteps = fn(jax.random.fold_in(key, 1 + rep), kx)
            float(out.sum())
            best = min(best, time.perf_counter() - t0)
        pps = NX * NX * PPP / best
        print(json.dumps({
            "kn": kn, "floor": floor, "s_per_gpt": round(best, 3),
            "photons_per_s": round(pps, 1), "steps": int(steps),
            "phase_cum_steps": pst, "sfc_mean": round(warm, 3)}),
            flush=True)


if __name__ == "__main__":
    main()
