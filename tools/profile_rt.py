"""Capture a jax.profiler trace of the MC forward tracer's while_loop and
print the per-op breakdown — attributes the step body to scatters /
gathers / RNG / elementwise so the optimization target is measured, not
guessed.

Usage: python tools/profile_rt.py [nx] [nz] [ppp] [outdir]
Then:  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python tools/xplane_summary.py <outdir> 40
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

NX = int(sys.argv[1]) if len(sys.argv) > 1 else 64
NZ = int(sys.argv[2]) if len(sys.argv) > 2 else 64
PPP = int(sys.argv[3]) if len(sys.argv) > 3 else 32
OUTDIR = sys.argv[4] if len(sys.argv) > 4 else "/tmp/jaxprof_rt"
# bench_rt reads sys.argv at import; keep only our shape args visible.
sys.argv = sys.argv[:4]


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
    # knull grid: the measured sweep winner (PERF.md round 4) unless
    # overridden — coarse beats reference-parity fine on lock-step SIMD.
    kn_env = os.environ.get("BENCH_RT_KNULL")
    kn = (tuple(int(v) for v in kn_env.split(",")) if kn_env else (4, 4, 4))

    def run(key, kx):
        out = rt.trace_rays(
            key, kx, *fields[1:], None, alb, kn, grid_d,
            jnp.float32(1361.0 * 0.8), jnp.float32(0.0), sun,
            photons_per_pixel=PPP, independent_column=False)
        return out.flux_sfc_dir + out.flux_sfc_dif

    fn = jax.jit(run)
    key = jax.random.key(0)
    warm = float(np.asarray(fn(key, fields[0])).mean())
    assert np.isfinite(warm) and warm > 0, warm
    t0 = time.perf_counter()
    with jax.profiler.trace(OUTDIR):
        out = fn(jax.random.fold_in(key, 1), fields[0])
        print("final:", float(out.sum()), flush=True)
    print(f"traced solve: {time.perf_counter() - t0:.2f} s")

    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    import subprocess

    subprocess.run([sys.executable, "tools/xplane_summary.py", OUTDIR, "30"],
                   env=dict(os.environ))


if __name__ == "__main__":
    main()
