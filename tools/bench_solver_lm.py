"""A/B the layer-grid solvers against the first-generation fused solvers.

Both are measured FROM THE INTERCHANGE FORMAT the interpolation kernels
produce — cell-major (N, G) {1,0} planes — so the old path's cost
includes the (ncol, nlay*G) retiling copies it forces and the new path's
includes its HBM-staged intermediates.  The old path's input is the
column-major cell order (c*nlay + l), the new path's the layer-major
order (l*ncol + c); both reshapes from the 3D fixture are physical
transposes applied OUTSIDE the timed region.

Usage: python tools/bench_solver_lm.py [ncol] [nlay] [ngpt] [reps]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

NCOL = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
NLAY = int(sys.argv[2]) if len(sys.argv) > 2 else 72
NGPT = int(sys.argv[3]) if len(sys.argv) > 3 else 128
ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 10


def main():
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    _cfg.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from rte_rrtmgp_tpu.ops import rte_lw
    from rte_rrtmgp_tpu.ops.pallas import solver_kernels as sk
    from rte_rrtmgp_tpu.ops.pallas import solver_layergrid as slg

    rng = np.random.default_rng(0)
    f32 = np.float32
    tau3 = (rng.uniform(0, 2, (NCOL, NLAY, NGPT)) ** 2).astype(f32)
    lay3 = 20.0 * rng.uniform(0.1, 1, (NCOL, NLAY, NGPT)).astype(f32)
    lev3 = 20.0 * rng.uniform(0.1, 1, (NCOL, NLAY + 1, NGPT)).astype(f32)
    ssa3 = rng.uniform(0.05, 0.999, (NCOL, NLAY, NGPT)).astype(f32)
    g3 = rng.uniform(0, 0.85, (NCOL, NLAY, NGPT)).astype(f32)
    mu0 = jnp.asarray(rng.uniform(0.2, 1, NCOL).astype(f32))
    c2 = lambda: jnp.asarray(rng.uniform(0.1, 1, (NCOL, NGPT)).astype(f32))
    emis, ssrc, sjac, inc = c2(), c2(), c2(), c2()
    adir, adif, incd = c2(), c2(), c2()

    cm = lambda a: jnp.asarray(a.reshape(-1, NGPT))          # (N, G) cell-major
    lm = lambda a: jnp.asarray(
        np.transpose(a, (1, 0, 2)).reshape(-1, NGPT))        # layer-major
    D = float(rte_lw.GAUSS_DS[0, 0])
    w = float(rte_lw.GAUSS_WTS[0, 0])

    def old_lw(t, la, le, *cols):
        t3 = t.reshape(NCOL, NLAY, NGPT)
        la3 = la.reshape(NCOL, NLAY, NGPT)
        le3 = le.reshape(NCOL, NLAY + 1, NGPT)
        return sk.lw_sweep_broadband(t3, la3, le3, *cols, D=D, w=w)

    def new_lw(t, la, le, *cols):
        return slg.lw_sweep_broadband_lm(t, la, le, *cols, ncol=NCOL,
                                         D=D, w=w)

    def old_sw(t, s, g, *cols):
        t3 = t.reshape(NCOL, NLAY, NGPT)
        s3 = s.reshape(NCOL, NLAY, NGPT)
        g3_ = g.reshape(NCOL, NLAY, NGPT)
        return sk.sw_2stream_broadband(t3, s3, g3_, mu0, *cols)

    def new_sw(t, s, g, *cols):
        return slg.sw_2stream_broadband_lm(t, s, g, mu0, *cols, ncol=NCOL)

    def run(name, fn, args):
        jf = jax.jit(fn)
        out = jf(*args)
        warm = float(np.asarray(out[0]).ravel()[1])
        assert np.isfinite(warm), (name, warm)
        best = float("inf")
        for _ in range(3):
            a0 = args[0]
            aa = list(args)
            t0 = time.perf_counter()
            for it in range(ITERS):
                out = jf(*aa)
                aa[0] = a0 * (1.0 + 1e-6 * it) + 0.0 * out[0][0, 0]
            float(out[0].sum())
            best = min(best, (time.perf_counter() - t0) / ITERS)
        return best * 1e3

    res = {"shape": f"{NCOL}x{NLAY}x{NGPT}"}
    res["lw_old_ms"] = round(run(
        "lw_old", old_lw, (cm(tau3), cm(lay3), cm(lev3), emis, ssrc, sjac,
                           inc)), 3)
    res["lw_lm_ms"] = round(run(
        "lw_lm", new_lw, (lm(tau3), lm(lay3), lm(lev3), emis, ssrc, sjac,
                          inc)), 3)
    res["sw_old_ms"] = round(run(
        "sw_old", old_sw, (cm(tau3), cm(ssa3), cm(g3), adir, adif, incd)), 3)
    res["sw_lm_ms"] = round(run(
        "sw_lm", new_sw, (lm(tau3), lm(ssa3), lm(g3), adir, adif, incd)), 3)
    import jax as _j
    res["platform"] = _j.devices()[0].platform
    print(json.dumps(res))


if __name__ == "__main__":
    main()
