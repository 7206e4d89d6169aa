"""Microbenchmark of the Pallas interpolation kernel variants at the
production LW shape (kmajor+planck fused pair, N = 2048x72 cells, G gpt).

Each variant runs K chained kernel calls inside ONE jit (call i+1's weight
plane data-depends on call i's output), so the tunneled dispatch latency
amortizes and per-call time = wall / K.  Fetch-synced, value-varying.

Usage: python tools/bench_interp.py [G] [block]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

G = int(sys.argv[1]) if len(sys.argv) > 1 else 128
BLOCK = int(sys.argv[2]) if len(sys.argv) > 2 else 256
N = 2048 * 72
R = 854          # LW kmajor rows: (npress+1=61) * ntemp=14
E = 9
K = 10


def main():
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    import jax
    import jax.numpy as jnp

    from rte_rrtmgp_tpu.ops.pallas import interp_kernel as ik

    rng = np.random.default_rng(0)
    f32 = lambda *s: rng.random(s, dtype=np.float32)
    tbl1 = jnp.asarray(f32(R, E, G))
    tbl2 = jnp.asarray(f32(R, E, G))
    coherent = len(sys.argv) <= 3 or sys.argv[3] != "random"
    if coherent:
        # Production-like rows: cells are (col, lay) ordered and jpress/
        # jtemp ramp smoothly with layer, so adjacent cells hit adjacent
        # table rows.
        ramp = np.linspace(0, R - 17, 72).astype(np.int64)
        base = np.tile(ramp, N // 72)[:, None]
    else:
        base = rng.integers(0, R - 16, (N, 1))
    rows4 = jnp.asarray(base.repeat(4, 1) + np.array([0, 14, 1, 15]),
                        dtype=jnp.int32)
    jes = tuple(jnp.asarray(rng.integers(0, E - 1, (N, G)), jnp.int32)
                for _ in range(2))
    fms = tuple(jnp.asarray(f32(N, G)) for _ in range(4))
    fp = jnp.asarray(f32(N))
    cms = tuple(jnp.asarray(f32(N, G)) for _ in range(2))
    metas = (((0, 0, 1, 1), True, True), ((0, 0, 1, 1), True, False))

    def variant(vec, unroll):
        def run(tbl1, tbl2, rows4, jes, fms, fp, cms):
            # K chained executions of ONE pallas instance (fori_loop: a
            # single Mosaic kernel compile; each iteration's input
            # data-depends on the previous output).  All arrays are jit
            # ARGUMENTS — closures would embed them as HLO constants and
            # blow the remote-compile request size.
            def body(i, carry):
                f0, acc = carry
                o1, o2 = ik.interp_rows_multi(
                    [tbl1, tbl2], [rows4, rows4], jes, (f0,) + fms[1:],
                    [fp, fp], [cms, None], metas=metas, neta=E, block=BLOCK,
                    vec=vec, unroll=unroll)
                return fms[0] + 1e-9 * o1, acc + o2[0, 0]
            f0, acc = jax.lax.fori_loop(0, K, body,
                                        (fms[0], jnp.float32(0.0)))
            return f0, acc
        return jax.jit(run)

    for name, vec, unroll in (("scalar u1", False, 1), ("u2", False, 2),
                              ("u4", False, 4), ("u8", False, 8),
                              ("vec8-mxu", True, 1)):
        try:
            fn = variant(vec, unroll)
            t0 = time.perf_counter()
            out, acc = fn(tbl1, tbl2, rows4, jes, fms, fp, cms)
            print(f"{name:12s} compiled+first in "
                  f"{time.perf_counter()-t0:6.1f}s", flush=True)
            assert np.isfinite(float(acc))
            best = float("inf")
            for rep in range(3):
                f_r = (jnp.asarray(fms[0] * np.float32(1 + 1e-6 * (rep + 1))),
                       ) + fms[1:]
                jax.block_until_ready(f_r)
                t0 = time.perf_counter()
                out, acc = fn(tbl1, tbl2, rows4, jes, f_r, fp, cms)
                float(acc)
                best = min(best, (time.perf_counter() - t0) / K)
            print(f"{name:12s} {best*1e3:8.3f} ms/call "
                  f"(2 tables, N={N}, G={G}, block={BLOCK})", flush=True)
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            print(f"{name:12s} FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
