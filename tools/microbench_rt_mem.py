"""Microbench: in-loop gather and scatter-add cost vs OPERAND SIZE.

Hypothesis from the pooled-tracer A/B (PERF.md round 4): XLA's TPU gather
lowering stages the table operand per loop iteration, so per-iteration
cost grows ~linearly with table bytes (not just index count).  This
isolates gather(table[M,8], idx[N]) and acc[M2].at[idx].add(v) inside a
fori_loop, sweeping M/M2 at fixed N.

Usage: python tools/microbench_rt_mem.py [N] [iters]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 300


def main():
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    _cfg.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    key = jax.random.key(0)

    def time_fn(fn, *args):
        f = jax.jit(fn)
        out = jax.block_until_ready(f(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            # fetch a scalar: tunneled block_until_ready is not a sync
            float(jnp.asarray(out).ravel()[0])
            best = min(best, (time.perf_counter() - t0) / ITERS)
        return best * 1e6

    for rows in (65536, 262144, 1048576, 4194304, 8388608):
        mb = rows * 8 * 4 / 1e6
        table = jax.random.uniform(key, (rows, 8), jnp.float32)

        def gather_loop(table, idx0):
            def body(i, carry):
                idx, s = carry
                cell = jnp.take(table, idx, axis=0)
                s = s + cell[:, 0]
                idx = (idx * 1103515245 + 12345 + i) % rows
                return idx, s
            _, s = jax.lax.fori_loop(
                0, ITERS, body, (idx0, jnp.zeros(N, jnp.float32)))
            return s

        idx0 = jax.random.randint(key, (N,), 0, rows, jnp.int32)
        us = time_fn(gather_loop, table, idx0)
        print(json.dumps({"op": "gather8", "rows": rows,
                          "mb": round(mb, 1), "us_per_iter": round(us, 1),
                          "us_per_mb": round(us / mb, 2)}), flush=True)

    for rows in (65536, 262144, 1048576, 4194304, 8388608):
        mb = rows * 4 / 1e6

        def scatter_loop(idx0, v):
            def body(i, carry):
                idx, acc = carry
                acc = acc.at[idx].add(v)
                idx = (idx * 1103515245 + 12345 + i) % rows
                return idx, acc
            _, acc = jax.lax.fori_loop(
                0, ITERS, body, (idx0, jnp.zeros(rows, jnp.float32)))
            return acc

        idx0 = jax.random.randint(key, (N,), 0, rows, jnp.int32)
        v = jax.random.uniform(key, (N,), jnp.float32)
        us = time_fn(scatter_loop, idx0, v)
        print(json.dumps({"op": "scatter1_flat", "rows": rows,
                          "mb": round(mb, 1), "us_per_iter": round(us, 1),
                          "us_per_mb": round(us / mb, 2)}), flush=True)


if __name__ == "__main__":
    main()
