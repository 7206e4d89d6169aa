"""Microbenchmark the MC tracer's per-step memory ops in isolation.

The round-4 device trace (tools/profile_rt.py) attributes 83% of the
tracer's while-loop iteration to ONE op: the packed scatter-add of
(N, 4) rows into the (ncell*nz + ncell, 4) accumulator (~2.37 ms at
N=32768 -> ~68 cycles per index).  This tool times scatter/gather
variants in a fori_loop (so per-dispatch overhead amortizes like the real
while loop) to choose the replacement:

  scatter_rows   — current: (N,4) rows into (T,4)
  scatter_flat   — (N,) singles into (4*T,) at idx*4+ch, two scatters
  scatter_sorted — rows, indices pre-sorted (indices_are_sorted hint)
  scatter_pallas — serial RMW loop in a Pallas kernel, acc VMEM-resident
  gather_rows    — (N,8) row gather from (T8,8) [for reference]

Usage: python tools/microbench_scatter.py [N] [T] [steps]
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
T = int(sys.argv[2]) if len(sys.argv) > 2 else 266240
STEPS = int(sys.argv[3]) if len(sys.argv) > 3 else 50


def main():
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    _cfg.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    key = jax.random.key(0)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, T)
    vals = jax.random.uniform(jax.random.fold_in(key, 2), (N, 4))
    acc0 = jnp.zeros((T, 4), jnp.float32)

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(*args)
            s = float(jnp.asarray(out).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        per_step_us = best / STEPS * 1e6
        print(json.dumps({"op": name, "us_per_step": round(per_step_us, 1),
                          "cyc_per_idx": round(per_step_us * 940 / N, 1),
                          "check": round(s, 3)}), flush=True)

    def loop(step_fn, acc):
        def body(i, acc):
            v = vals + 1e-9 * i          # defeat loop-invariant hoisting
            return step_fn(acc, v)
        return jax.lax.fori_loop(0, STEPS, body, acc)

    timed("scatter_rows",
          lambda acc: loop(lambda a, v: a.at[idx].add(v), acc), acc0)

    idx_flat = idx * 4
    acc_flat = jnp.zeros((T * 4,), jnp.float32)
    timed("scatter_flat_1ch",
          lambda acc: loop(lambda a, v: a.at[idx_flat].add(v[:, 0]), acc),
          acc_flat)

    idx_s = jnp.sort(idx)
    timed("scatter_rows_sorted_hint",
          lambda acc: loop(
              lambda a, v: jax.lax.scatter_add(
                  a, idx_s[:, None], v,
                  jax.lax.ScatterDimensionNumbers(
                      update_window_dims=(1,), inserted_window_dims=(0,),
                      scatter_dims_to_operand_dims=(0,)),
                  indices_are_sorted=True, unique_indices=False), acc), acc0)

    # Two flat scatters: per event at most 2 channels are nonzero (the
    # tracer's abs_dir/abs_dif and sfc_dir/sfc_dif splits are selects);
    # scatter (N,) singles at idx*4+channel twice instead of (N,4) rows.
    ch1 = (idx % 2).astype(jnp.int32)           # stand-in channel select
    ch2 = 2 + (idx % 2).astype(jnp.int32)
    timed("scatter_two_flat",
          lambda acc: loop(
              lambda a, v: a.at[idx_flat + ch1].add(v[:, 0])
                            .at[idx_flat + ch2].add(v[:, 1]), acc),
          acc_flat)

    # A Pallas serial-RMW scatter (VMEM-resident accumulator, SMEM index
    # stream) was prototyped and measured-out: Mosaic's compile of the
    # serial per-index loop exceeded 15 minutes (round 4) — rejected in
    # favor of the flat XLA scatters above.

    idx8 = idx * 8
    tbl8 = jax.random.uniform(jax.random.fold_in(key, 4), (T * 8,))

    def gather_flat_loop(t):
        def body(i, a):
            ix = (idx8 + i) % (T * 8)
            return a + jnp.take(t, ix)
        return jax.lax.fori_loop(0, STEPS, body, jnp.zeros((N,)))

    timed("gather_flat_1ch", gather_flat_loop, tbl8)

    tbl = jax.random.uniform(jax.random.fold_in(key, 3), (T, 8))

    def gather_loop(t):
        def body(i, a):
            ix = (idx + i) % T            # defeat hoisting
            return a + jnp.take(t, ix, axis=0)[:, :4]
        return jax.lax.fori_loop(0, STEPS, body, jnp.zeros((N, 4)))

    timed("gather_rows", gather_loop, tbl)


if __name__ == "__main__":
    main()
