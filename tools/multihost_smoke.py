"""Multi-host smoke run: the flagship LW+SW step across N processes with
columns sharded over hosts.

Every process runs this same program (SPMD), e.g. a 2-process CPU run:

    for i in 0 1; do
      JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
      python tools/multihost_smoke.py --coordinator 127.0.0.1:12421 \
          --num-processes 2 --process-id $i &
    done; wait

Each process loads only ITS OWN column slab (as a real multi-host driver
would), the global mesh spans all devices, and the solve runs with zero
cross-host communication (columns are the embarrassingly parallel axis).
Prints one line: ``RESULT <process_id> <lw_flux_up mean> <sw_flux_dn mean>``
— identical across processes (each sees the full global result mean).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--ncol-per-process", type=int, default=32)
    p.add_argument("--nlay", type=int, default=24)
    args = p.parse_args()

    from rte_rrtmgp_tpu.parallel import distributed as dist

    dist.initialize(args.coordinator, args.num_processes, args.process_id)

    import jax
    import numpy as np

    import __graft_entry__ as ge
    from rte_rrtmgp_tpu.parallel import mesh as pmesh

    pid, nproc = dist.process_index(), dist.process_count()
    mesh = dist.make_global_mesh()
    verbose = os.environ.get("MH_VERBOSE")
    log = (lambda *a: print(f"[{pid}]", *a, file=sys.stderr, flush=True)) \
        if verbose else (lambda *a: None)
    log("initialized", nproc, "processes; mesh", mesh.shape)

    kd_lw, kd_sw, clut_lw, clut_sw = ge._build(gpt_per_band=2)
    # Process-local columns: deterministic per-process slice of the global
    # atmosphere (seeded identically, sliced by process id).
    ncol_global = args.ncol_per_process * nproc
    arrs = ge._atmos_arrays(ncol=ncol_global, nlay=args.nlay)
    lo, hi = pid * args.ncol_per_process, (pid + 1) * args.ncol_per_process

    names = ("p_lay", "p_lev", "t_lay", "t_lev", "t_sfc", "vmr", "col_dry",
             "emis_sfc", "sfc_alb_dir", "sfc_alb_dif", "tsi_scaling", "mu0",
             "lwp", "iwp", "rel", "dei")
    local = {k: np.asarray(arrs[k])[lo:hi] for k in names}
    with mesh:
        gargs = dist.host_shard_columns(mesh, local)
        log("sharded inputs")
        tables = pmesh.replicate(mesh, (kd_lw, kd_sw, clut_lw, clut_sw))
        log("replicated tables")
        step = ge.make_step(*tables, gpt_chunk=None)
        mean = jax.jit(lambda o: (jax.numpy.mean(o["lw_flux_up"]),
                                  jax.numpy.mean(o["sw_flux_dn"])))
        out = jax.jit(step)(*[gargs[k] for k in names])
        log("step dispatched")
        lw_a, sw_a = mean(out)
        lw, sw = float(lw_a), float(sw_a)
        log("fetched")
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("rte_rrtmgp_smoke_done")
    print(f"RESULT {pid} {lw:.6f} {sw:.6f}", flush=True)


if __name__ == "__main__":
    main()
