"""Scaling harness: columns x g-points / s versus device count.

The reference has no multi-device execution at all (SURVEY.md par.2.9); this
measures the TPU-native column-sharded scaling path on whatever devices are
available — real TPU chips, or virtual CPU devices for plumbing validation:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/scaling_bench.py --platform cpu --devices 1 2 4 8

Columns shard with zero collectives in the solve, so scaling should be near
linear until the per-device column count is too small to fill the VPU.
Prints one JSON line per device count.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1])
    ap.add_argument("--ncol-per-device", type=int, default=1024)
    ap.add_argument("--nlay", type=int, default=72)
    ap.add_argument("--gpt-per-band", type=int, default=16)
    ap.add_argument("--gpt-chunk", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu for virtual devices)")
    ap.add_argument("--mode", choices=("annotate", "shardmap"),
                    default="annotate",
                    help="annotate: sharding annotations + SPMD partitioner "
                         "(pure-XLA kernels); shardmap: per-shard full "
                         "pipeline incl. the fused Pallas kernels "
                         "(parallel/sharded.py)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from rte_rrtmgp_tpu.parallel import make_mesh, shard_atmosphere, replicate

    kd_lw, kd_sw, clut_lw, clut_sw = ge._build(gpt_per_band=args.gpt_per_band)
    names = ("p_lay", "p_lev", "t_lay", "t_lev", "t_sfc", "vmr", "col_dry",
             "emis_sfc", "sfc_alb_dir", "sfc_alb_dif", "tsi_scaling", "mu0",
             "lwp", "iwp", "rel", "dei")

    for n in args.devices:
        devices = jax.devices()[:n]
        if len(devices) < n:
            print(json.dumps({"devices": n, "error": "not enough devices"}))
            continue
        ncol = args.ncol_per_device * n
        arrs = ge._atmos_arrays(ncol=ncol, nlay=args.nlay)
        mesh = make_mesh((n,), ("cols",), devices=devices)
        sharded = shard_atmosphere(
            mesh, {k: jnp.asarray(arrs[k]) for k in names})
        cl_lw, cl_sw = replicate(mesh, (clut_lw, clut_sw))
        kdl, kds = replicate(mesh, (kd_lw, kd_sw))
        a = [sharded[k] for k in names]
        if args.mode == "shardmap":
            from rte_rrtmgp_tpu.parallel.sharded import sharded_columns_call

            body = ge.make_step(None, None, None, None,
                                gpt_chunk=args.gpt_chunk,
                                tables_as_args=True)
            tables = (kdl, kds, cl_lw, cl_sw)

            def step(*atm):
                return sharded_columns_call(mesh, body, 4,
                                            tables + tuple(atm), {})
        else:
            step = jax.jit(ge.make_step(kdl, kds, cl_lw, cl_sw,
                                        gpt_chunk=args.gpt_chunk))

        out = step(*a)
        warm = float(np.asarray(out["lw_flux_up"]).ravel()[0])
        assert np.isfinite(warm)
        t0 = time.perf_counter()
        for it in range(args.iters):
            out = step(*a)
            a[2] = sharded["t_lay"] + (it + 1) * 1e-5 \
                + 0.0 * out["lw_flux_up"][:, :args.nlay]
        float(out["lw_flux_up"].sum())
        dt = (time.perf_counter() - t0) / args.iters

        ngpt = kd_lw.ngpt + kd_sw.ngpt
        print(json.dumps({
            "devices": n,
            "ncol": ncol,
            "colgpt_per_s": round(ncol * ngpt / dt, 1),
            "ms_per_step": round(dt * 1e3, 2),
            "platform": devices[0].platform,
            "mode": args.mode,
        }), flush=True)


if __name__ == "__main__":
    main()
