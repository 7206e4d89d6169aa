"""Ablation timing of the full jitted pipeline: each variant is ONE jit
(same fusion context as production), so stage costs come out as deltas.

Usage: python tools/ablate.py [ncol] [nlay]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import __graft_entry__ as ge
from rte_rrtmgp_tpu.ops import gas_optics as gas_ops
from rte_rrtmgp_tpu.ops import rte_lw, rte_sw, fluxes as flux_ops

NCOL = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
NLAY = int(sys.argv[2]) if len(sys.argv) > 2 else 72
ITERS = 5


def bench(name, fn, args, probe_key=None):
    fn = jax.jit(fn)
    out = fn(*args)
    warm = float(list(out.values())[0].reshape(-1)[0])  # compile + sync
    assert np.isfinite(warm), name
    args = list(args)
    a0 = args[0]
    t0 = time.perf_counter()
    for it in range(ITERS):
        out = fn(*args)
        # value-varying data dependency: defeats dispatch dedup/caching
        args[0] = a0 + (it + 1) * 1e-6 + 0.0 * list(out.values())[0].reshape(-1)[0]
    final = float(list(out.values())[0].reshape(-1)[0])  # fetch = real sync
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    assert np.isfinite(final), name
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    kd_lw, kd_sw, _, _ = jax.device_put(ge._build(gpt_per_band=16))
    arrs = ge._atmos_arrays(ncol=NCOL, nlay=NLAY)
    put = lambda k: jax.device_put(arrs[k])
    p_lay, p_lev = put("p_lay"), put("p_lev")
    t_lay, t_lev, t_sfc = put("t_lay"), put("t_lev"), put("t_sfc")
    vmr, col_dry = put("vmr"), put("col_dry")
    mu0 = jnp.maximum(put("mu0"), 0.1)
    ncol = NCOL
    print(f"platform={jax.devices()[0].platform} ncol={NCOL} nlay={NLAY}")

    def lw_interp_only(p_lay, t_lay, vmr, col_dry):
        cg = gas_ops.build_col_gas(vmr, col_dry)
        i = gas_ops.interpolation(kd_lw, p_lay, t_lay, cg)
        return {"o": i.fmajor.sum() + i.col_mix.sum()}

    def lw_gas_tau(p_lay, t_lay, vmr, col_dry):
        cg = gas_ops.build_col_gas(vmr, col_dry)
        i = gas_ops.interpolation(kd_lw, p_lay, t_lay, cg)
        tau = gas_ops.tau_major(kd_lw, i)
        return {"o": tau.sum()}

    def lw_gas_tau_minor(p_lay, t_lay, vmr, col_dry):
        cg = gas_ops.build_col_gas(vmr, col_dry)
        i = gas_ops.interpolation(kd_lw, p_lay, t_lay, cg)
        tau = gas_ops.tau_major(kd_lw, i)
        tau = gas_ops.tau_minor(kd_lw, i, p_lay, t_lay, cg, tau)
        return {"o": tau.sum()}

    def lw_gas_full(p_lay, t_lay, t_lev, t_sfc, vmr, col_dry):
        cg = gas_ops.build_col_gas(vmr, col_dry)
        i = gas_ops.interpolation(kd_lw, p_lay, t_lay, cg)
        tau = gas_ops.tau_major(kd_lw, i)
        tau = gas_ops.tau_minor(kd_lw, i, p_lay, t_lay, cg, tau)
        src = gas_ops.planck_source(kd_lw, i, t_lay, t_lev, t_sfc, NLAY - 1)
        return {"o": tau.sum() + src.lay_src.sum() + src.lev_src.sum()}

    def lw_full(p_lay, t_lay, t_lev, t_sfc, vmr, col_dry):
        cg = gas_ops.build_col_gas(vmr, col_dry)
        i = gas_ops.interpolation(kd_lw, p_lay, t_lay, cg)
        tau = gas_ops.tau_major(kd_lw, i)
        tau = gas_ops.tau_minor(kd_lw, i, p_lay, t_lay, cg, tau)
        src = gas_ops.planck_source(kd_lw, i, t_lay, t_lev, t_sfc, NLAY - 1)
        emis = jnp.full((ncol, kd_lw.ngpt), 0.98, tau.dtype)
        inc = jnp.zeros((ncol, kd_lw.ngpt), tau.dtype)
        up, dn, _ = rte_lw.lw_solver_noscat(
            tau, src.lay_src, src.lev_src, emis, src.sfc_src, src.sfc_src_jac,
            inc, 1)
        return {"o": flux_ops.sum_broadband(up).sum()
                + flux_ops.sum_broadband(dn).sum()}

    def sw_gas_full(p_lay, t_lay, vmr, col_dry):
        cg = gas_ops.build_col_gas(vmr, col_dry)
        i = gas_ops.interpolation(kd_sw, p_lay, t_lay, cg)
        tau = gas_ops.tau_major(kd_sw, i)
        tau = gas_ops.tau_minor(kd_sw, i, p_lay, t_lay, cg, tau)
        ray = gas_ops.tau_rayleigh(kd_sw, i, cg, col_dry)
        t, s, g = gas_ops.combine_abs_and_rayleigh(tau, ray)
        return {"o": t.sum() + s.sum() + g.sum()}

    def sw_full(p_lay, t_lay, vmr, col_dry):
        cg = gas_ops.build_col_gas(vmr, col_dry)
        i = gas_ops.interpolation(kd_sw, p_lay, t_lay, cg)
        tau = gas_ops.tau_major(kd_sw, i)
        tau = gas_ops.tau_minor(kd_sw, i, p_lay, t_lay, cg, tau)
        ray = gas_ops.tau_rayleigh(kd_sw, i, cg, col_dry)
        t, s, g = gas_ops.combine_abs_and_rayleigh(tau, ray)
        alb = jnp.full((ncol, kd_sw.ngpt), 0.06, t.dtype)
        toa = jnp.ones((ncol, kd_sw.ngpt), t.dtype)
        up, dn, fdir = rte_sw.sw_solver_2stream(t, s, g, mu0, alb, alb, toa)
        return {"o": flux_ops.sum_broadband(up).sum()
                + flux_ops.sum_broadband(dn).sum()}

    bench("lw interpolation only", lw_interp_only, (p_lay, t_lay, vmr, col_dry))
    bench("lw interp+tau_major", lw_gas_tau, (p_lay, t_lay, vmr, col_dry))
    bench("lw interp+tau_major+minor", lw_gas_tau_minor, (p_lay, t_lay, vmr, col_dry))
    bench("lw gas optics full (tau+planck)", lw_gas_full,
          (p_lay, t_lay, t_lev, t_sfc, vmr, col_dry))
    bench("lw full (gas+solver+reduce)", lw_full,
          (p_lay, t_lay, t_lev, t_sfc, vmr, col_dry))
    bench("sw gas optics full (tau+ray)", sw_gas_full, (p_lay, t_lay, vmr, col_dry))
    bench("sw full (gas+solver+reduce)", sw_full, (p_lay, t_lay, vmr, col_dry))


if __name__ == "__main__":
    main()
