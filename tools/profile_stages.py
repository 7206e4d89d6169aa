"""Per-stage device timing of the PRODUCTION radiation pipeline at bench
shapes.

Times each stage exactly as the jitted drivers compose them
(``models/radiation.py::_solve_lw_impl/_solve_sw_impl``): the fused
multi-table Pallas interpolation entries (tau_major+pfrac,
tau_major+rayleigh), minor gases, the fused broadband Pallas sweeps, cloud
optics and the band->gpt expansions — per (ncol, nlay, gpt_chunk) spectral
chunk, which is the unit the chunked drivers execute.  The LW and SW bench
spectra are 256/224 g-points = 2 chunks each at the default chunk of 128.

Timing methodology (required on the tunneled axon TPU, where
``block_until_ready`` resolves without a device sync and identical
dispatches get deduplicated): each iteration perturbs the first float
argument by a value that data-depends on the previous output, and the
clock stops only after fetching a scalar to the host.

Usage: python tools/profile_stages.py [ncol] [nlay] [gpt_chunk]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import __graft_entry__ as ge
from rte_rrtmgp_tpu.ops import gas_optics as gas_ops
from rte_rrtmgp_tpu.ops import cloud_optics as cloud_ops
from rte_rrtmgp_tpu.ops import fluxes as flux_ops
from rte_rrtmgp_tpu.ops import optics_ops
from rte_rrtmgp_tpu.ops import rte_lw, rte_sw

NCOL = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
NLAY = int(sys.argv[2]) if len(sys.argv) > 2 else 72
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 128
ITERS = 10
REPS = 3

_total = 0.0


def _first_leaf(tree):
    return next(l for l in jax.tree_util.tree_leaves(tree)
                if hasattr(l, "ravel"))


def _fetch(tree):
    return float(jnp.asarray(_first_leaf(tree)).ravel()[0])


def _perturb(tree, delta, link):
    """Perturb the first floating leaf of ``tree`` by delta + 0*link (the
    link forces a data dependence on the previous output)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for i, l in enumerate(leaves):
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating):
            leaves[i] = l + l.dtype.type(delta) + link.astype(l.dtype)
            break
    return jax.tree_util.tree_unflatten(treedef, leaves)


def timeit(name, fn, *args, vary: int = 0, chunks: int = 1):
    """Fetch-synchronized best-of-REPS timing with value-varying chained
    inputs (see module docstring)."""
    global _total
    args = list(args)
    base = args[vary]
    out = fn(*args)
    assert np.isfinite(_fetch(out))
    best = float("inf")
    for rep in range(REPS):
        t0 = time.perf_counter()
        for it in range(ITERS):
            out = fn(*args)
            link = _first_leaf(out).ravel()[0] * 0.0
            args[vary] = _perturb(base, (rep * ITERS + it + 1) * 1e-7, link)
        _fetch(out)
        best = min(best, (time.perf_counter() - t0) / ITERS * 1e3)
    step = best * chunks
    _total += step
    tag = f"  (x{chunks} chunks = {step:6.2f} ms/step)" if chunks > 1 else ""
    print(f"{name:40s} {best:8.2f} ms{tag}", flush=True)
    return fn(*args)


def main():
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    kd_lw, kd_sw, clut_lw, clut_sw = jax.device_put(ge._build(gpt_per_band=16))
    arrs = ge._atmos_arrays(ncol=NCOL, nlay=NLAY)
    put = lambda k: jax.device_put(arrs[k])
    p_lay, p_lev = put("p_lay"), put("p_lev")
    t_lay, t_lev, t_sfc = put("t_lay"), put("t_lev"), put("t_sfc")
    vmr, col_dry = put("vmr"), put("col_dry")
    mu0 = put("mu0")
    lwp, iwp, rel, dei = put("lwp"), put("iwp"), put("rel"), put("dei")

    nch_lw = -(-kd_lw.ngpt // CHUNK)
    nch_sw = -(-kd_sw.ngpt // CHUNK)
    print(f"platform={jax.devices()[0].platform} ncol={NCOL} nlay={NLAY} "
          f"chunk={CHUNK} ngpt_lw={kd_lw.ngpt} (x{nch_lw}) "
          f"ngpt_sw={kd_sw.ngpt} (x{nch_sw})")

    col_gas = jax.jit(gas_ops.build_col_gas)(vmr, col_dry)
    kdc_lw = kd_lw.slice_gpt(0, CHUNK)
    kdc_sw = kd_sw.slice_gpt(0, CHUNK)
    ncol = NCOL

    # ---- shared ----
    interp_fn = jax.jit(lambda p, t, cg: gas_ops.interpolation(kd_lw, p, t, cg))
    interp = timeit("interpolation (once per spectrum)", interp_fn,
                    p_lay, t_lay, col_gas, chunks=2)

    # ---- LW chunk pipeline ----
    mp_fn = jax.jit(lambda i: gas_ops.tau_major_and_pfrac(kdc_lw, i))
    tau, pfrac = timeit("LW tau_major+pfrac (fused pallas)", mp_fn, interp,
                        chunks=nch_lw)

    tau_minor_fn = jax.jit(
        lambda i, p, t, cg, tu: gas_ops.tau_minor(kdc_lw, i, p, t, cg, tu))
    tau = timeit("LW tau_minor", tau_minor_fn, interp, p_lay, t_lay,
                 col_gas, tau, chunks=nch_lw)

    planck_fn = jax.jit(
        lambda i, pf, tl, tv, ts: gas_ops.planck_source(
            kdc_lw, i, tl, tv, ts, sfc_lay=NLAY - 1, pfrac=pf))
    src = timeit("LW planck_source (from pfrac)", planck_fn, interp, pfrac,
                 t_lay, t_lev, t_sfc, vary=1, chunks=nch_lw)

    cld1_fn = jax.jit(lambda a, b, c, d: cloud_ops.cloud_optics_1scl(
        clut_lw, a, b, c, d))
    cld1 = timeit("LW cloud_optics_1scl (once)", cld1_fn, lwp, iwp, rel, dei)
    add_fn = jax.jit(lambda t, c: t + flux_ops.expand_bands_to_gpt(
        c, kdc_lw.gpt2band))
    tau = timeit("LW cloud tau add (band->gpt)", add_fn, tau, cld1.tau,
                 chunks=nch_lw)

    emis = jnp.full((ncol, CHUNK), 0.98, tau.dtype)
    inc = jnp.zeros((ncol, CHUNK), tau.dtype)
    lw_fn = jax.jit(lambda tu, ls, lv, ss, sj: rte_lw.lw_solver_noscat_broadband(
        tu, ls, lv, emis, ss, sj, inc, n_gauss_angles=1))
    timeit("LW broadband sweep (fused pallas)", lw_fn, tau, src.lay_src,
           src.lev_src, src.sfc_src, src.sfc_src_jac, chunks=nch_lw)

    # ---- SW chunk pipeline ----
    interp_sw = jax.jit(lambda p, t, cg: gas_ops.interpolation(
        kd_sw, p, t, cg))(p_lay, t_lay, col_gas)
    mr_fn = jax.jit(lambda i, cg, cd: gas_ops.tau_major_and_rayleigh(
        kdc_sw, i, cg, cd))
    tau_abs, tau_ray = timeit("SW tau_major+rayleigh (fused pallas)", mr_fn,
                              interp_sw, col_gas, col_dry, chunks=nch_sw)
    tau_minor_sw = jax.jit(
        lambda i, p, t, cg, tu: gas_ops.tau_minor(kdc_sw, i, p, t, cg, tu))
    tau_abs = timeit("SW tau_minor", tau_minor_sw, interp_sw, p_lay, t_lay,
                     col_gas, tau_abs, chunks=nch_sw)
    comb_fn = jax.jit(gas_ops.combine_abs_and_rayleigh)
    tau_s, ssa_s, g_s = timeit("SW combine_abs_and_rayleigh", comb_fn,
                               tau_abs, tau_ray, chunks=nch_sw)

    cld2_fn = jax.jit(lambda a, b, c, d: cloud_ops.cloud_optics_2str(
        clut_sw, a, b, c, d))
    cld2 = timeit("SW cloud_optics_2str (once)", cld2_fn, lwp, iwp, rel, dei)
    inc2_fn = jax.jit(lambda t, s, g, ct, cs, cg: optics_ops.increment_2str_by_2str_bybnd(
        optics_ops.OpticalProps2str(tau=t, ssa=s, g=g),
        optics_ops.OpticalProps2str(tau=ct, ssa=cs, g=cg),
        kdc_sw.gpt2band))
    op = timeit("SW cloud increment (bybnd)", inc2_fn, tau_s, ssa_s, g_s,
                cld2.tau, cld2.ssa, cld2.g, chunks=nch_sw)

    alb = jnp.full((ncol, CHUNK), 0.06, tau.dtype)
    toa = jnp.ones((ncol, CHUNK), tau.dtype)
    mu0_safe = jnp.maximum(mu0, 0.1)
    sw_fn = jax.jit(lambda t, s, g: rte_sw.sw_solver_2stream_broadband(
        t, s, g, mu0_safe, alb, alb, toa))
    timeit("SW broadband 2stream (fused pallas)", sw_fn, op.tau, op.ssa, op.g,
           chunks=nch_sw)

    print(f"{'SUM (ms/step equivalents)':40s} {_total:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
