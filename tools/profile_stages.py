"""Per-stage device timing of the radiation pipeline at bench shapes.

Times each pipeline stage (interpolation, tau_major, tau_minor, rayleigh,
planck, LW sweep, SW 2-stream, cloud optics) in isolation on the current
default device to locate the hot spots before kernel work.

Timing methodology (required on the tunneled axon TPU, where
``block_until_ready`` resolves without a device sync and identical
dispatches get deduplicated): each iteration perturbs the first float
argument by a value that data-depends on the previous output, and the
clock stops only after fetching a scalar to the host.

Usage: python tools/profile_stages.py [ncol] [nlay]
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
from rte_rrtmgp_tpu.ops import rte_lw, rte_sw

NCOL = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
NLAY = int(sys.argv[2]) if len(sys.argv) > 2 else 72
ITERS = 10
REPS = 3


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


def timeit(name, fn, *args, vary: int = 0):
    """Fetch-synchronized best-of-REPS timing with value-varying chained
    inputs (see module docstring)."""
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
    print(f"{name:36s} {best:8.2f} ms", flush=True)
    return fn(*args)


def main():
    kd_lw, kd_sw, clut_lw, clut_sw = jax.device_put(ge._build(gpt_per_band=16))
    arrs = ge._atmos_arrays(ncol=NCOL, nlay=NLAY)
    put = lambda k: jax.device_put(arrs[k])
    p_lay, p_lev = put("p_lay"), put("p_lev")
    t_lay, t_lev, t_sfc = put("t_lay"), put("t_lev"), put("t_sfc")
    vmr, col_dry = put("vmr"), put("col_dry")
    mu0 = put("mu0")
    lwp, iwp, rel, dei = put("lwp"), put("iwp"), put("rel"), put("dei")

    print(f"platform={jax.devices()[0].platform} ncol={NCOL} nlay={NLAY} "
          f"ngpt_lw={kd_lw.ngpt} ngpt_sw={kd_sw.ngpt}")

    col_gas = jax.jit(gas_ops.build_col_gas)(vmr, col_dry)

    interp_fn = jax.jit(lambda p, t, cg: gas_ops.interpolation(kd_lw, p, t, cg))
    interp = timeit("interpolation (lw tables)", interp_fn, p_lay, t_lay, col_gas)

    tau_major_fn = jax.jit(lambda i: gas_ops.tau_major(kd_lw, i))
    tau = timeit("tau_major LW (256 gpt)", tau_major_fn, interp)

    tau_minor_fn = jax.jit(
        lambda i, p, t, cg, tu: gas_ops.tau_minor(kd_lw, i, p, t, cg, tu))
    tau = timeit("tau_minor LW", tau_minor_fn, interp, p_lay, t_lay, col_gas, tau)

    planck_fn = jax.jit(
        lambda i, tl, tv, ts: gas_ops.planck_source(kd_lw, i, tl, tv, ts,
                                                    sfc_lay=NLAY - 1))
    src = timeit("planck_source LW", planck_fn, interp, t_lay, t_lev, t_sfc)

    interp_sw = jax.jit(lambda p, t, cg: gas_ops.interpolation(kd_sw, p, t, cg))(
        p_lay, t_lay, col_gas)
    tau_sw = jax.jit(lambda i: gas_ops.tau_major(kd_sw, i))(interp_sw)
    tau_sw = jax.jit(
        lambda i, p, t, cg, tu: gas_ops.tau_minor(kd_sw, i, p, t, cg, tu))(
        interp_sw, p_lay, t_lay, col_gas, tau_sw)
    ray_fn = jax.jit(lambda i, cg, cd: gas_ops.tau_rayleigh(kd_sw, i, cg, cd))
    tau_ray = timeit("tau_rayleigh SW (224 gpt)", ray_fn, interp_sw, col_gas, col_dry)

    ncol, ngpt_lw = NCOL, kd_lw.ngpt
    emis = jnp.full((ncol, ngpt_lw), 0.98, tau.dtype)
    inc = jnp.zeros((ncol, ngpt_lw), tau.dtype)
    lw_fn = jax.jit(lambda tu, ls, lv, ss, sj: rte_lw.lw_solver_noscat(
        tu, ls, lv, emis, ss, sj, inc, n_gauss_angles=1))
    timeit("lw_solver_noscat (256 gpt)", lw_fn, tau, src.lay_src, src.lev_src,
           src.sfc_src, src.sfc_src_jac)

    tau_s, ssa_s, g_s = jax.jit(gas_ops.combine_abs_and_rayleigh)(tau_sw, tau_ray)
    alb = jnp.full((ncol, kd_sw.ngpt), 0.06, tau.dtype)
    toa = jnp.ones((ncol, kd_sw.ngpt), tau.dtype)
    sw_fn = jax.jit(lambda t, s, g: rte_sw.sw_solver_2stream(
        t, s, g, jnp.maximum(mu0, 0.1), alb, alb, toa))
    timeit("sw_solver_2stream (224 gpt)", sw_fn, tau_s, ssa_s, g_s)

    cld_fn = jax.jit(lambda a, b, c, d: cloud_ops.cloud_optics_2str(
        clut_sw, a, b, c, d))
    timeit("cloud_optics_2str", cld_fn, lwp, iwp, rel, dei)


if __name__ == "__main__":
    main()
