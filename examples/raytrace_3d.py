"""3-D Monte-Carlo raytracing walkthrough — the Python-API analog of the
reference's ``test_rte_rrtmgp_rt_gpu`` driver (src_test/test_rte_rrtmgp_rt.cu).

Builds a small cloudy 3-D domain, runs the per-g-point spectral pipeline
(gas optics -> cloud optics -> two-stream TOD boundary -> forward
null-collision tracer -> broadband accumulation) through
``RadiationSolverRT``, and cross-checks the MC surface flux against the
1-D two-stream solve on the same optics — the same physical validation
the reference performs in-driver (Radiation_solver_rt.cu:903-956).

Also demonstrates the standalone tracer on PRESCRIBED optics (the
``test_rt_lite`` analog) with the fifo photon-queue respawn.

Runs on CPU in ~two minutes:  python examples/raytrace_3d.py
(on a TPU it runs the tuned defaults from tuning/tuned_defaults.json).
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
from rte_rrtmgp_tpu.models import CloudLUT, KDist
from rte_rrtmgp_tpu.models import raytracer as rt
from rte_rrtmgp_tpu.models.radiation_rt import RadiationSolverRT
from rte_rrtmgp_tpu.cases.profiles import make_atmosphere

GASES = ("h2o", "co2", "o3", "n2o", "ch4", "o2", "n2")


def full_spectral_solve():
    """The reference rt driver's flow: 3-D cloudy domain, full spectrum."""
    ny, nx, nz, nlay = 8, 8, 12, 24
    ncol = ny * nx
    kd = KDist.from_raw(synthetic.make_kdist_raw(False, gpt_per_band=2),
                        GASES, dtype=np.float32)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "cloud.nc")
        synthetic.write_cloud_nc(p, synthetic.make_cloud_raw(False))
        clut = CloudLUT.from_netcdf(p, dtype=np.float32)
    atm = make_atmosphere(ncol, nlay, seed=7)

    out = RadiationSolverRT(kd, clut).solve(
        gas_concs=atm["gas_concs"], p_lay=atm["p_lay"], p_lev=atm["p_lev"],
        t_lay=atm["t_lay"], mu0=np.full(ncol, 0.8), azi=np.zeros(ncol),
        sfc_alb_dir=np.full((ncol, kd.nbnd), 0.06),
        sfc_alb_dif=np.full((ncol, kd.nbnd), 0.06),
        grid_cells=(nz, ny, nx), grid_d=(500.0, 1000.0, 1000.0),
        kn_grid=(4, 2, 2), photons_per_pixel=64,
        lwp=atm["lwp"], iwp=atm["iwp"], rel=atm["rel"], dei=atm["dei"],
        delta_cloud=True, twostream=True, key=jax.random.PRNGKey(0))

    mc_sfc = np.asarray(out.rt_flux_sfc_dir + out.rt_flux_sfc_dif).mean()
    ts_sfc = np.asarray(out.sw_flux_dn)[:, 0].mean()  # surface = level 0 here
    print(f"MC surface flux      {mc_sfc:8.2f} W m-2")
    print(f"two-stream surface   {ts_sfc:8.2f} W m-2  "
          f"(rel diff {abs(mc_sfc - ts_sfc) / ts_sfc:.1%})")
    assert abs(mc_sfc - ts_sfc) / ts_sfc < 0.15, "MC vs two-stream"
    print(f"TOD down             {np.asarray(out.rt_flux_tod_dn).mean():8.2f}")
    print(f"TOD up               {np.asarray(out.rt_flux_tod_up).mean():8.2f}")
    abs3d = np.asarray(out.rt_flux_abs_dir + out.rt_flux_abs_dif)
    print(f"3-D absorption field shape {abs3d.shape}, "
          f"column-integrated {abs3d.sum(axis=0).mean() * 500.0:8.2f} W m-2")


def prescribed_optics_trace():
    """test_rt_lite analog: trace prescribed optical fields directly."""
    nz, ny, nx = 16, 16, 16
    rng = np.random.default_rng(0)
    k_gas = np.full((nz, ny, nx), 2e-4, np.float32)
    cloud = np.zeros((nz, ny, nx), np.float32)
    cloud[5:8] = 8e-3 * (rng.random((3, ny, nx)) < 0.3)
    out = rt.trace_rays(
        jax.random.PRNGKey(1),
        jnp.asarray(k_gas + cloud),              # k_ext
        jnp.asarray(k_gas * 0.5),                # gas scattering
        jnp.asarray(cloud * 0.999),              # cloud scattering
        jnp.zeros((nz, ny, nx), jnp.float32),    # aerosol scattering
        jnp.full((nz, ny, nx), 0.85, jnp.float32),   # cloud asymmetry
        jnp.zeros((nz, ny, nx), jnp.float32),    # aerosol asymmetry
        None,                                    # r_eff (no Mie tables)
        jnp.full((ny, nx), 0.2, jnp.float32),    # surface albedo
        (4, 4, 4), (250.0, 500.0, 500.0),
        800.0, 50.0,                             # TOD direct/diffuse W m-2
        jnp.asarray(rt.sun_direction_from_angles(0.64, 0.3), jnp.float32),
        photons_per_pixel=64,
        respawn_mode="auto")                     # tuned winner on TPU
    tod_in = float(np.asarray(out.flux_toa_down).mean())
    sfc = float(np.asarray(out.flux_sfc_dir + out.flux_sfc_dif).mean())
    up = float(np.asarray(out.flux_tod_up).mean())
    absorbed = float(np.asarray(out.flux_abs_dir + out.flux_abs_dif)
                     .sum(axis=0).mean()) * 250.0
    sfc_up = float(np.asarray(out.flux_sfc_up).mean())
    print(f"prescribed-optics trace: in {tod_in:.1f} = up {up:.1f} "
          f"+ sfc_net {sfc - sfc_up:.1f} + absorbed {absorbed:.1f} "
          f"(closure {(up + sfc - sfc_up + absorbed) / tod_in:.1%})")
    assert abs((up + sfc - sfc_up + absorbed) / tod_in - 1.0) < 0.05


if __name__ == "__main__":
    print("=== full spectral 3-D solve (RadiationSolverRT) ===")
    full_spectral_solve()
    print("\n=== prescribed-optics trace (rt_lite analog) ===")
    prescribed_optics_trace()
    print("\nOK")
