"""Multi-chip scaling walkthrough — the TPU-native replacement for the
reference's MPI/NCCL column blocking (``src_test/Radiation_solver.cu``
block loop, lifted to a `jax.sharding.Mesh` of chips).

Two execution paths, matching ``PARITY.md`` §2.9:

* **cols mesh (shard_map path)** — columns are embarrassingly parallel,
  so each device runs the FULL single-chip pipeline (including the fused
  Pallas kernels) on its column shard: ``RadiationSolver*.solve(mesh=...)``.
* **cols x gpt mesh (annotation path)** — the spectral axis shards too;
  broadband reductions become XLA all-reduces over the ``gpt`` axis.

Run on CPU with 8 virtual devices (no TPU pod needed):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_sharding.py

On a real TPU slice the SAME code scales over the physical chips — only
``make_mesh``'s device list changes (it defaults to ``jax.devices()``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

from rte_rrtmgp_tpu import config

config.respect_platform_env()

import jax
import numpy as np

from rte_rrtmgp_tpu.data import synthetic
from rte_rrtmgp_tpu.models import KDist, RadiationSolverLW
from rte_rrtmgp_tpu.parallel import make_mesh
from rte_rrtmgp_tpu.cases.profiles import make_atmosphere

GASES = ["h2o", "co2", "o3", "n2o", "co", "ch4", "o2", "n2"]
NCOL, NLAY = 64, 40


def main():
    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}")

    kd_lw = KDist.from_raw(synthetic.make_kdist_raw(True, gpt_per_band=4),
                           GASES, dtype=np.float32)
    atm = make_atmosphere(NCOL, NLAY, seed=3)
    emis = np.full((NCOL, kd_lw.nbnd), 0.98)
    solver = RadiationSolverLW(kd_lw)
    kw = dict(gas_concs=atm["gas_concs"], p_lay=atm["p_lay"],
              p_lev=atm["p_lev"], t_lay=atm["t_lay"], t_lev=atm["t_lev"],
              t_sfc=atm["t_sfc"], emis_sfc=emis)

    # Single-device reference.
    one = solver.solve(**kw)

    # cols mesh: shard_map execution — zero collectives in the solve.
    mesh = make_mesh((n_dev,), ("cols",))
    sharded = solver.solve(mesh=mesh, **kw)

    a = np.asarray(one["lw_flux_up"])
    b = np.asarray(sharded["lw_flux_up"])
    print(f"cols mesh ({n_dev} shards): TOA up {b[:, -1].mean():8.2f} W/m2, "
          f"max |delta| vs single device {np.abs(a - b).max():.2e}")
    np.testing.assert_allclose(a, b, rtol=5e-6, atol=1e-4)
    print("cols-mesh fluxes match the single-device solve")


if __name__ == "__main__":
    main()
