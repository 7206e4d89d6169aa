"""Sharding layer: mesh construction, column/g-point sharding, and result
parity between device counts (8 virtual CPU devices from conftest.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rte_rrtmgp_tpu.parallel import (make_mesh, shard_atmosphere, shard_kdist,
                                     replicate)
from helpers import GASES

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def setup():
    import __graft_entry__ as ge

    kd_lw, kd_sw, clut_lw, clut_sw = ge._build(gpt_per_band=4,
                                               dtype=np.float64)
    arrs = ge._atmos_arrays(ncol=16, nlay=8, dtype=np.float64)
    return ge, kd_lw, kd_sw, clut_lw, clut_sw, arrs


NAMES = ("p_lay", "p_lev", "t_lay", "t_lev", "t_sfc", "vmr", "col_dry",
         "emis_sfc", "sfc_alb_dir", "sfc_alb_dif", "tsi_scaling", "mu0",
         "lwp", "iwp", "rel", "dei")


def _run(ge, mesh, kd_lw, kd_sw, clut_lw, clut_sw, arrs):
    sharded = shard_atmosphere(mesh, {k: jnp.asarray(arrs[k]) for k in NAMES})
    kdl = shard_kdist(kd_lw, mesh)
    kds = shard_kdist(kd_sw, mesh)
    cl, cs = replicate(mesh, (clut_lw, clut_sw))
    step = jax.jit(ge.make_step(kdl, kds, cl, cs))
    out = step(*[sharded[k] for k in NAMES])
    return {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.slow
def test_column_sharding_matches_single_device(setup):
    ge, kd_lw, kd_sw, clut_lw, clut_sw, arrs = setup
    mesh1 = make_mesh((1,), ("cols",), devices=jax.devices()[:1])
    mesh8 = make_mesh((8,), ("cols",), devices=jax.devices()[:8])
    out1 = _run(ge, mesh1, kd_lw, kd_sw, clut_lw, clut_sw, arrs)
    out8 = _run(ge, mesh8, kd_lw, kd_sw, clut_lw, clut_sw, arrs)
    for k in out1:
        np.testing.assert_allclose(out8[k], out1[k], rtol=1e-12, err_msg=k)


@pytest.mark.slow
def test_spectral_sharding_allreduce(setup):
    """cols x gpt mesh: spectral tables sharded, broadband reduction crosses
    devices; results must match the columns-only layout."""
    ge, kd_lw, kd_sw, clut_lw, clut_sw, arrs = setup
    mesh1 = make_mesh((8,), ("cols",), devices=jax.devices()[:8])
    mesh2 = make_mesh((4, 2), ("cols", "gpt"), devices=jax.devices()[:8])
    out1 = _run(ge, mesh1, kd_lw, kd_sw, clut_lw, clut_sw, arrs)
    out2 = _run(ge, mesh2, kd_lw, kd_sw, clut_lw, clut_sw, arrs)
    for k in out1:
        np.testing.assert_allclose(out2[k], out1[k], rtol=1e-10, err_msg=k)


def test_sharding_is_actually_distributed(setup):
    ge, kd_lw, kd_sw, clut_lw, clut_sw, arrs = setup
    mesh8 = make_mesh((8,), ("cols",), devices=jax.devices()[:8])
    sharded = shard_atmosphere(mesh8, {"p_lay": jnp.asarray(arrs["p_lay"])})
    shards = sharded["p_lay"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape[0] == arrs["p_lay"].shape[0] // 8


def test_shard_map_solver_matches_single_device(setup):
    """RadiationSolver*.solve(mesh=...) runs the full single-chip pipeline
    per column shard via shard_map (parallel/sharded.py) — the execution
    path that keeps the fused Pallas kernels alive on multi-chip meshes.
    Fluxes must match the unsharded solve exactly (no communication in
    the solve)."""
    from rte_rrtmgp_tpu.models import (GasConcs, RadiationSolverLW,
                                       RadiationSolverSW)
    from rte_rrtmgp_tpu.cases.profiles import make_atmosphere

    ge, kd_lw, kd_sw, clut_lw, clut_sw, arrs = setup
    atm = make_atmosphere(16, 8, seed=2)
    emis = np.full((16, kd_lw.nbnd), 0.98)
    alb = np.full((16, kd_sw.nbnd), 0.06)
    mesh8 = make_mesh((8,), ("cols",), devices=jax.devices()[:8])

    lw = RadiationSolverLW(kd_lw, clut_lw)
    common = dict(gas_concs=atm["gas_concs"], p_lay=atm["p_lay"],
                  p_lev=atm["p_lev"], t_lay=atm["t_lay"])
    one = lw.solve(t_lev=atm["t_lev"], t_sfc=atm["t_sfc"], emis_sfc=emis,
                   lwp=atm["lwp"], iwp=atm["iwp"], rel=atm["rel"],
                   dei=atm["dei"], **common)
    sh = lw.solve(t_lev=atm["t_lev"], t_sfc=atm["t_sfc"], emis_sfc=emis,
                  lwp=atm["lwp"], iwp=atm["iwp"], rel=atm["rel"],
                  dei=atm["dei"], mesh=mesh8, **common)
    for k in ("lw_flux_up", "lw_flux_dn"):
        np.testing.assert_allclose(np.asarray(sh[k]), np.asarray(one[k]),
                                   rtol=1e-12, err_msg=k)

    sw = RadiationSolverSW(kd_sw, clut_sw)
    one = sw.solve(mu0=atm["mu0"], sfc_alb_dir=alb, sfc_alb_dif=alb,
                   lwp=atm["lwp"], iwp=atm["iwp"], rel=atm["rel"],
                   dei=atm["dei"], delta_cloud=True, **common)
    sh = sw.solve(mu0=atm["mu0"], sfc_alb_dir=alb, sfc_alb_dif=alb,
                  lwp=atm["lwp"], iwp=atm["iwp"], rel=atm["rel"],
                  dei=atm["dei"], delta_cloud=True, mesh=mesh8, **common)
    for k in ("sw_flux_up", "sw_flux_dn", "sw_flux_dn_dir"):
        np.testing.assert_allclose(np.asarray(sh[k]), np.asarray(one[k]),
                                   rtol=1e-12, err_msg=k)

    # Sharded outputs actually live across the mesh.
    assert len(sh["sw_flux_dn"].addressable_shards) == 8


def test_shard_map_rejects_indivisible_columns(setup):
    from rte_rrtmgp_tpu.models import RadiationSolverLW
    from rte_rrtmgp_tpu.cases.profiles import make_atmosphere

    ge, kd_lw, _, clut_lw, _, _ = setup
    atm = make_atmosphere(10, 8, seed=3)   # 10 cols over 8 shards
    emis = np.full((10, kd_lw.nbnd), 0.98)
    mesh8 = make_mesh((8,), ("cols",), devices=jax.devices()[:8])
    lw = RadiationSolverLW(kd_lw, clut_lw)
    with pytest.raises(ValueError, match="divide"):
        lw.solve(gas_concs=atm["gas_concs"], p_lay=atm["p_lay"],
                 p_lev=atm["p_lev"], t_lay=atm["t_lay"],
                 t_lev=atm["t_lev"], t_sfc=atm["t_sfc"], emis_sfc=emis,
                 mesh=mesh8)
