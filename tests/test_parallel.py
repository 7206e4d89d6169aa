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
