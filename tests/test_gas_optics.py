"""Gas optics: JAX implementation vs the NumPy oracle (float64)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rte_rrtmgp_tpu.ops import gas_optics as go
from rte_rrtmgp_tpu.ops import reference as ref

from helpers import small_kdist, small_atmos, atmos_inputs, interp_oracle

NCOL, NLAY = 5, 14


def _setup(longwave):
    kd = small_kdist(longwave)
    atm = small_atmos(NCOL, NLAY)
    vmr, col_dry = atmos_inputs(kd, atm)
    col_gas = np.concatenate([col_dry[:, :, None], vmr * col_dry[:, :, None]], axis=2)
    return kd, atm, vmr, col_dry, col_gas


@pytest.mark.parametrize("longwave", [True, False])
def test_interpolation_matches_oracle(longwave):
    kd, atm, vmr, col_dry, col_gas = _setup(longwave)
    oi = interp_oracle(kd, atm["p_lay"], atm["t_lay"], col_gas)
    ji = go.interpolation(kd, jnp.asarray(atm["p_lay"]), jnp.asarray(atm["t_lay"]),
                          jnp.asarray(col_gas))

    np.testing.assert_array_equal(np.asarray(ji.jtemp0), oi.jtemp - 1)
    np.testing.assert_array_equal(np.asarray(ji.jpress0), oi.jpress - 1)
    np.testing.assert_array_equal(np.asarray(ji.tropo), oi.tropo)
    np.testing.assert_array_equal(np.asarray(ji.jeta0_r), oi.jeta - 1)
    np.testing.assert_allclose(np.asarray(ji.col_mix_r), oi.col_mix, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ji.fminor_r), oi.fminor, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(np.asarray(ji.fmajor_r), oi.fmajor, rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize("longwave", [True, False])
def test_tau_major_matches_oracle(longwave):
    kd, atm, vmr, col_dry, col_gas = _setup(longwave)
    oi = interp_oracle(kd, atm["p_lay"], atm["t_lay"], col_gas)
    tau_o = ref.tau_major(oi, np.asarray(kd.kmajor), kd.gpoint_flavor, kd.gpt2band)

    ji = go.interpolation(kd, jnp.asarray(atm["p_lay"]), jnp.asarray(atm["t_lay"]),
                          jnp.asarray(col_gas))
    tau_j = go.tau_major(kd, ji)
    np.testing.assert_allclose(np.asarray(tau_j), tau_o, rtol=1e-12, atol=1e-30)
    assert np.all(np.asarray(tau_j) >= 0)


@pytest.mark.parametrize("longwave", [True, False])
def test_tau_minor_matches_oracle(longwave):
    kd, atm, vmr, col_dry, col_gas = _setup(longwave)
    oi = interp_oracle(kd, atm["p_lay"], atm["t_lay"], col_gas)
    t_lower = ref.tau_minor(oi, atm["p_lay"], atm["t_lay"], col_gas,
                            np.asarray(kd.kminor_lower), kd.minor_lower,
                            kd.idx_h2o, lower=True, ngpt=kd.ngpt)
    t_upper = ref.tau_minor(oi, atm["p_lay"], atm["t_lay"], col_gas,
                            np.asarray(kd.kminor_upper), kd.minor_upper,
                            kd.idx_h2o, lower=False, ngpt=kd.ngpt)
    tau_o = t_lower + t_upper
    assert tau_o.max() > 0  # the synthetic minor gases actually contribute

    ji = go.interpolation(kd, jnp.asarray(atm["p_lay"]), jnp.asarray(atm["t_lay"]),
                          jnp.asarray(col_gas))
    tau_j = go.tau_minor(kd, ji, jnp.asarray(atm["p_lay"]),
                         jnp.asarray(atm["t_lay"]), jnp.asarray(col_gas),
                         jnp.zeros((NCOL, NLAY, kd.ngpt)))
    np.testing.assert_allclose(np.asarray(tau_j), tau_o, rtol=1e-12, atol=1e-30)


def test_tau_rayleigh_matches_oracle():
    kd, atm, vmr, col_dry, col_gas = _setup(False)
    oi = interp_oracle(kd, atm["p_lay"], atm["t_lay"], col_gas)
    tau_o = ref.tau_rayleigh(oi, col_gas, col_dry, np.asarray(kd.krayl),
                             kd.gpoint_flavor, kd.idx_h2o)

    ji = go.interpolation(kd, jnp.asarray(atm["p_lay"]), jnp.asarray(atm["t_lay"]),
                          jnp.asarray(col_gas))
    tau_j = go.tau_rayleigh(kd, ji, jnp.asarray(col_gas), jnp.asarray(col_dry))
    np.testing.assert_allclose(np.asarray(tau_j), tau_o, rtol=1e-12)


def test_planck_source_matches_oracle():
    kd, atm, vmr, col_dry, col_gas = _setup(True)
    oi = interp_oracle(kd, atm["p_lay"], atm["t_lay"], col_gas)
    # RCE profile: surface at layer 0.
    sfc_lay = 0
    s_o = ref.planck_source(oi, atm["t_lay"], atm["t_lev"], atm["t_sfc"], sfc_lay,
                            np.asarray(kd.planck_frac), kd.temp_ref_min,
                            kd.totplnk_delta, np.asarray(kd.totplnk),
                            kd.gpoint_flavor, kd.gpt2band)

    ji = go.interpolation(kd, jnp.asarray(atm["p_lay"]), jnp.asarray(atm["t_lay"]),
                          jnp.asarray(col_gas))
    s_j = go.planck_source(kd, ji, jnp.asarray(atm["t_lay"]),
                           jnp.asarray(atm["t_lev"]), jnp.asarray(atm["t_sfc"]),
                           sfc_lay)
    np.testing.assert_allclose(np.asarray(s_j.sfc_src), s_o[0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s_j.sfc_src_jac), s_o[1], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(s_j.lay_src), s_o[2], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s_j.lev_src), s_o[3], rtol=1e-12)


def test_col_dry_matches_oracle():
    kd, atm, vmr, col_dry, col_gas = _setup(True)
    h2o = atm["gas_concs"].expand("h2o", NCOL, NLAY)
    j = go.get_col_dry(jnp.asarray(h2o), jnp.asarray(atm["p_lev"]))
    np.testing.assert_allclose(np.asarray(j), col_dry, rtol=1e-14)


def test_combine_abs_rayleigh_small_tau_guard():
    tau_abs = jnp.array([[[0.0, 1e-30, 0.5]]])
    tau_ray = jnp.array([[[0.0, 1e-30, 0.5]]])
    tau, ssa, g = go.combine_abs_and_rayleigh(tau_abs, tau_ray)
    out = np.asarray(ssa)
    assert out[0, 0, 0] == 0.0 and out[0, 0, 1] == 0.0
    assert abs(out[0, 0, 2] - 0.5) < 1e-12
    assert np.all(np.asarray(g) == 0.0)


@pytest.mark.parametrize("longwave", [True, False])
def test_gas_optics_jit_end_to_end(longwave):
    """Full gas_optics under jit; same result jitted and eager."""
    import jax

    kd, atm, vmr, col_dry, col_gas = _setup(longwave)
    args = tuple(map(jnp.asarray, (atm["p_lay"], atm["p_lev"], atm["t_lay"])))
    if longwave:
        f = lambda kd_, p, pl, t: go.gas_optics_lw(
            kd_, p, pl, t, jnp.asarray(atm["t_lev"]), jnp.asarray(atm["t_sfc"]),
            jnp.asarray(vmr), jnp.asarray(col_dry), sfc_lay=0)
        eager = f(kd, *args)
        jitted = jax.jit(f, static_argnames=())(kd, *args)
        np.testing.assert_allclose(np.asarray(jitted[0].tau),
                                   np.asarray(eager[0].tau), rtol=1e-14)
        np.testing.assert_allclose(np.asarray(jitted[1].lay_src),
                                   np.asarray(eager[1].lay_src), rtol=1e-14)
    else:
        f = lambda kd_, p, pl, t: go.gas_optics_sw(
            kd_, p, pl, t, jnp.asarray(vmr), jnp.asarray(col_dry))
        eager = f(kd, *args)
        jitted = jax.jit(f)(kd, *args)
        np.testing.assert_allclose(np.asarray(jitted[0].tau),
                                   np.asarray(eager[0].tau), rtol=1e-14)
        np.testing.assert_allclose(np.asarray(jitted[0].ssa),
                                   np.asarray(eager[0].ssa), rtol=1e-14)
