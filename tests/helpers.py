"""Shared fixtures: small synthetic k-distributions and atmospheres."""

from __future__ import annotations

import functools

import numpy as np

from rte_rrtmgp_tpu.data import synthetic
from rte_rrtmgp_tpu.models.kdist import KDist
from rte_rrtmgp_tpu.cases.profiles import make_atmosphere
from rte_rrtmgp_tpu.ops import reference as ref

GASES = ["h2o", "co2", "o3", "n2o", "co", "ch4", "o2", "n2"]


@functools.lru_cache(maxsize=None)
def small_kdist(longwave: bool, gpt_per_band: int = 4):
    raw = synthetic.make_kdist_raw(longwave, seed=0, gpt_per_band=gpt_per_band)
    return KDist.from_raw(raw, GASES, dtype=np.float64)


@functools.lru_cache(maxsize=None)
def small_atmos(ncol: int = 5, nlay: int = 14, seed: int = 0):
    atm = make_atmosphere(ncol, nlay, seed=seed)
    return atm


def atmos_inputs(kd: KDist, atm: dict):
    """Extract solver inputs in float64, top still at the high-pressure end
    (i.e. surface at layer 0 for the RCE profile)."""
    ncol, nlay = atm["p_lay"].shape
    vmr = atm["gas_concs"].materialize(kd.gas_names, ncol, nlay)
    col_dry = ref.get_col_dry(atm["gas_concs"].expand("h2o", ncol, nlay),
                              atm["p_lev"])
    return vmr, col_dry


def interp_oracle(kd: KDist, play, tlay, col_gas):
    return ref.interpolation(
        play, tlay, col_gas,
        [tuple(f) for f in kd.flavor],
        np.asarray(kd.press_ref_log), np.asarray(kd.temp_ref),
        kd.press_ref_log_delta, kd.temp_ref_min, kd.temp_ref_delta,
        kd.press_ref_trop_log, np.asarray(kd.vmr_ref),
        np.finfo(np.float64).tiny, kd.neta)
