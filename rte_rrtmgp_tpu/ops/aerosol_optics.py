"""Aerosol optics: 11 CAMS species, relative-humidity-classed tables.

Reference: ``src/Aerosol_optics.cpp:38-222``.  The species loop unrolls at
trace time over the static ``AEROSOL_SPECIES`` spec; the rh-class search
(``rh_class``, `:26-36`) becomes a vectorized ``searchsorted``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import config
from ..models.aerosol_lut import AerosolLUT, AEROSOL_SPECIES
from ..models.types import OpticalProps2str


def aerosol_optics_2str(lut: AerosolLUT, aermr, rh, plev) -> OpticalProps2str:
    """aermr: (ncol, nlay, 11) mass mixing ratios in AEROSOL_SPECIES order;
    rh: (ncol, nlay) relative humidity; plev: (ncol, nlay+1).

    Returns banded two-stream optical properties (ncol, nlay, nbnd).
    """
    eps = config.eps(rh.dtype)
    # dpg = |plev[l] - plev[l+1]| / g  (src/Aerosol_optics.cpp:54; the
    # reference assumes surface-at-index-0 ordering — abs() makes the layer
    # mass orientation-independent).
    dpg = jnp.abs(plev[:, :-1] - plev[:, 1:]) / 9.81

    # rh class: smallest ihum with rh_upper[ihum] >= rh.
    ihum = jnp.searchsorted(lut.rh_upper, rh, side="left")
    ihum = jnp.clip(ihum, 0, lut.nhum - 1)

    tau = 0.0
    taussa = 0.0
    taussag = 0.0
    for k, spec in enumerate(AEROSOL_SPECIES):
        mmr = aermr[:, :, k]
        if spec.philic:
            mext = lut.mext_philic[:, :, spec.table_idx]  # (nbnd, nhum)
            ssa = lut.ssa_philic[:, :, spec.table_idx]
            g = lut.g_philic[:, :, spec.table_idx]
            mext_cl = jnp.take(mext, ihum, axis=1)  # (nbnd, ncol, nlay)
            ssa_cl = jnp.take(ssa, ihum, axis=1)
            g_cl = jnp.take(g, ihum, axis=1)
            mext_cl = jnp.moveaxis(mext_cl, 0, -1)  # (ncol, nlay, nbnd)
            ssa_cl = jnp.moveaxis(ssa_cl, 0, -1)
            g_cl = jnp.moveaxis(g_cl, 0, -1)
        else:
            mext_cl = lut.mext_phobic[None, None, :, spec.table_idx]
            ssa_cl = lut.ssa_phobic[None, None, :, spec.table_idx]
            g_cl = lut.g_phobic[None, None, :, spec.table_idx]

        od = (mmr * dpg)[:, :, None] * mext_cl
        tau = tau + od
        taussa = taussa + od * ssa_cl
        taussag = taussag + od * ssa_cl * g_cl

    return OpticalProps2str(
        tau=tau,
        ssa=taussa / jnp.maximum(tau, eps),
        g=taussag / jnp.maximum(taussa, eps),
    )
