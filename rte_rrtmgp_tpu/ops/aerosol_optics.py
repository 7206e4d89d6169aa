"""Aerosol optics: 11 CAMS species, relative-humidity-classed tables.

Reference: ``src/Aerosol_optics.cpp:38-222``.  The species loop unrolls at
trace time over the static ``AEROSOL_SPECIES`` spec; the rh-class search
(``rh_class``, `:26-36`) becomes a vectorized ``searchsorted``.

The per-cell rh-class lookup for every hydrophilic table is phrased as ONE
one-hot MXU matmul over the lane-concatenated (nhum, 3*nphilic*nbnd)
tables instead of per-species ``take`` + ``moveaxis`` (on TPU each tiny
gather costs ~0.45 ms at 147k cells and the transposes force layout-change
copies; the cloud-optics module documents the same measurement).  One
nonzero unit product per output keeps the lookup exact.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import config
from ..models.aerosol_lut import AerosolLUT, AEROSOL_SPECIES
from ..models.types import OpticalProps2str
from .fluxes import onehot_rows


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

    # All philic tables looked up at once: cat[(nhum, 3*P*nbnd)] columns are
    # [mext_0 | ssa_0 | g_0 | mext_1 | ...] per philic species; sel is the
    # exact 0/1 rh-class plane.
    philic = [s for s in AEROSOL_SPECIES if s.philic]
    dtype = rh.dtype
    ncol, nlay = rh.shape
    nbnd = lut.mext_phobic.shape[0]
    if philic:
        cat = jnp.concatenate(
            [t[:, :, s.table_idx].T                    # (nhum, nbnd)
             for s in philic
             for t in (lut.mext_philic, lut.ssa_philic, lut.g_philic)],
            axis=1)
        sel = onehot_rows(ihum, lut.nhum, dtype)
        vals = jnp.matmul(sel, cat, precision="highest").reshape(
            ncol, nlay, -1)
        philic_cl = {s.table_idx: vals[:, :, 3 * i * nbnd:3 * (i + 1) * nbnd]
                     for i, s in enumerate(philic)}

    tau = 0.0
    taussa = 0.0
    taussag = 0.0
    for k, spec in enumerate(AEROSOL_SPECIES):
        mmr = aermr[:, :, k]
        if spec.philic:
            v = philic_cl[spec.table_idx]
            mext_cl = v[:, :, :nbnd]
            ssa_cl = v[:, :, nbnd:2 * nbnd]
            g_cl = v[:, :, 2 * nbnd:]
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
