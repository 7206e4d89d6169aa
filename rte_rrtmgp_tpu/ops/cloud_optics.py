"""Cloud optics: effective-radius LUT interpolation under a cloud mask.

Reference: ``compute_all_from_table`` + the 2str/1scl combination
(``src/Cloud_optics.cpp:72-232``).  Fully vectorized; the per-cell LUT
lookup is phrased as a one-hot MXU matmul over the lane-concatenated
(nsize, ntab*nbnd) tables rather than a per-cell gather: on TPU each tiny
(nsize, nbnd) table gather costs ~0.45 ms at 147k cells and a full all-sky
step needs 20 of them (~9 ms, the leading XLA-fusion cost of the step,
PERF.md), while the two one-hot matmuls per phase are sub-0.1 ms.  A
single nonzero unit product per output keeps the lookup exact, and the
lo/hi corners stay separate so ``lo + fint*(hi - lo)`` matches the
reference/oracle association bit-for-bit.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import config
from ..models.cloud_lut import CloudLUT
from ..models.types import OpticalProps1scl, OpticalProps2str
from .fluxes import onehot_rows


def _from_table(cwp, re, nsteps, step_size, offset, *tabs):
    """(ncol, nlay) water path + effective size -> per-band products
    (tau, tau*ssa[, tau*ssa*g]) each (ncol, nlay, nbnd), given
    (tau_t, ssa_t[, asy_t]) LUTs of shape (nsize, nbnd)."""
    dtype = cwp.dtype
    ncol, nlay = cwp.shape
    mask = cwp > 0.0
    pos = (re - offset) / step_size
    idx = jnp.minimum(pos.astype(jnp.int32) + 1, nsteps - 1)   # 1-based
    fint = (pos - (idx - 1).astype(dtype))[:, :, None]

    # One-hot size-bin selection on the MXU: cat = [tau|ssa|asy] tables
    # lane-concatenated, sel_lo/sel_hi (N, nsize) exact 0/1 planes.  Indices
    # are floor-clamped at row 0 (matching jnp.take's clip mode, which the
    # gather formulation relied on): for re below the table range both
    # corners collapse to the first row — a flat clamp — where unclamped
    # one-hots would be all-zero and silently zero the cloud (the
    # C++ reference reads out of bounds there; below-range re is its
    # callers' contract, src/Cloud_optics.cpp:85-94).
    cat = jnp.concatenate(tabs, axis=1)                        # (S, ntab*B)
    sel_hi = onehot_rows(jnp.maximum(idx, 0), nsteps, dtype)
    sel_lo = onehot_rows(jnp.maximum(idx - 1, 0), nsteps, dtype)
    mm = lambda s: jnp.matmul(s, cat, precision="highest").reshape(
        ncol, nlay, -1)
    lo3 = mm(sel_lo)
    hi3 = mm(sel_hi)
    lerped = lo3 + fint * (hi3 - lo3)        # (ncol, nlay, ntab*nbnd)
    nbnd = tabs[0].shape[1]

    m = mask[:, :, None]
    tau = jnp.where(m, cwp[:, :, None] * lerped[:, :, :nbnd], 0.0)
    taussa = jnp.where(m, tau * lerped[:, :, nbnd:2 * nbnd], 0.0)
    if len(tabs) == 2:
        return tau, taussa
    taussag = jnp.where(m, taussa * lerped[:, :, 2 * nbnd:], 0.0)
    return tau, taussa, taussag


def cloud_optics_2str(lut: CloudLUT, lwp, iwp, rel, dei) -> OpticalProps2str:
    """Two-stream cloud optics per band (src/Cloud_optics.cpp:111-172)."""
    eps = config.eps(lwp.dtype)
    ltau, ltaussa, ltaussag = _from_table(
        lwp, rel, lut.liq_nsteps, lut.liq_step_size, lut.radliq_lwr,
        lut.lut_extliq, lut.lut_ssaliq, lut.lut_asyliq)
    itau, itaussa, itaussag = _from_table(
        iwp, dei, lut.ice_nsteps, lut.ice_step_size, lut.diamice_lwr,
        lut.lut_extice, lut.lut_ssaice, lut.lut_asyice)

    tau = ltau + itau
    taussa = ltaussa + itaussa
    taussag = ltaussag + itaussag
    return OpticalProps2str(
        tau=tau,
        ssa=taussa / jnp.maximum(tau, eps),
        g=taussag / jnp.maximum(taussa, eps),
    )


def cloud_optics_1scl(lut: CloudLUT, lwp, iwp, rel, dei) -> OpticalProps1scl:
    """Absorption-only cloud optics: tau_abs = tau - tau*ssa
    (src/Cloud_optics.cpp:176-232)."""
    ltau, ltaussa = _from_table(
        lwp, rel, lut.liq_nsteps, lut.liq_step_size, lut.radliq_lwr,
        lut.lut_extliq, lut.lut_ssaliq)
    itau, itaussa = _from_table(
        iwp, dei, lut.ice_nsteps, lut.ice_step_size, lut.diamice_lwr,
        lut.lut_extice, lut.lut_ssaice)
    return OpticalProps1scl(tau=(ltau - ltaussa) + (itau - itaussa))
