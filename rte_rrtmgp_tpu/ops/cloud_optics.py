"""Cloud optics: effective-radius LUT interpolation under a cloud mask.

Reference: ``compute_all_from_table`` + the 2str/1scl combination
(``src/Cloud_optics.cpp:72-232``).  Fully vectorized; the per-cell LUT lookup
is a gather over the (nsize, nbnd) tables with indices shaped (ncol, nlay).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import config
from ..models.cloud_lut import CloudLUT
from ..models.types import OpticalProps1scl, OpticalProps2str


def _from_table(cwp, re, nsteps, step_size, offset, tau_t, ssa_t, asy_t):
    """(ncol, nlay) water path + effective size -> banded tau, tau*ssa,
    tau*ssa*g (ncol, nlay, nbnd)."""
    mask = cwp > 0.0
    pos = (re - offset) / step_size
    idx = jnp.minimum(pos.astype(jnp.int32) + 1, nsteps - 1)   # 1-based
    fint = (pos - (idx - 1).astype(cwp.dtype))[:, :, None]

    def lerp(tab):
        lo = jnp.take(tab, idx - 1, axis=0)  # (ncol, nlay, nbnd)
        hi = jnp.take(tab, idx, axis=0)
        return lo + fint * (hi - lo)

    m = mask[:, :, None]
    tau = jnp.where(m, cwp[:, :, None] * lerp(tau_t), 0.0)
    taussa = jnp.where(m, tau * lerp(ssa_t), 0.0)
    taussag = jnp.where(m, taussa * lerp(asy_t), 0.0)
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
    ltau, ltaussa, _ = _from_table(
        lwp, rel, lut.liq_nsteps, lut.liq_step_size, lut.radliq_lwr,
        lut.lut_extliq, lut.lut_ssaliq, lut.lut_asyliq)
    itau, itaussa, _ = _from_table(
        iwp, dei, lut.ice_nsteps, lut.ice_step_size, lut.diamice_lwr,
        lut.lut_extice, lut.lut_ssaice, lut.lut_asyice)
    return OpticalProps1scl(tau=(ltau - ltaussa) + (itau - itaussa))
