"""Spectral flux reductions (reference: ``src/Fluxes.cpp`` +
``src_kernels_cuda/fluxes_kernels.cu`` and the vendored Fortran
``src_kernels/mo_fluxes_byband_kernels.F90``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sum_broadband(gpt_flux):
    """Sum over g-points: (ncol, nlev, ngpt) -> (ncol, nlev)."""
    return jnp.sum(gpt_flux, axis=-1)


def net_broadband(flux_dn, flux_up):
    return flux_dn - flux_up


def onehot_rows(idx, nrows: int, dtype):
    """Exact 0/1 row-selection plane for table lookups on the MXU:
    ``onehot_rows(idx, R, dt) @ table[(R, W)]`` equals ``table[idx]`` with a
    single nonzero unit product per output (element/row gathers at
    (ncol, nlay) index width cost ~0.45 ms each on TPU; the matmul is
    sub-0.1 ms).  ``idx`` is any integer array; returns
    ``(idx.size, nrows)``.  Callers clamp ``idx`` to their table's range
    first — out-of-range rows select NOTHING (all-zero row)."""
    iota = jnp.arange(nrows, dtype=jnp.int32)[None, :]
    return (iota == idx.reshape(-1, 1)).astype(dtype)


def sum_byband(gpt_flux, gpt2band, nbnd: int):
    """Per-band sums: (ncol, nlev, ngpt) -> (ncol, nlev, nbnd).

    ``gpt2band`` maps each (possibly chunk-local) g-point to its *global*
    band.  Implemented as a static segment-sum matmul — on TPU this is one
    small MXU contraction instead of the reference's per-band loops
    (``mo_fluxes_byband_kernels.F90:22-42``).
    """
    g2b = np.asarray(gpt2band, dtype=np.int64)
    seg = np.zeros((g2b.shape[0], nbnd), dtype=gpt_flux.dtype)
    seg[np.arange(g2b.shape[0]), g2b] = 1.0
    return jnp.matmul(gpt_flux, jnp.asarray(seg), precision="highest")


def expand_bands_to_gpt(arr_bnd, gpt2band):
    """Expand (..., nbnd) to (..., ngpt) via the g-point -> band map
    (reference ``expand_and_transpose``, src/Rte_lw.cpp:204-217 — our arrays
    are already column-major-free so no transpose is needed).

    Implemented as a one-hot placement matmul (exactly one nonzero product
    per output, so exact in any matmul precision): on TPU this is a single
    MXU pass instead of a gather (slow scalar path) or a chain of
    per-band broadcast+concat pieces."""
    import jax.numpy as jnp

    idx = np.asarray(gpt2band, dtype=np.int64)
    nbnd = arr_bnd.shape[-1]
    onehot = np.zeros((nbnd, idx.shape[0]), dtype=np.float32)
    onehot[idx, np.arange(idx.shape[0])] = 1.0
    return jnp.matmul(arr_bnd, jnp.asarray(onehot, arr_bnd.dtype),
                      precision="highest")


def heating_rate(flux_up, flux_dn, plev, grav=9.80665, cp=1004.64):
    """Radiative heating rate K/s from net flux divergence (aux output;
    conventional definition, not in the reference driver)."""
    net = flux_dn - flux_up
    dnet = net[:, 1:] - net[:, :-1]
    dp = plev[:, 1:] - plev[:, :-1]
    return grav / cp * dnet / dp
