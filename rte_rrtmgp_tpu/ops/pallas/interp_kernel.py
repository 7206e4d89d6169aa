"""Fused k-table interpolation Pallas kernel.

The hot op of RRTMGP gas optics is the multi-point k-table interpolation
(reference ``gas_optical_depths_major_kernel``,
``src_kernels_cuda/gas_optics_rrtmgp_kernels.cu:398-443`` and friends).  The
pure-XLA path (ops/gas_optics.py) phrases it as HBM row gathers, which costs
a multi-GB slab round-trip per table at RCEMIP scale.  This kernel keeps the
whole k-table **resident in VMEM** and, for each (column, layer) cell,
dynamically slices the (neta, gpt) corner slabs directly on-chip and
contracts the eta axis with a fused one-hot selection — no slab ever touches
HBM.

The eta axis is padded to a 16-row stride so every dynamic slice start is
sublane-aligned (Mosaic requires multiples of 8); padded rows are zeroed and
always carry zero one-hot weight.

One kernel serves four ops, differing only in corner count and row content:
  * tau_major / planck_frac: 4 corners (itemp x dpress), rows (p*T + t)
  * tau_rayleigh:            2 corners (itemp),          rows (itropo*T + t)
  * tau_minor (per atmosphere): 2 corners (itemp),       rows (t), with the
    "g" axis being the concatenated minor-contributor axis

Weight planes arrive as SEPARATE (N, G) inputs (not a stacked (N, NC, 2, G)
array): stacking materializes through a chain of dynamic-update-slice
fusions that costs more than the kernel itself.

Cells are processed in blocks of B rows per grid step with an in-kernel
fori_loop; the block size is autotunable (utils/tuner.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ETA_STRIDE = 16


def _kernel(corner_itemp, rows_ref, *refs):
    nc = len(corner_itemp)
    je_refs = refs[0:2]
    fm_refs = refs[2:2 + 2 * nc]      # (corner, de) pairs, c-major
    table_ref = refs[2 + 2 * nc]
    out_ref = refs[3 + 2 * nc]
    B, G = out_ref.shape
    e_iota = jax.lax.broadcasted_iota(jnp.int32, (ETA_STRIDE, G), 0)

    def body(b, _):
        acc = jnp.zeros((1, G), out_ref.dtype)
        for c, i in enumerate(corner_itemp):   # corner -> temperature pair
            r = rows_ref[b, c] * ETA_STRIDE
            slab = table_ref[pl.ds(r, ETA_STRIDE), :]      # (16, G)
            je = je_refs[i][b, :][None, :]                 # (1, G)
            sel0 = (e_iota == je).astype(slab.dtype)
            sel1 = (e_iota == je + 1).astype(slab.dtype)
            w = (fm_refs[2 * c][b, :][None, :] * sel0
                 + fm_refs[2 * c + 1][b, :][None, :] * sel1)  # (16, G)
            acc = acc + jnp.sum(w * slab, axis=0, keepdims=True)
        out_ref[b, :] = acc[0]
        return 0

    jax.lax.fori_loop(0, B, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("neta", "block", "corner_itemp"))
def interp_rows_pallas(table, rows, jes, fms, *, neta: int, block: int = 256,
                       corner_itemp: tuple = (0, 0, 1, 1)):
    """table (R, E, G) unpadded row layout; rows (N, NC) *unscaled* row
    indices; jes = (je_itemp0, je_itemp1) each (N, G) int32; fms = flat
    tuple of 2*NC weight planes (N, G) ordered (corner0_de0, corner0_de1,
    corner1_de0, ...); corner_itemp maps each corner to its temperature
    pair.  Returns (N, G)."""
    N, G = fms[0].shape
    NC = len(corner_itemp)
    assert len(jes) == 2 and len(fms) == 2 * NC, (len(jes), len(fms), NC)
    R = table.shape[0]
    assert table.shape[1] == neta, (table.shape, neta)

    tbl = jnp.pad(table, ((0, 0), (0, ETA_STRIDE - neta), (0, 0)))
    tbl = tbl.reshape(R * ETA_STRIDE, G)

    pad = (-N) % block
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        jes = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in jes)
        fms = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in fms)
    n_pad = N + pad

    plane = pl.BlockSpec((block, G), lambda ib: (ib, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, corner_itemp),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((block, NC), lambda ib: (ib, 0),
                         memory_space=pltpu.SMEM),
            *([plane] * (2 + 2 * NC)),
            pl.BlockSpec((R * ETA_STRIDE, G), lambda ib: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=plane,
        out_shape=jax.ShapeDtypeStruct((n_pad, G), table.dtype),
    )(rows, *jes, *fms, tbl)
    return out[:N] if pad else out
