"""Fused k-table interpolation Pallas kernel.

The hot op of RRTMGP gas optics is the 8-point trilinear k-table lookup
(reference ``gas_optical_depths_major_kernel``,
``src_kernels_cuda/gas_optics_rrtmgp_kernels.cu:398-443``).  The pure-XLA
path (ops/gas_optics.py) phrases it as HBM row gathers, which costs a
multi-GB slab round-trip per table at RCEMIP scale.  This kernel keeps the
whole k-table **resident in VMEM** and, for each (column, layer) cell,
dynamically slices the four (neta, gpt) corner slabs directly on-chip and
contracts the eta axis with a fused one-hot selection — no slab ever touches
HBM.

The eta axis is padded to a 16-row stride so every dynamic slice start is
sublane-aligned (Mosaic requires multiples of 8); padded rows are zeroed and
always carry zero one-hot weight.

Inputs (per g-point chunk of width G):
  table  (R*16, G) f32      — row layout, eta stride padded to 16, VMEM
  rows   (N, 4) int32       — (p*T + t) row index per (cell, corner)
  je     (N, 2, G) int32    — per-g-point eta lower corner, per temp pair
  fm     (N, 4, 2, G) f32   — trilinear weights per (corner, eta corner),
                              with col_mix pre-folded for the tau variant
Output:
  out    (N, G) f32 = sum_corner sum_de fm * table[row*16 + je + de]

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


def _kernel(corner_itemp, rows_ref, je_ref, fm_ref, table_ref, out_ref):
    B, G = out_ref.shape
    e_iota = jax.lax.broadcasted_iota(jnp.int32, (ETA_STRIDE, G), 0)

    def body(b, _):
        acc = jnp.zeros((1, G), out_ref.dtype)
        for c, i in enumerate(corner_itemp):   # corner -> temperature pair
            r = rows_ref[b, c] * ETA_STRIDE
            slab = table_ref[pl.ds(r, ETA_STRIDE), :]      # (16, G)
            je = je_ref[b, i, :][None, :]                  # (1, G)
            sel0 = (e_iota == je).astype(slab.dtype)
            sel1 = (e_iota == je + 1).astype(slab.dtype)
            w = (fm_ref[b, c, 0, :][None, :] * sel0
                 + fm_ref[b, c, 1, :][None, :] * sel1)     # (16, G)
            acc = acc + jnp.sum(w * slab, axis=0, keepdims=True)
        out_ref[b, :] = acc[0]
        return 0

    jax.lax.fori_loop(0, B, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("neta", "block", "corner_itemp"))
def interp_rows_pallas(table, rows, je, fm, *, neta: int, block: int = 256,
                       corner_itemp: tuple = (0, 0, 1, 1)):
    """See module docstring.  table (R, E, G) unpadded row layout;
    rows (N, NC) *unscaled* row indices; je (N,2,G); fm (N,NC,2,G);
    corner_itemp maps each of the NC corners to its temperature pair
    (4 corners (0,0,1,1) for the major/Planck tables; 2 corners (0,1)
    for Rayleigh).  Returns (N, G)."""
    N, G = fm.shape[0], fm.shape[-1]
    NC = len(corner_itemp)
    assert fm.shape[1] == NC and rows.shape[1] == NC, (fm.shape, rows.shape)
    R = table.shape[0]
    assert table.shape[1] == neta, (table.shape, neta)

    tbl = jnp.pad(table, ((0, 0), (0, ETA_STRIDE - neta), (0, 0)))
    tbl = tbl.reshape(R * ETA_STRIDE, G)

    pad = (-N) % block
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        je = jnp.pad(je, ((0, pad), (0, 0), (0, 0)))
        fm = jnp.pad(fm, ((0, pad), (0, 0), (0, 0), (0, 0)))
    n_pad = N + pad

    out = pl.pallas_call(
        functools.partial(_kernel, corner_itemp),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((block, NC), lambda ib: (ib, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block, 2, G), lambda ib: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, NC, 2, G), lambda ib: (ib, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R * ETA_STRIDE, G), lambda ib: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, G), lambda ib: (ib, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, G), table.dtype),
    )(rows, je, fm, tbl)
    return out[:N] if pad else out
