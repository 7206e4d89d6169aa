"""RRTMGP gas optics — vectorized JAX implementation, TPU-first.

The TPU-native re-design of the reference gas-optics kernels
(``src_kernels_cuda/gas_optics_rrtmgp_kernels.cu``).  The central constraint
on TPU is that *element* gathers (arbitrary per-element indices) lower to a
scalar path that runs ~1000x below memory bandwidth, while *row* gathers
(shared index per 128-lane row) run near bandwidth.  So every k-table lookup
here is phrased as a row gather plus fused elementwise selection:

* the 8-point trilinear k-table interpolation of the major-gas kernel
  (`:398-443`) gathers four (neta, ngpt) "slabs" per (col, lay) — one per
  (temperature, pressure) corner — from the load-time row layout
  ``KDist.kmajor_rows`` ((npress+1)*ntemp rows), then contracts the eta axis
  with a one-hot mask built from per-g-point eta indices,
* per-flavor quantities (jeta, col_mix, fminor, fmajor) are expanded to
  per-g-point with **static** flavor masks (two, selected by the troposphere
  flag) — a masked sum over <=10 flavors instead of a gather,
* the ragged minor-gas interval loop (`:458-579`) unrolls at trace time over
  the static ``MinorSpec`` tuple; each interval does one 2-row gather from a
  de-pre-expanded table (``KDist.kminor_*_rows``),
* Planck sources (`:196-314`) reuse the major-gas slab rows on the
  ``planck_rows`` table; Rayleigh (`:674-718`) uses 2-row gathers on
  ``krayl_rows``.

Floating-point accumulation order matches the reference kernels pairwise
(the eta one-hot adds exact zeros), so results agree with the NumPy oracle
(ops/reference.py) to roundoff.

Everything is shape-polymorphic in (ncol, nlay) and jit-compatible with
``KDist`` passed as a pytree argument.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from ..models.kdist import KDist
from ..models.types import OpticalProps1scl, OpticalProps2str, SourceFuncLW
from ..utils.pytree import pytree_dataclass
from .fluxes import expand_bands_to_gpt, onehot_rows


@pytree_dataclass
class Interp:
    """Interpolation indices/weights (all indices 0-based lower corners).

    Per-flavor weight arrays are stored FLAT in the last axis — trailing
    dims of size 2 would tile onto the TPU's (8, 128) layout with up to
    256x padding inflation, so (nflav, 2, 2, 2) becomes one axis of
    nflav*8.  Use the ``jeta0_r/col_mix_r/fminor_r/fmajor_r`` properties
    for the logical shapes (tests, oracles)."""

    jtemp0: object    # (ncol, nlay) int32 in [0, ntemp-2]
    jpress0: object   # (ncol, nlay) int32: 0-based row of jpress (1-based) - 1
    fpress: object    # (ncol, nlay) pressure interpolation fraction
    tropo: object     # (ncol, nlay) bool
    itropo01: object  # (ncol, nlay) int32: 0 troposphere / 1 upper
    jeta0: object     # (ncol, nlay, 2*nflav) int32; index itemp*F + f
    col_mix: object   # (ncol, nlay, 2*nflav); index itemp*F + f
    fminor: object    # (ncol, nlay, 4*nflav); index (itemp*2 + deta)*F + f
    fmajor: object    # (ncol, nlay, 8*nflav); index (itemp*4+dp*2+deta)*F + f

    @property
    def nflav(self) -> int:
        return self.jeta0.shape[2] // 2

    # Logical-view reshapes (free at trace time; for tests/oracle parity).
    def _r(self, a, comps):
        c, l = a.shape[:2]
        return jnp.moveaxis(a.reshape((c, l) + comps + (self.nflav,)), -1, 2)

    @property
    def jeta0_r(self):
        return self._r(self.jeta0, (2,))

    @property
    def col_mix_r(self):
        return self._r(self.col_mix, (2,))

    @property
    def fminor_r(self):
        return self._r(self.fminor, (2, 2))

    @property
    def fmajor_r(self):
        return self._r(self.fmajor, (2, 2, 2))


def _take_small(table, idx):
    """Exact gather from a tiny table via masked sum (TPU: fused VPU ops,
    no scalar gather).  table: (R, *w); idx: (...) int -> out (..., *w)."""
    r0 = jnp.where(idx == 0, 1.0, 0.0).astype(table.dtype)
    out = r0[(...,) + (None,) * (table.ndim - 1)] * table[0]
    for r in range(1, table.shape[0]):
        m = jnp.where(idx == r, 1.0, 0.0).astype(table.dtype)
        out = out + m[(...,) + (None,) * (table.ndim - 1)] * table[r]
    return out


def _take_small_select(table, idx):
    """Like _take_small but NaN/Inf-safe (select, not multiply-by-zero):
    needed for the precomputed eta ratio table whose never-selected rows can
    contain 0/0."""
    shape = idx.shape + table.shape[1:]
    idx_b = idx[(...,) + (None,) * (table.ndim - 1)]
    out = jnp.zeros(shape, table.dtype)
    for r in range(table.shape[0]):
        out = jnp.where(idx_b == r, table[r], out)
    return out


def interpolation(kd: KDist, play, tlay, col_gas) -> Interp:
    """Vectorized port of interpolation_kernel (:317-395)."""
    dtype = play.dtype
    ntemp, neta, npres = kd.ntemp, kd.neta, kd.press_ref_log.shape[0]
    tiny = config.tiny(dtype)

    jtemp = jnp.clip(
        ((tlay - (kd.temp_ref_min - kd.temp_ref_delta)) / kd.temp_ref_delta)
        .astype(jnp.int32), 1, ntemp - 1)
    ftemp = (tlay - _take_small(kd.temp_ref, jtemp - 1)) / kd.temp_ref_delta

    log_play = jnp.log(play)
    locpress = 1.0 + (log_play - kd.press_ref_log[0]) / kd.press_ref_log_delta
    jpress = jnp.clip(locpress.astype(jnp.int32), 1, npres - 1)
    fpress = locpress - jpress.astype(dtype)

    tropo = log_play > kd.press_ref_trop_log
    itropo01 = jnp.where(tropo, 0, 1).astype(jnp.int32)

    # --- per-flavor binary-species mixing ---
    gas1 = np.array([f[0] for f in kd.flavor], dtype=np.int32)   # (nflav,)
    gas2 = np.array([f[1] for f in kd.flavor], dtype=np.int32)

    cg1 = col_gas[:, :, gas1]   # (ncol, nlay, nflav) — static column gather
    cg2 = col_gas[:, :, gas2]

    # eta ratio vmr1/vmr2 at (itropo, jtemp0 + itemp), precomputed per
    # flavor at load time (KDist.ratio_rows, rows = itropo*ntemp + jtemp).
    jt0 = jtemp - 1
    rows = itropo01 * ntemp + jt0                                # (ncol,nlay)
    r0 = _take_small_select(kd.ratio_rows, rows)                 # (...,nflav)
    r1 = _take_small_select(kd.ratio_rows, rows + 1)
    ratio = jnp.stack([r0, r1], axis=-1)                         # (...,nflav,2)

    col_mix = cg1[..., None] + ratio * cg2[..., None]            # (...,nflav,2)
    eta = jnp.where(col_mix > 2.0 * tiny, cg1[..., None] / col_mix, 0.5)

    loceta = eta * (neta - 1)
    jeta = jnp.minimum(loceta.astype(jnp.int32) + 1, neta - 1)  # 1-based
    feta = jnp.mod(loceta, 1.0)
    ftt = jnp.stack([1.0 - ftemp, ftemp], axis=-1)[:, :, None, :]  # (ncol,nlay,1,2)

    fminor = jnp.stack([(1.0 - feta) * ftt, feta * ftt], axis=-1)  # (...,2it,2eta)
    fp = fpress[:, :, None, None, None]
    fmajor = jnp.stack([(1.0 - fp) * fminor, fp * fminor], axis=-2)  # (...,2,2p,2e)

    ncol, nlay = play.shape
    # Component-major flat layout: flavor is the minor (contiguous) index so
    # per-component slices are contiguous (stride-1) lane slices.
    flat = lambda a: jnp.moveaxis(a, 2, -1).reshape(ncol, nlay, -1)
    return Interp(
        jtemp0=jtemp - 1,
        jpress0=jpress - 1,
        fpress=fpress,
        tropo=tropo,
        itropo01=itropo01,
        jeta0=flat(jeta - 1),
        col_mix=flat(col_mix),
        fminor=flat(fminor),
        fmajor=flat(fmajor),
    )


def _flavor_masks(kd: KDist, dtype):
    """Static 0/1 masks (2 atmospheres, nflav, ngpt): mask[a, f, g] = 1 iff
    g-point g uses flavor f in atmosphere a (gpoint_flavor, `:331-363`)."""
    gpf = np.asarray(kd.gpoint_flavor, dtype=np.int64)   # (2, ngpt)
    f_iota = np.arange(kd.nflav, dtype=np.int64)[None, :, None]
    return np.asarray(gpf[:, None, :] == f_iota, dtype=dtype)


def _resolve_flav(x, masks, tropo):
    """Expand a per-flavor quantity to per-g-point with static masks.

    x: (ncol, nlay, nflav); masks: (2, nflav, ngpt) 0/1; tropo (ncol, nlay).
    Exactly one mask entry is 1 per (a, g), so the one-hot contraction is an
    exact select — the TPU-friendly replacement for take_along_axis over
    flavors, phrased as an MXU matmul (a single nonzero product per output
    stays exact in every matmul precision).

    The troposphere select is FOLDED INTO the contraction: x is masked by
    tropo on the tiny (.., nflav) axis and both atmospheres' masks are
    stacked on the contraction axis, so the per-(cell, g) result is one
    exact product plus an exact zero — no full-width (ncol, nlay, ngpt)
    where() plane (those selects were a leading fusion cost, PERF.md)."""
    m = jnp.asarray(masks, x.dtype)                       # (2, F, G)
    tf = tropo.astype(x.dtype)[:, :, None]
    x2 = jnp.concatenate([x * tf, x * (1.0 - tf)], axis=-1)
    m2 = jnp.concatenate([m[0], m[1]], axis=0)            # (2F, G)
    return jnp.matmul(x2, m2, precision="highest")


def _resolve_flav_int(x, kd: KDist, tropo):
    """Integer variant (for jeta0): one-hot matmul in f32 — values
    <= neta-1 are exactly representable, and a one-nonzero-product
    contraction is exact, so the result is already an exact float
    integer.  Returned as f32 (the Pallas kernels compare eta indices in
    the table dtype; converting the (N, G) plane back to int32 would cost
    two full-plane ops per plane for nothing)."""
    masks = _flavor_masks(kd, np.float32)
    return _resolve_flav(x.astype(jnp.float32), masks, tropo)


def _kernel_resolves(kd: KDist, interp: Interp, masks):
    """Per-g-point eta indices and fminor weight planes for the Pallas
    kernel — shared (and CSE'd by XLA) across tau_major, planck_source and
    tau_rayleigh within a spectral chunk."""
    F = kd.nflav
    tropo = interp.tropo
    C, L = tropo.shape
    G = masks.shape[2]
    N = C * L
    jes = tuple(
        _resolve_flav_int(interp.jeta0[:, :, i * F:(i + 1) * F], kd, tropo)
        .reshape(N, G) for i in range(2))   # exact f32 integers
    fms = tuple(
        _resolve_flav(interp.fminor[:, :, c * F:(c + 1) * F], masks, tropo)
        .reshape(N, G) for c in range(4))   # (itemp*2 + deta) order
    return jes, fms


def _slab_rows(kd: KDist, interp: Interp):
    """Row indices into kmajor_rows/planck_rows: (ncol, nlay, 2itemp, 2press),
    r = (jpress0 + itropo + dp) * ntemp + (jtemp0 + i)."""
    T = kd.ntemp
    p0 = interp.jpress0 + interp.itropo01
    base = p0 * T + interp.jtemp0
    di = np.arange(2, dtype=np.int32)[None, None, :, None]       # itemp
    dp = np.arange(2, dtype=np.int32)[None, None, None, :] * T   # press
    return base[:, :, None, None] + di + dp


def _interp3d_rows(kd: KDist, table_rows, interp: Interp, scale_by_colmix):
    """Shared trilinear interpolation over a row-layout table
    ((npress+1)*ntemp, neta, ngpt): the math of
    gas_optical_depths_major_kernel (:398-443) / Planck_source_kernel's
    pfrac (:262-271).

    Two lowerings of the same math:
    * XLA path: 4 HBM row gathers per (col,lay) + fused one-hot eta
      contraction (works on any backend, any dtype),
    * Pallas TPU path (config.use_pallas()): the table stays VMEM-resident
      and the corner slabs are sliced on-chip (ops/pallas/interp_kernel.py).
    """
    dtype = table_rows.dtype
    neta = table_rows.shape[1]
    masks = _flavor_masks(kd, dtype)
    tropo = interp.tropo

    if config.use_pallas() and dtype == jnp.float32:
        return _interp3d_rows_pallas(kd, table_rows, interp, scale_by_colmix,
                                     masks)

    rows = _slab_rows(kd, interp)                    # (C,L,2,2)
    slab = jnp.take(table_rows, rows, axis=0)        # (C,L,2,2,E,G)

    e_iota = jnp.arange(neta, dtype=jnp.int32)[None, None, :, None]
    out = 0.0
    for i in range(2):
        F = kd.nflav
        je = _resolve_flav_int(interp.jeta0[:, :, i * F:(i + 1) * F], kd, tropo)
        je_b = je[:, :, None, :]
        sel0 = (e_iota == je_b).astype(dtype)        # (C,L,E,G)
        sel1 = (e_iota == je_b + 1).astype(dtype)
        acc = 0.0
        for dp in range(2):
            c0 = (i * 4 + dp * 2) * F
            w0 = _resolve_flav(interp.fmajor[:, :, c0:c0 + F], masks, tropo)
            w1 = _resolve_flav(interp.fmajor[:, :, c0 + F:c0 + 2 * F], masks, tropo)
            w = w0[:, :, None, :] * sel0 + w1[:, :, None, :] * sel1
            acc = acc + jnp.sum(w * slab[:, :, i, dp], axis=2)
        if scale_by_colmix:
            cm = _resolve_flav(interp.col_mix[:, :, i * F:(i + 1) * F], masks, tropo)
            out = out + cm * acc
        else:
            out = out + acc
    return out


def _interp3d_rows_pallas(kd: KDist, table_rows, interp: Interp,
                          scale_by_colmix, masks):
    """Pallas lowering of _interp3d_rows (same math, VMEM-resident table)."""
    from .pallas import interp_rows_pallas, kernel_opts


    C, L = interp.tropo.shape
    N = C * L
    neta = table_rows.shape[1]
    G = table_rows.shape[2]
    tropo = interp.tropo
    F = kd.nflav

    rows = _slab_rows(kd, interp).reshape(N, 4)
    jes, fms = _kernel_resolves(kd, interp, masks)
    fp = interp.fpress.reshape(N)
    cms = None
    if scale_by_colmix:
        cms = tuple(
            _resolve_flav(interp.col_mix[:, :, i * F:(i + 1) * F], masks,
                          tropo).reshape(N, G) for i in range(2))

    out = interp_rows_pallas(
        table_rows, rows.astype(jnp.int32), jes, fms,
        fp=fp, cms=cms, neta=neta, **kernel_opts())
    return out.reshape(C, L, G)


def tau_major(kd: KDist, interp: Interp, cellw=None, g0=0):
    """tau from major gases: (ncol, nlay, ngpt)."""
    dtype = kd.kmajor_rows.dtype
    if cellw is not None and config.use_pallas() and dtype == jnp.float32:
        from .pallas import interp_cellw_multi

        C, L = interp.tropo.shape
        G = kd.kmajor_rows.shape[2]
        M2 = jnp.asarray(cellw.masks2[:, g0:g0 + G], dtype)
        (tau,) = interp_cellw_multi(
            [kd.kmajor_rows], [cellw.rows], cellw.V, M2, cellw.fp,
            metas=(((0, 0, 1, 1), True, True, 0, True),),
            neta=kd.neta, **_cellw_opts())
        return tau.reshape(C, L, G)
    return _interp3d_rows(kd, kd.kmajor_rows, interp, scale_by_colmix=True)


def _fused_inputs(kd: KDist, interp: Interp, masks, with_colmix: bool):
    C, L = interp.tropo.shape
    N = C * L
    F = kd.nflav
    rows = _slab_rows(kd, interp).reshape(N, 4).astype(jnp.int32)
    jes, fms = _kernel_resolves(kd, interp, masks)
    fp = interp.fpress.reshape(N)
    cms = None
    if with_colmix:
        cms = tuple(
            _resolve_flav(interp.col_mix[:, :, i * F:(i + 1) * F], masks,
                          interp.tropo).reshape(N, fms[0].shape[1])
            for i in range(2))
    return rows, jes, fms, fp, cms


def layer_major_enabled() -> bool:
    """Layer-major 2D interchange (cells ordered l*ncol + c, planes kept
    (N, G) end-to-end, layer-grid solver kernels): the second-generation
    TPU data layout — no (ncol, nlay*G) retiling copies, depth-blind
    solver VMEM.  Env > persisted autotune winner > default off."""
    import os

    env = os.environ.get("RTE_RRTMGP_LAYERMAJOR")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        from ..utils import tuner

        t = tuner.best_kernel_opts() or {}
        if t.get("layermajor") is not None:
            return bool(t["layermajor"])
    except Exception:
        pass
    return False


def _cells(x, order: str):
    """(C, L, ...) -> (N, ...) in the requested cell order: "cm" packs
    column-major (cell c*L + l, the row order of a plain reshape), "lm"
    layer-major (cell l*C + c — the layer-grid solvers' operand order)."""
    if order == "lm":
        x = jnp.swapaxes(x, 0, 1)
    return x.reshape((-1,) + x.shape[2:])


class CellW:
    """Per-cell resolve pack for the in-kernel weight-resolve Pallas mode
    (``interp_cellw_multi``): built ONCE per solve, g-independent, shared
    by every interp pass and every spectral chunk.

    * ``V``  (N*8, 2F): per cell 8 tropo-folded flavor rows
      [je0, je1, fm0..3, cm0, cm1] with row = concat(x*tf, x*(1-tf)),
    * ``masks2`` (2F, ngpt) np: stacked flavor masks [m_tropo; m_upper] —
      a per-chunk column slice becomes the kernel's static M2,
    * ``rows`` (N, 4) int32 slab rows, ``fp`` (N,) pressure fraction,
    * ``order``: the cell ordering ("cm" column-major c*L + l — the plain
      reshape order; "lm" layer-major l*C + c — the layer-grid solvers'
      operand order).  Interp passes fed an "lm" pack return flat (N, G)
      layer-major planes instead of (C, L, G).
    """

    __slots__ = ("V", "masks2", "rows", "fp", "order")

    def __init__(self, V, masks2, rows, fp, order="cm"):
        self.V, self.masks2, self.rows, self.fp = V, masks2, rows, fp
        self.order = order


def cellw_enabled() -> bool:
    """Env > persisted autotune winner > default on."""
    import os

    env = os.environ.get("RTE_RRTMGP_PALLAS_CELLW")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        from ..utils import tuner

        t = tuner.best_kernel_opts() or {}
        if t.get("cellw") is not None:
            return bool(t["cellw"])
    except Exception:
        pass
    return True


def cellw_resolves(kd: KDist, interp: Interp, order: str = "cm"):
    """Build the :class:`CellW` pack (None when the Pallas path or the
    cellw mode is off).  Replaces the per-chunk (N, G) weight-plane builds
    — the leading XLA-fusion + DMA cost of the step (PERF.md) — with one
    small g-independent tensor resolved in-kernel on the MXU
    (VERDICT r2 item 2; reference analog: the fused interpolation+tau
    kernels of gas_optics_rrtmgp_kernels.cu:317-443 never materialize
    per-g weight planes either).  ``order``: cell ordering (see
    :class:`CellW`)."""
    dtype = kd.kmajor_rows.dtype
    if not (config.use_pallas() and dtype == jnp.float32
            and cellw_enabled()):
        return None
    C, L = interp.tropo.shape
    N = C * L
    F = kd.nflav
    tf = interp.tropo.astype(dtype)[:, :, None]                # (C, L, 1)

    def fold(x):   # (C, L, F) -> (C, L, 2F)
        return jnp.concatenate([x * tf, x * (1.0 - tf)], axis=-1)

    rows8 = [fold(interp.jeta0[:, :, 0:F].astype(dtype)),
             fold(interp.jeta0[:, :, F:2 * F].astype(dtype))]
    rows8 += [fold(interp.fminor[:, :, c * F:(c + 1) * F]) for c in range(4)]
    rows8 += [fold(interp.col_mix[:, :, i * F:(i + 1) * F]) for i in range(2)]
    V = _cells(jnp.stack(rows8, axis=2), order).reshape(N * 8, 2 * F)

    masks = _flavor_masks(kd, np.float32)                      # np (2, F, G)
    masks2 = np.concatenate([masks[0], masks[1]], axis=0)      # (2F, G)
    rows = _cells(_slab_rows(kd, interp),
                  order).reshape(N, 4).astype(jnp.int32)
    fp = _cells(interp.fpress, order)
    return CellW(V, masks2, rows, fp, order)


def major_resolves(kd: KDist, interp: Interp):
    """Full-spectrum kernel weight planes (rows, jes, fms, fp, cms) for
    the fused Pallas entries, built ONCE per solve and sliced per
    spectral chunk — a chunked driver otherwise rebuilds every
    (N, chunk) plane per chunk, and those plane-build fusions are a
    leading cost of the step (PERF.md).  Returns None when the Pallas
    path is inactive (the XLA fallbacks do not use these)."""
    dtype = kd.kmajor_rows.dtype
    if not (config.use_pallas() and dtype == jnp.float32):
        return None
    masks = _flavor_masks(kd, dtype)
    return _fused_inputs(kd, interp, masks, True)


def _sliced_resolves(kd_chunk, resolves, g0):
    """Slice full-spectrum weight planes to the chunk [g0, g0+G)."""
    G = kd_chunk.kmajor_rows.shape[2]
    rows, jes, fms, fp, cms = resolves
    sl = lambda a: jax.lax.slice_in_dim(a, g0, g0 + G, axis=1)
    return (rows, tuple(map(sl, jes)), tuple(map(sl, fms)), fp,
            None if cms is None else tuple(map(sl, cms)))


def _cellw_opts():
    from .pallas import kernel_opts
    from .pallas.interp_kernel import pairc_enabled, wsel_enabled

    o = kernel_opts()
    return dict(block=o["block"], unroll=o["unroll"], wsel=wsel_enabled(),
                paired=pairc_enabled())


def tau_major_and_pfrac(kd: KDist, interp: Interp, resolves=None, g0=0,
                        cellw=None):
    """Fused kmajor + planck-fraction interpolation.

    Both tables share the same 4-corner slab addressing and eta weights;
    on TPU this is ONE multi-table Pallas pass (half the per-cell loop
    and weight-building cost of two calls).  Returns (tau_major, pfrac),
    each (ncol, nlay, ngpt).  Feed ``pfrac`` to :func:`planck_source`.
    ``resolves``/``g0``: full-spectrum weight planes from
    :func:`major_resolves` and this chunk's g-point offset; ``cellw``:
    the per-cell resolve pack from :func:`cellw_resolves` (preferred —
    weight planes then never materialize in HBM)."""
    dtype = kd.kmajor_rows.dtype
    if config.use_pallas() and dtype == jnp.float32:
        import os

        from .pallas import interp_rows_multi, kernel_opts

        C, L = interp.tropo.shape
        G = kd.kmajor_rows.shape[2]
        if cellw is not None:
            from .pallas import interp_cellw_multi

            M2 = jnp.asarray(cellw.masks2[:, g0:g0 + G], dtype)
            if dup2c_enabled():
                tbl2 = jnp.concatenate([kd.kmajor_rows, kd.planck_rows],
                                       axis=2)
                tau, pfrac = interp_cellw_multi(
                    [tbl2], [cellw.rows], cellw.V, M2, cellw.fp,
                    metas=(((0, 0, 1, 1), True, True, 0, True, True),),
                    neta=kd.neta, **_cellw_opts())
            else:
                tau, pfrac = interp_cellw_multi(
                    [kd.kmajor_rows, kd.planck_rows],
                    [cellw.rows, cellw.rows], cellw.V, M2, cellw.fp,
                    metas=(((0, 0, 1, 1), True, True, 0, True),
                           ((0, 0, 1, 1), True, False, 0, True)),
                    neta=kd.neta, **_cellw_opts())
            if cellw.order == "lm":
                return tau, pfrac
            return tau.reshape(C, L, G), pfrac.reshape(C, L, G)
        if resolves is not None:
            rows, jes, fms, fp, cms = _sliced_resolves(kd, resolves, g0)
        else:
            masks = _flavor_masks(kd, dtype)
            rows, jes, fms, fp, cms = _fused_inputs(kd, interp, masks, True)
        if os.environ.get("RTE_RRTMGP_PALLAS_DUP2", "0") not in (
                "0", "false", "off"):
            # kmajor and planck_frac share rows, eta weights AND the
            # pressure fraction: lane-concatenate the tables and run ONE
            # dup2 op — per-cell dynamic-slice count halves.  Measured a
            # WASH end-to-end on the v5e (46.0 vs 45.4 ms/step: the
            # (N, 2G) output-split copies offset the slice savings) — off
            # by default, kept tested for wider-table regimes.
            tbl2 = jnp.concatenate([kd.kmajor_rows, kd.planck_rows], axis=2)
            (out,) = interp_rows_multi(
                [tbl2], [rows], jes, fms, [fp], [cms],
                metas=(((0, 0, 1, 1), True, True, True),),
                neta=kd.neta, **kernel_opts())
            tau, pfrac = out[:, :G], out[:, G:]
        else:
            tau, pfrac = interp_rows_multi(
                [kd.kmajor_rows, kd.planck_rows], [rows, rows], jes, fms,
                [fp, fp], [cms, None],
                metas=(((0, 0, 1, 1), True, True),
                       ((0, 0, 1, 1), True, False)),
                neta=kd.neta, **kernel_opts())
        return tau.reshape(C, L, G), pfrac.reshape(C, L, G)
    return (_interp3d_rows(kd, kd.kmajor_rows, interp, scale_by_colmix=True),
            _interp3d_rows(kd, kd.planck_rows, interp, scale_by_colmix=False))


def tau_major_and_rayleigh(kd: KDist, interp: Interp, col_gas, col_dry,
                           resolves=None, g0=0, cellw=None):
    """Fused kmajor + krayl interpolation (shared weights, one Pallas
    pass).  Returns (tau_major, tau_rayleigh).  ``resolves``/``g0``/
    ``cellw``: see :func:`tau_major_and_pfrac`."""
    dtype = kd.kmajor_rows.dtype
    if config.use_pallas() and dtype == jnp.float32:

        from .pallas import interp_rows_multi, kernel_opts

        C, L = interp.tropo.shape
        G = kd.kmajor_rows.shape[2]
        ntemp = kd.ntemp
        it = np.arange(2, dtype=np.int32)[None, None, :]
        rows_ray = ((interp.itropo01 * ntemp + interp.jtemp0)[:, :, None]
                    + it).reshape(C * L, 2).astype(jnp.int32)
        if cellw is not None:
            from .pallas import interp_cellw_multi

            if cellw.order == "lm":
                rows_ray = _cells(
                    rows_ray.reshape(C, L, 2), "lm").astype(jnp.int32)
            M2 = jnp.asarray(cellw.masks2[:, g0:g0 + G], dtype)
            tau, kloc = interp_cellw_multi(
                [kd.kmajor_rows, kd.krayl_rows],
                [cellw.rows, rows_ray], cellw.V, M2, cellw.fp,
                metas=(((0, 0, 1, 1), True, True, 0, True),
                       ((0, 1), False, False, 0, True)),
                neta=kd.neta, **_cellw_opts())
            fac_cl = col_gas[:, :, kd.idx_h2o] + col_dry
            if cellw.order == "lm":
                return tau, kloc * _cells(fac_cl, "lm")[:, None]
            return (tau.reshape(C, L, G),
                    kloc.reshape(C, L, G) * fac_cl[:, :, None])
        if resolves is not None:
            rows, jes, fms, fp, cms = _sliced_resolves(kd, resolves, g0)
        else:
            masks = _flavor_masks(kd, dtype)
            rows, jes, fms, fp, cms = _fused_inputs(kd, interp, masks, True)
        tau, kloc = interp_rows_multi(
            [kd.kmajor_rows, kd.krayl_rows], [rows, rows_ray], jes, fms,
            [fp, None], [cms, None],
            metas=(((0, 0, 1, 1), True, True), ((0, 1), False, False)),
            neta=kd.neta, **kernel_opts())
        fac = (col_gas[:, :, kd.idx_h2o] + col_dry)[:, :, None]
        return tau.reshape(C, L, G), kloc.reshape(C, L, G) * fac
    return (tau_major(kd, interp),
            tau_rayleigh(kd, interp, col_gas, col_dry))


def _spec_scaling(kd, spec, maskf, play, tlay, col_gas):
    """Per-interval scaling column (gas_optical_depths_minor_kernel
    :494-519), with the atmosphere mask folded in."""
    dtype = play.dtype
    scaling = col_gas[:, :, spec.idx_minor]
    if spec.scales_with_density:
        scaling = scaling * (0.01 * play / tlay)
        if spec.idx_scaling > 0:
            # Guard degenerate layers (col_dry == 0, e.g. duplicated
            # pressure levels at the model top) against 0/0 -> NaN.
            vmr_fact = 1.0 / jnp.maximum(col_gas[:, :, 0],
                                         config.tiny(dtype))
            dry_fact = 1.0 / (1.0 + col_gas[:, :, kd.idx_h2o] * vmr_fact)
            sx = col_gas[:, :, spec.idx_scaling] * vmr_fact * dry_fact
            scaling = scaling * ((1.0 - sx) if spec.scale_by_complement
                                 else sx)
    return scaling * maskf


def _minor_prep(kd: KDist, interp: Interp, play, tlay, col_gas,
                order: str = "cm"):
    """Assemble the Pallas minor-pass inputs across both atmospheres and
    all intervals: the kernel's "g" axis is the concatenated contributor
    axis; je / weights / scaling broadcast per interval (contributors of
    one interval share the interval's flavor; the atmosphere mask is
    folded into the scaling).  Returns None when the k-distribution has no
    minor specs, else (tbl, rows, Mf, Ms, sc, ordered, CT)."""
    dtype = play.dtype
    C, L = interp.tropo.shape
    N = C * L
    F = kd.nflav
    atmos = [(kd.minor_lower, kd.kminor_lower_trows, interp.tropo),
             (kd.minor_upper, kd.kminor_upper_trows,
              jnp.logical_not(interp.tropo))]
    cols, scal_cols = [], []
    ordered = []  # (spec,) in lower-then-upper order
    for specs, kminor_trows, mask in atmos:
        maskf = mask.astype(dtype)
        for spec in specs:
            ng = spec.gpt_end - spec.gpt_start
            cols.append(jax.lax.slice_in_dim(
                kminor_trows, spec.kminor_start,
                spec.kminor_start + ng, axis=2))
            scal_cols.append(_spec_scaling(kd, spec, maskf, play, tlay,
                                           col_gas))
            ordered.append(spec)
    if not ordered:
        return None

    tbl = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=2)
    CT = sum(sp.gpt_end - sp.gpt_start for sp in ordered)

    # Per-contributor placement matrices (one-hot; a single nonzero unit
    # product per output stays exact): flavors -> CT for je / fminor,
    # interval -> CT for the scaling.
    Mf = np.zeros((F, CT), np.float32)
    Ms = np.zeros((len(ordered), CT), np.float32)
    off = 0
    for k_s, spec in enumerate(ordered):
        ng = spec.gpt_end - spec.gpt_start
        Mf[spec.flavor, off:off + ng] = 1.0
        Ms[k_s, off:off + ng] = 1.0
        off += ng
    it = np.arange(2, dtype=np.int32)[None, None, :]
    rows = _cells(interp.jtemp0[:, :, None] + it, order).astype(jnp.int32)
    sc = _cells(jnp.stack(scal_cols, axis=2), order)
    return tbl, rows, Mf, Ms, sc, ordered, CT


def _minor_stitch(tau, upd_all, ordered):
    """Add the per-contributor minor planes into ``tau``.

    Contributions assemble into overlap "layers" of disjoint g-ranges,
    stitched with zero fills and added as whole (C, L, G) planes: per-spec
    dynamic_update_slice chains cost a full tau copy per interval on TPU.
    Greedy first-fit in spec order keeps the per-g-point addition order
    identical to the sequential reference loop (lower and upper
    atmospheres are disjoint per cell, so merging their layers is
    exact).  Shape-agnostic over the leading axes: tau (..., G),
    upd_all (..., CT) — serves both the (C, L, G) and the flat (N, G)
    layer-major interchange."""
    lead, G = tau.shape[:-1], tau.shape[-1]
    ax = tau.ndim - 1
    dtype = tau.dtype
    layers = []  # list of list[(g0, g1, upd)]

    def place(spec, upd):
        for layer in layers:
            if all(spec.gpt_end <= g0 or spec.gpt_start >= g1
                   for g0, g1, _ in layer):
                layer.append((spec.gpt_start, spec.gpt_end, upd))
                return
        layers.append([(spec.gpt_start, spec.gpt_end, upd)])

    off = 0
    for spec in ordered:
        ng = spec.gpt_end - spec.gpt_start
        place(spec, jax.lax.slice_in_dim(upd_all, off, off + ng, axis=ax))
        off += ng

    for layer in layers:
        pieces = []
        at = 0
        for g0, g1, upd in sorted(layer, key=lambda t: t[0]):
            if g0 > at:
                pieces.append(jnp.zeros(lead + (g0 - at,), dtype))
            pieces.append(upd)
            at = g1
        if at < G:
            pieces.append(jnp.zeros(lead + (G - at,), dtype))
        plane = pieces[0] if len(pieces) == 1 else jnp.concatenate(
            pieces, axis=ax)
        tau = tau + plane
    return tau


def tau_minor(kd: KDist, interp: Interp, play, tlay, col_gas, tau,
              cellw=None):
    """Minor-gas optical depth, both atmospheres; adds into ``tau``.

    Trace-time unrolled over the static MinorSpec tuples (the TPU-friendly
    replacement for gas_optical_depths_minor_kernel :458-579).  Each
    interval is one 2-row gather from the de-pre-expanded
    ``kminor_*_rows`` table ((neta-1)*ntemp rows of (2, ncont)).
    """
    dtype = play.dtype
    ntemp = kd.ntemp
    C, L, G = tau.shape

    use_pallas = config.use_pallas() and dtype == jnp.float32
    F = kd.nflav
    jt = interp.jtemp0  # (ncol, nlay)

    if use_pallas:
        prep = _minor_prep(kd, interp, play, tlay, col_gas)
        if prep is None:
            return tau
        tbl, rows, Mf, Ms, sc, ordered, CT = prep
        N = C * L
        if cellw is not None:
            # In-kernel resolve: the SAME per-cell V works with the
            # contributor-placement mask duplicated over both tropo halves
            # (x*tf + x*(1-tf) = x exactly, tf in {0, 1}); the per-interval
            # scaling folds in through the (sc, Msc) side matmul — neither
            # the (N, CT) weight planes nor the scaling plane ever touch
            # HBM.
            from .pallas import interp_cellw_multi

            M2m = jnp.asarray(np.concatenate([Mf, Mf], axis=0), dtype)
            (upd_flat,) = interp_cellw_multi(
                [tbl], [rows], cellw.V, M2m, None,
                metas=(((0, 1), False, False, 0, True),), neta=kd.neta,
                sc=sc, msc=jnp.asarray(Ms, dtype), **_cellw_opts())
            upd_all = upd_flat.reshape(C, L, CT)
        else:
            from .pallas import interp_rows_pallas, kernel_opts

            Mfj = jnp.asarray(Mf, dtype)

            def flav_plane(x_clF):   # (C, L, F) -> (N, CT)
                return jnp.matmul(x_clF, Mfj,
                                  precision="highest").reshape(N, CT)

            # One-hot matmuls of exact small ints are exact -> keep f32
            # (the kernel compares eta indices in the table dtype).
            jes2 = tuple(
                flav_plane(interp.jeta0[:, :, i * F:(i + 1) * F].astype(dtype))
                for i in range(2))
            fms4 = tuple(flav_plane(interp.fminor[:, :, c * F:(c + 1) * F])
                         for c in range(4))
            scal_plane = jnp.matmul(
                sc, jnp.asarray(Ms, dtype), precision="highest")

            ltau_all = interp_rows_pallas(
                tbl, rows, jes2, fms4,
                neta=kd.neta, corner_itemp=(0, 1), **kernel_opts())
            upd_all = (ltau_all * scal_plane).reshape(C, L, CT)
        return _minor_stitch(tau, upd_all, ordered)

    # Pure-XLA fallback: per-spec HBM row gathers.
    ordered_x, upds = [], []
    for specs, kminor_rows, mask in [
            (kd.minor_lower, kd.kminor_lower_rows, interp.tropo),
            (kd.minor_upper, kd.kminor_upper_rows,
             jnp.logical_not(interp.tropo))]:
        maskf = mask.astype(dtype)
        for spec in specs:
            scaling = _spec_scaling(kd, spec, maskf, play, tlay, col_gas)

            ng = spec.gpt_end - spec.gpt_start
            tbl = jax.lax.slice_in_dim(kminor_rows, spec.kminor_start,
                                       spec.kminor_start + ng, axis=2)
            # rows r_i = jeta0[f, i]*ntemp + jtemp0 + i
            f = spec.flavor
            je = jnp.stack([interp.jeta0[:, :, f],
                            interp.jeta0[:, :, F + f]], axis=-1)
            it = np.arange(2, dtype=np.int32)[None, None, :]
            rows = je * ntemp + jt[:, :, None] + it   # (ncol, nlay, 2)
            slab = jnp.take(tbl, rows, axis=0)        # (C,L,2i,2de,ng)

            fm = interp.fminor                        # flat (i*2+de)*F+f
            ltau = (fm[:, :, 0 * F + f, None] * slab[:, :, 0, 0]
                    + fm[:, :, 1 * F + f, None] * slab[:, :, 0, 1]) + (
                   fm[:, :, 2 * F + f, None] * slab[:, :, 1, 0]
                    + fm[:, :, 3 * F + f, None] * slab[:, :, 1, 1])
            ordered_x.append(spec)
            upds.append(ltau * scaling[:, :, None])
    if not ordered_x:
        return tau
    upd_all = jnp.concatenate(upds, axis=2) if len(upds) > 1 else upds[0]
    return _minor_stitch(tau, upd_all, ordered_x)


def merge_minor_enabled() -> bool:
    """Whether the cellw path folds the minor pass into the main interp
    pass (one kernel epoch per chunk instead of two — the 'fewer passes'
    lever from PERF.md).  Env > persisted autotune winner > default on."""
    import os

    env = os.environ.get("RTE_RRTMGP_PALLAS_MERGE_MINOR")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        from ..utils import tuner

        t = tuner.best_kernel_opts() or {}
        if t.get("merge_minor") is not None:
            return bool(t["merge_minor"])
    except Exception:
        pass
    return True


def dup2c_enabled() -> bool:
    """Whether the cellw LW pass lane-merges the kmajor|planck table pair
    (ONE 32x2G slice per pressure instead of two 32xG slices — the
    per-cell dynamic-slice count, the dominant per-cell cost, drops by
    a third for the LW pass; in-kernel lane split avoids the plane-path
    dup2's output-split copies).  Env > persisted autotune winner >
    default off until measured on hardware."""
    import os

    env = os.environ.get("RTE_RRTMGP_PALLAS_DUP2C")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        from ..utils import tuner

        t = tuner.best_kernel_opts() or {}
        if t.get("dup2c") is not None:
            return bool(t["dup2c"])
    except Exception:
        pass
    return False


def mfold_enabled() -> bool:
    """Whether the merged cellw pass folds the minor-contributor result
    into the major tau output IN-KERNEL (one whole-block one-hot
    placement matmul) instead of writing the (N, CT) plane and stitching
    it in XLA (_minor_stitch) — the contributor plane and the
    zero-filled stitch planes never touch HBM.  Env > persisted autotune
    winner > default off until measured on hardware."""
    import os

    env = os.environ.get("RTE_RRTMGP_PALLAS_MFOLD")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        from ..utils import tuner

        t = tuner.best_kernel_opts() or {}
        if t.get("mfold") is not None:
            return bool(t["mfold"])
    except Exception:
        pass
    return False


def _minor_place_matrix(ordered, CT, G):
    """(CT, G) one-hot placement: contributor row ct -> its g-point
    column (the static form of _minor_stitch's layered zero-fill)."""
    M = np.zeros((CT, G), np.float32)
    off = 0
    for spec in ordered:
        ng = spec.gpt_end - spec.gpt_start
        M[off:off + ng, spec.gpt_start:spec.gpt_end] = np.eye(
            ng, dtype=np.float32)
        off += ng
    return M


def tau_majmin_and_pfrac(kd: KDist, interp: Interp, play, tlay, col_gas,
                         resolves=None, g0=0, cellw=None):
    """kmajor + planck-fraction + MINOR in one Pallas pass (cellw mode,
    per-op mask matrices): the per-cell loop runs ONCE per chunk instead
    of twice, sharing the V load and loop overhead.  Falls back to the
    two-pass form (fused major+pfrac, then minor) when the merge or the
    cellw pack is unavailable.  Returns (tau_with_minor, pfrac)."""
    dtype = kd.kmajor_rows.dtype
    flat = cellw is not None and cellw.order == "lm"
    if (cellw is not None and merge_minor_enabled()
            and config.use_pallas() and dtype == jnp.float32):
        prep = _minor_prep(kd, interp, play, tlay, col_gas,
                           order=cellw.order)
        if prep is not None:
            from .pallas import interp_cellw_multi

            tbl_m, rows_m, Mf, Ms, sc, ordered, CT = prep
            C, L = interp.tropo.shape
            G = kd.kmajor_rows.shape[2]
            M2 = jnp.asarray(cellw.masks2[:, g0:g0 + G], dtype)
            M2m = jnp.asarray(np.concatenate([Mf, Mf], axis=0), dtype)
            mf = mfold_enabled()
            mkw = (dict(mplace=jnp.asarray(
                _minor_place_matrix(ordered, CT, G), dtype)) if mf else {})
            if dup2c_enabled():
                # Lane-merged kmajor|planck (shared rows/weights/fp): one
                # dup2 op with two outputs — per-cell slice count for the
                # pair halves (see interp_kernel._kernel_cellw).
                tbl2 = jnp.concatenate([kd.kmajor_rows, kd.planck_rows],
                                       axis=2)
                outs = interp_cellw_multi(
                    [tbl2, tbl_m], [cellw.rows, rows_m], cellw.V,
                    [M2, M2m], cellw.fp,
                    metas=(((0, 0, 1, 1), True, True, 0, True, True),
                           ((0, 1), False, False, 1, True)),
                    neta=kd.neta, sc=sc, msc=jnp.asarray(Ms, dtype),
                    sc_ops=(1,), mfold=(1, 0) if mf else None, **mkw,
                    **_cellw_opts())
            else:
                outs = interp_cellw_multi(
                    [kd.kmajor_rows, kd.planck_rows, tbl_m],
                    [cellw.rows, cellw.rows, rows_m], cellw.V, [M2, M2m],
                    cellw.fp,
                    metas=(((0, 0, 1, 1), True, True, 0, True),
                           ((0, 0, 1, 1), True, False, 0, True),
                           ((0, 1), False, False, 1, True)),
                    neta=kd.neta, sc=sc, msc=jnp.asarray(Ms, dtype),
                    sc_ops=(2,), mfold=(2, 0) if mf else None, **mkw,
                    **_cellw_opts())
            tau, pfrac = outs[0], outs[1]
            upd = None if mf else outs[2]   # mfold: stitched in-kernel
            if flat:
                # Layer-major interchange: stay (N, G) — the stitch is a
                # lane op and the layer-grid solvers consume (N, G)
                # directly (no (C, L, G) materialization, no retiling).
                return (tau if upd is None
                        else _minor_stitch(tau, upd, ordered)), pfrac
            tau = tau.reshape(C, L, G)
            if upd is not None:
                tau = _minor_stitch(tau, upd.reshape(C, L, CT), ordered)
            return tau, pfrac.reshape(C, L, G)
        if flat:
            # Chunk with no minor intervals: the fused major+planck pass
            # alone (flat-aware) is exact.
            return tau_major_and_pfrac(kd, interp, resolves, g0,
                                       cellw=cellw)
    assert not flat, "layer-major interchange requires the merged " \
        "cellw Pallas path (merge_minor + cellw on)"
    tau, pfrac = tau_major_and_pfrac(kd, interp, resolves, g0, cellw=cellw)
    tau = tau_minor(kd, interp, play, tlay, col_gas, tau, cellw=cellw)
    return tau, pfrac


def tau_majmin_and_rayleigh(kd: KDist, interp: Interp, play, tlay, col_gas,
                            col_dry, resolves=None, g0=0, cellw=None):
    """kmajor + krayl + MINOR in one Pallas pass (see
    :func:`tau_majmin_and_pfrac`).  Returns (tau_abs_with_minor,
    tau_rayleigh)."""
    dtype = kd.kmajor_rows.dtype
    flat = cellw is not None and cellw.order == "lm"
    if (cellw is not None and merge_minor_enabled()
            and config.use_pallas() and dtype == jnp.float32):
        prep = _minor_prep(kd, interp, play, tlay, col_gas,
                           order=cellw.order)
        if prep is not None:
            from .pallas import interp_cellw_multi

            tbl_m, rows_m, Mf, Ms, sc, ordered, CT = prep
            C, L = interp.tropo.shape
            G = kd.kmajor_rows.shape[2]
            ntemp = kd.ntemp
            it = np.arange(2, dtype=np.int32)[None, None, :]
            rows_ray = _cells(
                (interp.itropo01 * ntemp + interp.jtemp0)[:, :, None] + it,
                cellw.order).astype(jnp.int32)
            M2 = jnp.asarray(cellw.masks2[:, g0:g0 + G], dtype)
            M2m = jnp.asarray(np.concatenate([Mf, Mf], axis=0), dtype)
            mf = mfold_enabled()
            mkw = (dict(mplace=jnp.asarray(
                _minor_place_matrix(ordered, CT, G), dtype)) if mf else {})
            outs = interp_cellw_multi(
                [kd.kmajor_rows, kd.krayl_rows, tbl_m],
                [cellw.rows, rows_ray, rows_m], cellw.V, [M2, M2m],
                cellw.fp,
                metas=(((0, 0, 1, 1), True, True, 0, True),
                       ((0, 1), False, False, 0, True),
                       ((0, 1), False, False, 1, True)),
                neta=kd.neta, sc=sc, msc=jnp.asarray(Ms, dtype),
                sc_ops=(2,), mfold=(2, 0) if mf else None, **mkw,
                **_cellw_opts())
            tau, kloc = outs[0], outs[1]
            upd = None if mf else outs[2]   # mfold: stitched in-kernel
            fac_cl = col_gas[:, :, kd.idx_h2o] + col_dry       # (C, L)
            if flat:
                if upd is not None:
                    tau = _minor_stitch(tau, upd, ordered)
                return tau, kloc * _cells(fac_cl, "lm")[:, None]
            tau = tau.reshape(C, L, G)
            if upd is not None:
                tau = _minor_stitch(tau, upd.reshape(C, L, CT), ordered)
            return tau, kloc.reshape(C, L, G) * fac_cl[:, :, None]
        if flat:
            # Chunk with no minor intervals: fused major+krayl alone.
            return tau_major_and_rayleigh(kd, interp, col_gas, col_dry,
                                          resolves, g0, cellw=cellw)
    assert not flat, "layer-major interchange requires the merged " \
        "cellw Pallas path (merge_minor + cellw on)"
    tau, ray = tau_major_and_rayleigh(kd, interp, col_gas, col_dry,
                                      resolves, g0, cellw=cellw)
    tau = tau_minor(kd, interp, play, tlay, col_gas, tau, cellw=cellw)
    return tau, ray


def tau_rayleigh(kd: KDist, interp: Interp, col_gas, col_dry, cellw=None,
                 g0=0):
    """Rayleigh scattering optical depth (compute_tau_rayleigh_kernel
    :674-718): 2-row gathers on krayl_rows (itropo*ntemp + jtemp rows)."""
    dtype = kd.krayl_rows.dtype
    neta, ntemp = kd.neta, kd.ntemp
    F = kd.nflav
    masks = _flavor_masks(kd, dtype)
    tropo = interp.tropo

    it = np.arange(2, dtype=np.int32)[None, None, :]
    rows = (interp.itropo01 * ntemp + interp.jtemp0)[:, :, None] + it

    fac = (col_gas[:, :, kd.idx_h2o] + col_dry)[:, :, None]

    if config.use_pallas() and dtype == jnp.float32:

        from .pallas import interp_rows_pallas, kernel_opts

        C, L = tropo.shape
        N = C * L
        G = kd.krayl_rows.shape[2]
        if cellw is not None:
            from .pallas import interp_cellw_multi

            M2 = jnp.asarray(cellw.masks2[:, g0:g0 + G], dtype)
            (kloc,) = interp_cellw_multi(
                [kd.krayl_rows], [rows.reshape(N, 2).astype(jnp.int32)],
                cellw.V, M2, None, metas=(((0, 1), False, False),),
                neta=neta, **_cellw_opts())
            return kloc.reshape(C, L, G) * fac
        jes, fms = _kernel_resolves(kd, interp, masks)
        kloc = interp_rows_pallas(
            kd.krayl_rows, rows.reshape(N, 2).astype(jnp.int32),
            jes, fms, neta=neta, corner_itemp=(0, 1),
            **kernel_opts()).reshape(C, L, G)
        return kloc * fac

    slab = jnp.take(kd.krayl_rows, rows, axis=0)      # (C,L,2,E,G)

    e_iota = jnp.arange(neta, dtype=jnp.int32)[None, None, :, None]
    kloc = 0.0
    for i in range(2):
        je = _resolve_flav_int(interp.jeta0[:, :, i * F:(i + 1) * F], kd, tropo)
        je_b = je[:, :, None, :]
        w0 = _resolve_flav(interp.fminor[:, :, (i * 2) * F:(i * 2 + 1) * F],
                           masks, tropo)
        w1 = _resolve_flav(interp.fminor[:, :, (i * 2 + 1) * F:(i * 2 + 2) * F],
                           masks, tropo)
        w = (w0[:, :, None, :] * (e_iota == je_b).astype(dtype)
             + w1[:, :, None, :] * (e_iota == je_b + 1).astype(dtype))
        kloc = kloc + jnp.sum(w * slab[:, :, i], axis=2)

    return kloc * fac


def combine_abs_and_rayleigh(tau_abs, tau_ray):
    """combine_abs_and_rayleigh_kernel (:721-746): tau, ssa, g."""
    eps = config.eps(tau_abs.dtype)
    tau = tau_abs + tau_ray
    ssa = jnp.where(tau > 2.0 * eps, tau_ray / jnp.where(tau == 0.0, 1.0, tau), 0.0)
    return tau, ssa, jnp.zeros_like(tau)


def _interp1d_planck(temp, kd: KDist):
    """interpolate1D over totplnk (gas_optics_rrtmgp_kernels.cu:1-13),
    returning band Planck radiance expanded to g-points: temp.shape + (ngpt,).

    The per-cell temperature-bin lookup is two exact one-hot MXU matmuls
    over the (nT, nbnd) table (narrow-row gathers at (ncol, nlay) index
    width cost ~0.45 ms each on TPU; a single nonzero unit product per
    output keeps the matmul lookup exact, and lo/hi stay separate so
    ``lo + frac*(hi - lo)`` matches the oracle bit-for-bit)."""
    nT = kd.totplnk.shape[0]
    dtype = temp.dtype
    val0 = (temp - kd.temp_ref_min) / kd.totplnk_delta
    ival = val0.astype(jnp.int32)
    frac = val0 - ival.astype(dtype)
    idx = jnp.clip(ival + 1, 1, nT - 1)

    shape = temp.shape
    mm = lambda sel: jnp.matmul(sel, kd.totplnk,
                                precision="highest").reshape(shape + (-1,))
    lo = mm(onehot_rows(idx - 1, nT, dtype))
    hi = mm(onehot_rows(idx, nT, dtype))
    b = lo + frac[..., None] * (hi - lo)   # (..., nbnd)
    return expand_bands_to_gpt(b, kd.gpt2band)


def planck_source(kd: KDist, interp: Interp, tlay, tlev, tsfc,
                  sfc_lay: int, pfrac=None) -> SourceFuncLW:
    """Planck_source_kernel (:196-314).  ``sfc_lay`` is the 0-based layer
    adjacent to the surface (static).  ``pfrac`` may be precomputed by the
    fused :func:`tau_major_and_pfrac` pass."""
    if pfrac is None:
        pfrac = _interp3d_rows(kd, kd.planck_rows, interp,
                               scale_by_colmix=False)

    lay_src = pfrac * _interp1d_planck(tlay, kd)

    blev = _interp1d_planck(tlev, kd)  # (ncol, nlay+1, ngpt)
    nlay = tlay.shape[1]
    lev_inner = jnp.sqrt(pfrac[:, 1:] * pfrac[:, :-1]) * blev[:, 1:nlay]
    lev_src = jnp.concatenate([
        (pfrac[:, :1] * blev[:, :1]),
        lev_inner,
        (pfrac[:, nlay - 1:nlay] * blev[:, nlay:nlay + 1]),
    ], axis=1)

    bsfc = _interp1d_planck(tsfc, kd)                       # (ncol, ngpt)
    bsfc2 = _interp1d_planck(tsfc + config.DELTA_TSURF, kd)
    sfc_src = pfrac[:, sfc_lay] * bsfc
    sfc_src_jac = pfrac[:, sfc_lay] * (bsfc2 - bsfc)
    return SourceFuncLW(sfc_src=sfc_src, sfc_src_jac=sfc_src_jac,
                        lay_src=lay_src, lev_src=lev_src)


def planck_source_lm(kd: KDist, tlay, tlev, tsfc, sfc_lay: int, pfrac_lm,
                     ncol: int) -> SourceFuncLW:
    """:func:`planck_source` on the LAYER-MAJOR interchange: ``pfrac_lm``
    is (nlay*ncol, G) with cell (c, l) at row l*ncol + c; ``tlay``/``tlev``
    keep their public (ncol, nlay[+1]) shapes.

    The across-interface geometric mean becomes a ROW-SHIFT by ncol (the
    vertical neighbor of a layer-major row is ncol rows away), so every
    output is pure 2D lane/row arithmetic with no (C, L, G)
    materialization.  ``lev_src`` is returned as the PIECES
    (lev0 (ncol, G), inner ((nlay-1)*ncol, G), lev_last (ncol, G)) that
    the layer-grid LW solver consumes directly — concatenating them into
    one (nlev*ncol, G) plane measured 0.64 ms per chunk."""
    C = ncol
    nlay = tlay.shape[1]
    lay_src = pfrac_lm * _interp1d_planck(_cells(tlay, "lm"), kd)

    blev = _interp1d_planck(_cells(tlev, "lm"), kd)    # ((nlay+1)*C, G)
    lev_inner = jnp.sqrt(pfrac_lm[C:] * pfrac_lm[:-C]) \
        * blev[C:nlay * C]
    lev_src = (pfrac_lm[:C] * blev[:C],
               lev_inner,
               pfrac_lm[(nlay - 1) * C:] * blev[nlay * C:])

    bsfc = _interp1d_planck(tsfc, kd)                       # (ncol, G)
    bsfc2 = _interp1d_planck(tsfc + config.DELTA_TSURF, kd)
    pf_sfc = jax.lax.slice_in_dim(pfrac_lm, sfc_lay * C, (sfc_lay + 1) * C,
                                  axis=0)
    sfc_src = pf_sfc * bsfc
    sfc_src_jac = pf_sfc * (bsfc2 - bsfc)
    return SourceFuncLW(sfc_src=sfc_src, sfc_src_jac=sfc_src_jac,
                        lay_src=lay_src, lev_src=lev_src)


def build_col_gas(vmr, col_dry):
    """(ncol, nlay, ngas) vmr + (ncol, nlay) col_dry -> col_gas with the dry
    column at index 0 (the reference's offset-indexed array,
    ``src/Gas_optics_rrtmgp.cpp:1152-1160``)."""
    return jnp.concatenate(
        [col_dry[:, :, None], vmr * col_dry[:, :, None]], axis=2)


def get_col_dry(vmr_h2o, plev):
    """Hydrostatic dry-air column (src/Gas_optics_rrtmgp.cpp:764-792)."""
    delta_plev = jnp.abs(plev[:, :-1] - plev[:, 1:])
    m_air = (config.M_DRY + config.M_H2O * vmr_h2o) / (1.0 + vmr_h2o)
    col = 10.0 * delta_plev * config.AVOGADRO / (1000.0 * m_air * 100.0 * config.GRAV)
    return col / (1.0 + vmr_h2o)


# ---------------------------------------------------------------------------
# Top-level gas optics (the reference's Gas_optics_rrtmgp::gas_optics).
# ---------------------------------------------------------------------------

def gas_optics_lw(kd: KDist, play, plev, tlay, tlev, tsfc, vmr, col_dry,
                  sfc_lay: int):
    """LW overload (src/Gas_optics_rrtmgp.cpp:796-849): returns
    (OpticalProps1scl, SourceFuncLW)."""
    col_gas = build_col_gas(vmr, col_dry)
    interp = interpolation(kd, play, tlay, col_gas)
    tau = tau_major(kd, interp)
    tau = tau_minor(kd, interp, play, tlay, col_gas, tau)
    sources = planck_source(kd, interp, tlay, tlev, tsfc, sfc_lay)
    return OpticalProps1scl(tau=tau), sources


def gas_optics_sw(kd: KDist, play, plev, tlay, vmr, col_dry):
    """SW overload (src/Gas_optics_rrtmgp.cpp:853-898): returns
    (OpticalProps2str, toa_src (ncol, ngpt))."""
    col_gas = build_col_gas(vmr, col_dry)
    interp = interpolation(kd, play, tlay, col_gas)
    tau_abs = tau_major(kd, interp)
    tau_abs = tau_minor(kd, interp, play, tlay, col_gas, tau_abs)
    tau_ray = tau_rayleigh(kd, interp, col_gas, col_dry)
    tau, ssa, g = combine_abs_and_rayleigh(tau_abs, tau_ray)
    ncol = play.shape[0]
    toa_src = jnp.broadcast_to(kd.solar_source[None, :], (ncol, kd.ngpt))
    return OpticalProps2str(tau=tau, ssa=ssa, g=g), toa_src
