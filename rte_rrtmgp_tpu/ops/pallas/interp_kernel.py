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

# The resident-table calls run within ~2% of Mosaic's default 16 MB
# scoped-VMEM check at production shapes (measured: 16.50M at 2048x72,
# gpt_chunk 128) — small build variations (layer-major operand layouts,
# block 512) tip them over.  Raise the cap; the chip has 128 MB VMEM and
# the block sizing targets stay well below this.
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=48 * 2**20)


def kernel_opts() -> dict:
    """Tunable kernel knobs, read at trace time: environment first (the
    autotuner sweeps candidates in separate subprocesses —
    tuning/tune_radiation.py), then the persisted autotune winner for
    this device kind (tuning/tuned_defaults.json via utils/tuner.py),
    then built-in defaults."""
    import os

    tuned = {}
    try:
        from ...utils import tuner

        tuned = tuner.best_kernel_opts() or {}
    except Exception:
        pass
    return dict(
        block=int(os.environ.get("RTE_RRTMGP_PALLAS_BLOCK",
                                 tuned.get("block") or 256)),
        unroll=int(os.environ.get("RTE_RRTMGP_PALLAS_UNROLL",
                                  tuned.get("unroll") or 4)),
        vec=os.environ.get("RTE_RRTMGP_PALLAS_VEC", "0")
        not in ("0", "false", "off"),
    )


def wsel_enabled() -> bool:
    """Select-form eta weight build (A/B knob RTE_RRTMGP_PALLAS_WSEL):
    w = where(e-je == 0, fm0, where(e-je == 1, fm1, 0)) — 5 vector ops per
    temperature pair instead of the 7-op compare/cast/mad form.  Values
    are BIT-IDENTICAL (selects of the same fm rows that the one-hot
    multiply-add produced: fm0*1 + fm1*0 == fm0 exactly).  Default ON:
    measured 35.54 vs 37.29 ms/step on the v5e headline bench (PERF.md
    round 5)."""
    import os

    return os.environ.get("RTE_RRTMGP_PALLAS_WSEL", "1") \
        not in ("0", "false", "off")


def pairc_enabled() -> bool:
    """Half-slab paired table layout for the cellw kernels (A/B knob
    RTE_RRTMGP_PALLAS_PAIRC): the eta contraction runs on (8, G)
    half-slabs — fm0*slab[:8] + fm1*slab[8:] selected by one 8-row
    one-hot — instead of a 16-row weight plane, with the slice count
    unchanged (unlike the refuted plane-path 'paired' mode).  Agrees
    with the plain layout to <= ~1 ulp (the two-term combine contracts
    to an FMA — see _kernel_cellw).  Env > persisted autotune winner >
    default ON: measured 36.81 vs 39.85 ms/step at 2048x72 and 277.51 vs
    289.48 at 4096x256 on the v5e (PERF.md round 5)."""
    import os

    env = os.environ.get("RTE_RRTMGP_PALLAS_PAIRC")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        from ...utils import tuner

        t = tuner.best_kernel_opts() or {}
        if t.get("pairc") is not None:
            return bool(t["pairc"])
    except Exception:
        pass
    return True


def _kernel(corner_itemp, has_fp, has_cm, rows_ref, *refs):
    nc = len(corner_itemp)
    k = 0
    fp_ref = None
    if has_fp:
        fp_ref = refs[0]
        k = 1
    je_refs = refs[k:k + 2]
    fm_refs = refs[k + 2:k + 6]       # fminor planes, (itemp*2 + deta) order
    k += 6
    cm_refs = None
    if has_cm:
        cm_refs = refs[k:k + 2]
        k += 2
    table_ref = refs[k]
    out_ref = refs[k + 1]
    B, G = out_ref.shape
    # eta-index planes may be int32 or exact-integer float (the builders
    # keep the one-hot-matmul output dtype to skip full-plane casts);
    # Mosaic's iota is integer-only, so cast the loop-invariant plane once.
    e_iota = jax.lax.broadcasted_iota(
        jnp.int32, (ETA_STRIDE, G), 0).astype(je_refs[0].dtype)

    def body(b, _):
        fp = fp_ref[b, 0] if has_fp else None
        acc = jnp.zeros((1, G), out_ref.dtype)
        # The eta weight matrix depends only on the temperature pair: build
        # it once per pair and reuse across the pressure corners.
        w_i = [None, None]
        for c, i in enumerate(corner_itemp):   # corner -> temperature pair
            if w_i[i] is None:
                je = je_refs[i][b, :][None, :]             # (1, G)
                sel0 = (e_iota == je).astype(out_ref.dtype)
                sel1 = (e_iota == je + 1).astype(out_ref.dtype)
                w_i[i] = (fm_refs[2 * i][b, :][None, :] * sel0
                          + fm_refs[2 * i + 1][b, :][None, :] * sel1)
            r = rows_ref[b, c] * ETA_STRIDE
            slab = table_ref[pl.ds(r, ETA_STRIDE), :]      # (16, G)
            pair = jnp.sum(w_i[i] * slab, axis=0, keepdims=True)
            if has_fp:
                # 4-corner layout (i0p0, i0p1, i1p0, i1p1): odd corners get
                # the fpress weight, even corners (1 - fpress).
                pair = pair * jnp.where(c % 2 == 1, fp, 1.0 - fp)
            if has_cm:
                pair = pair * cm_refs[i][b, :][None, :]
            acc = acc + pair
        out_ref[b, :] = acc[0]
        return 0

    jax.lax.fori_loop(0, B, body, 0)


def _kernel_multi_vec(metas, rows_ref, *refs):
    """Vectorized multi-op variant: VC cells per loop iteration.

    The scalar kernel's per-cell work is (1, G)/(16, G) ops — 1/8th or
    2-sublane VPU utilization and ~147k fori_loop iterations per call,
    which makes the op loop-overhead-bound rather than bandwidth-bound.
    Here VC=8 cells are processed per iteration: the per-cell (16, G) eta
    slabs are packed cell-major into a (VC*16, G) scratch, the per-cell
    weight planes are expanded to (VC*16, G) by an exact one-hot MXU
    matmul (P[16c+e, c] = 1), and the per-cell eta contraction is ONE
    one-hot MXU matmul (S @ prod, S[c, 16c+e] = 1 — exact: unit weights,
    16-term f32 sums) per op instead of per-corner (1, G) reductions.
    Loop count drops 8x and every VPU op runs at full sublane width."""
    VC = 8
    any_fp = any(m[1] for m in metas)
    k = 0
    fp_ref = None
    if any_fp:
        fp_ref = refs[0]
        k = 1
    je_refs = refs[k:k + 2]
    fm_refs = refs[k + 2:k + 6]
    k += 6
    cm_refs = []
    for m in metas:
        if m[2]:
            cm_refs.append(refs[k:k + 2])
            k += 2
        else:
            cm_refs.append(None)
    n_t = len(metas)
    tables = refs[k:k + n_t]
    outs = refs[k + n_t:k + 2 * n_t]
    s0_ref, s1_ref = refs[k + 2 * n_t:k + 2 * n_t + 2]
    B = outs[0].shape[0]
    G = outs[0].shape[1]
    dtype = outs[0].dtype
    R = VC * ETA_STRIDE

    # Loop-invariant index planes: eta position within each 16-row block,
    # the cell-expansion one-hot (row 16c+e <- cell c) and its transpose
    # (the per-cell sum) for the MXU expansion/contraction matmuls.
    e_mod = (jax.lax.broadcasted_iota(jnp.int32, (R, G), 0)
             % ETA_STRIDE).astype(dtype)
    blk = jax.lax.broadcasted_iota(jnp.int32, (VC, R), 1) // ETA_STRIDE
    cell = jax.lax.broadcasted_iota(jnp.int32, (VC, R), 0)
    s_sum = (blk == cell).astype(dtype)                    # (VC, VC*16)
    p_exp = s_sum.T                                        # (VC*16, VC)
    dn = (((1,), (0,)), ((), ()))

    def rep(a):
        """(VC, W) -> (VC*16, W): rows repeated 16x consecutively, as an
        exact one-hot matmul (one unit-weight product per output)."""
        return jax.lax.dot_general(p_exp, a.astype(dtype), dn,
                                   preferred_element_type=dtype)

    def body(gi, _):
        b0 = gi * VC
        fpr = rep(fp_ref[pl.ds(b0, VC), :]) if any_fp else None  # (R, 1)
        w_i = [None, None]

        def weights(i):
            if w_i[i] is None:
                jer = rep(je_refs[i][pl.ds(b0, VC), :])   # exact small ints
                sel0 = (e_mod == jer).astype(dtype)
                sel1 = (e_mod == jer + 1.0).astype(dtype)
                w_i[i] = (rep(fm_refs[2 * i][pl.ds(b0, VC), :]) * sel0
                          + rep(fm_refs[2 * i + 1][pl.ds(b0, VC), :]) * sel1)
            return w_i[i]

        col = 0
        for iop, (corner_itemp, has_fp, has_cm) in enumerate(metas):
            nc = len(corner_itemp)
            acc = jnp.zeros((R, G), dtype)
            if has_fp:
                # (i0p0, i0p1, i1p0, i1p1): merge the pressure pair first.
                for i in (0, 1):
                    for c in range(VC):
                        r0 = rows_ref[b0 + c, col + 2 * i] * ETA_STRIDE
                        r1 = rows_ref[b0 + c, col + 2 * i + 1] * ETA_STRIDE
                        s0_ref[pl.ds(c * ETA_STRIDE, ETA_STRIDE), :] = \
                            tables[iop][pl.ds(r0, ETA_STRIDE), :]
                        s1_ref[pl.ds(c * ETA_STRIDE, ETA_STRIDE), :] = \
                            tables[iop][pl.ds(r1, ETA_STRIDE), :]
                    slab = (1.0 - fpr) * s0_ref[...] + fpr * s1_ref[...]
                    pair = weights(i) * slab
                    if has_cm:
                        pair = pair * rep(cm_refs[iop][i][pl.ds(b0, VC), :])
                    acc = acc + pair
            else:
                for c_i, i in enumerate(corner_itemp):
                    for c in range(VC):
                        r = rows_ref[b0 + c, col + c_i] * ETA_STRIDE
                        s0_ref[pl.ds(c * ETA_STRIDE, ETA_STRIDE), :] = \
                            tables[iop][pl.ds(r, ETA_STRIDE), :]
                    pair = weights(i) * s0_ref[...]
                    if has_cm:
                        pair = pair * rep(cm_refs[iop][i][pl.ds(b0, VC), :])
                    acc = acc + pair
            outs[iop][pl.ds(b0, VC), :] = jax.lax.dot_general(
                s_sum, acc, dn, preferred_element_type=dtype)
            col += nc
        return 0

    jax.lax.fori_loop(0, B // VC, body, 0)


def _kernel_multi(metas, unroll, paired, rows_ref, *refs):
    """Multi-op variant: several tables interpolated per cell in ONE pass,
    sharing the per-cell eta weight matrices, the pressure fraction and the
    loop overhead.  ``metas`` is a static tuple of
    (corner_itemp, has_fp, has_cm) per op; refs order is
    [fp?] jes(2) fms(4) [cms pairs...] [tables...] [outs...].

    4-corner ops (corner layout i0p0, i0p1, i1p0, i1p1) merge the two
    pressure slabs BEFORE the eta contraction — one weighted sum per
    temperature pair instead of two.

    ``unroll`` cells are processed per fori_loop iteration: their
    dependency chains are independent, so Mosaic can interleave the
    per-cell (16, G) slice + multiply-add chains and the loop/address
    bookkeeping amortizes (the loop is iteration-overhead-bound at ~150k
    cells per call).

    ``paired`` (requires neta <= 9, the RRTMGP mixing-fraction
    resolution): the table rows hold [eta 0..7 | eta 1..8] half-slab
    pairs, so the eta contraction is ONE (8, G) compare + two-term
    combine — fm0*T[je] + fm1*T[je+1] == sum_e [e==je](fm0*Tlo + fm1*Thi)
    — instead of two 16-row one-hot select-sums: every vector op runs at
    (8, G) = one vreg and the op count per cell nearly halves.

    A meta entry may carry a 4th element ``dup2=True``: the op's table is
    TWO tables lane-concatenated to (R, E, 2G) (e.g. LW kmajor|planck,
    which share rows, eta weights AND the pressure fraction), its output
    is (N, 2G), and the shared (16, G) weight matrix is duplicated along
    lanes in-kernel (with the col_mix factor folded into the FIRST half
    only).  Per-cell dynamic-slice count for the pair halves — the
    dominant per-cell cost on this hardware (see the paired-layout
    measurement)."""
    any_fp = any(m[1] for m in metas)
    k = 0
    fp_ref = None
    if any_fp:
        fp_ref = refs[0]
        k = 1
    je_refs = refs[k:k + 2]
    fm_refs = refs[k + 2:k + 6]
    k += 6
    cm_refs = []
    for m in metas:
        if m[2]:
            cm_refs.append(refs[k:k + 2])
            k += 2
        else:
            cm_refs.append(None)
    tables = refs[k:k + len(metas)]
    outs = refs[k + len(metas):]
    B = outs[0].shape[0]
    G = fm_refs[0].shape[1]          # weight-plane width (out may be 2G)
    H = ETA_STRIDE // 2
    dtype = outs[0].dtype
    e_iota = jax.lax.broadcasted_iota(
        jnp.int32, (H if paired else ETA_STRIDE, G),
        0).astype(je_refs[0].dtype)

    def cell(b):
        fp = fp_ref[b, 0] if any_fp else None
        w_i = [None, None]

        def weights(i):
            """Paired: (sel, fm0, fm1) with sel an (8, G) one-hot on je;
            plain: the (16, G) two-corner eta weight matrix."""
            if w_i[i] is None:
                je = je_refs[i][b, :][None, :]
                fm0 = fm_refs[2 * i][b, :][None, :]
                fm1 = fm_refs[2 * i + 1][b, :][None, :]
                if paired:
                    w_i[i] = ((e_iota == je).astype(dtype), fm0, fm1)
                else:
                    sel0 = (e_iota == je).astype(dtype)
                    sel1 = (e_iota == je + 1).astype(dtype)
                    w_i[i] = fm0 * sel0 + fm1 * sel1
            return w_i[i]

        def contract(i, slab_at):
            """Eta-contract the (pressure-merged) slab for temp pair i;
            slab_at(off, n) loads n rows at in-slab offset off."""
            if paired:
                sel, fm0, fm1 = weights(i)
                comb = fm0 * slab_at(0, H) + fm1 * slab_at(H, H)
                return jnp.sum(sel * comb, axis=0, keepdims=True)
            return jnp.sum(weights(i) * slab_at(0, ETA_STRIDE), axis=0,
                           keepdims=True)

        col = 0
        for iop, m in enumerate(metas):
            corner_itemp, has_fp, has_cm = m[:3]
            dup2 = len(m) > 3 and m[3]
            nc = len(corner_itemp)
            if dup2:
                # Lane-merged table pair ((16, 2G) slabs, halved slice
                # count); shared weights duplicated along lanes, col_mix
                # folded into the FIRST half only.
                acc = jnp.zeros((1, 2 * G), dtype)
                for i in (0, 1):
                    r0 = rows_ref[b, col + 2 * i] * ETA_STRIDE
                    r1 = rows_ref[b, col + 2 * i + 1] * ETA_STRIDE
                    slab = ((1.0 - fp) * tables[iop][pl.ds(r0, ETA_STRIDE), :]
                            + fp * tables[iop][pl.ds(r1, ETA_STRIDE), :])
                    w = weights(i)
                    w0 = (w * cm_refs[iop][i][b, :][None, :]
                          if has_cm else w)
                    w2 = jnp.concatenate([w0, w], axis=1)
                    acc = acc + jnp.sum(w2 * slab, axis=0, keepdims=True)
                outs[iop][b, :] = acc[0]
                col += nc
                continue
            acc = jnp.zeros((1, G), dtype)
            if has_fp:
                # (i0p0, i0p1, i1p0, i1p1): merge the pressure pair first.
                for i in (0, 1):
                    r0 = rows_ref[b, col + 2 * i] * ETA_STRIDE
                    r1 = rows_ref[b, col + 2 * i + 1] * ETA_STRIDE
                    pair = contract(i, lambda o, n: (
                        (1.0 - fp) * tables[iop][pl.ds(r0 + o, n), :]
                        + fp * tables[iop][pl.ds(r1 + o, n), :]))
                    if has_cm:
                        pair = pair * cm_refs[iop][i][b, :][None, :]
                    acc = acc + pair
            else:
                for c, i in enumerate(corner_itemp):
                    r = rows_ref[b, col + c] * ETA_STRIDE
                    pair = contract(i, lambda o, n:
                                    tables[iop][pl.ds(r + o, n), :])
                    if has_cm:
                        pair = pair * cm_refs[iop][i][b, :][None, :]
                    acc = acc + pair
            outs[iop][b, :] = acc[0]
            col += nc

    def body(gi, _):
        for u in range(unroll):
            cell(gi * unroll + u)
        return 0

    jax.lax.fori_loop(0, B // unroll, body, 0)


CELL_ROWS = 8  # per-cell resolve rows in V: je0, je1, fm0..fm3, cm0, cm1


def _kernel_cellw(metas, unroll, n_m2, sc_ops, wsel, paired, mfold,
                  rows_ref, *refs):
    """Cell-resolve variant: the per-g-point weight planes are computed
    IN-KERNEL from a g-independent per-cell resolve tensor instead of
    arriving as 8 precomputed (N, G) HBM planes.

    ``V_ref`` holds ``CELL_ROWS`` rows per cell — tropo-folded per-flavor
    vectors [je0, je1, fm0..3, cm0, cm1], each ``concat(x*tf, x*(1-tf))``
    over the (padded) 2*nflav axis — and each ``M2`` is a static stacked
    flavor mask (P, G_k).  One MXU matmul per ``unroll`` cells and M2
    ((unroll*8, P) @ (P, G_k), precision HIGHEST so fm weights stay exact
    f32; the je/tropo rows are exact by the one-nonzero-product argument)
    replaces reading 8 G-wide plane rows per cell from HBM-built planes —
    the XLA plane-build fusions and their HBM round-trip disappear from
    the step (VERDICT r2 item 2).

    Per-op M2 (``metas`` entry carries an index into the M2 list) lets ONE
    pass serve ops with different g-axes — e.g. kmajor+planck+minor: the
    minor op's axis is the concatenated contributor axis with its own
    placement mask.  Ops in ``sc_ops`` get a per-cell scaling vector (S,)
    expanded through a second static placement matrix (S, G) multiplied
    into their output — the minor pass's per-interval scaling, folded
    in-kernel.

    ``paired``: tables arrive in the half-slab layout
    [eta 0..H-1 | eta 1..H] (H = ETA_STRIDE/2; requires neta <= H+1 — the
    RRTMGP mixing-fraction resolution is 9 = H+1).  The eta contraction
    for a temperature pair then reads fm0*slab[:H] + fm1*slab[H:] and
    selects row je with ONE (H, G) one-hot — ~9 vector ops per pair
    instead of ~16 for the 16-row weight-plane form, with the SAME
    dynamic-slice count (unlike the plane-path ``paired`` mode of
    _kernel_multi, which doubled it and lost).  Numerics: the nonzero
    path computes fm0*T[je] + fm1*T[je+1] either way, but the compiler
    contracts the two-product form into an FMA (single rounding on the
    second product — measured on XLA:CPU), so results differ from the
    16-row form by <= ~1 ulp (the FMA value is the MORE accurate one).

    A meta entry may carry a 6th element ``dup2=True`` (requires the
    has_fp + adj form): the op's table is TWO tables lane-concatenated to
    (R, E, 2G) (kmajor|planck, which share rows, eta weights AND the
    pressure fraction), and the op writes TWO (B, G) outputs (in-kernel
    lane split — the plane-path dup2's (N, 2G) output-split copies, which
    made it a wash, never materialize).  Per-cell dynamic-slice count for
    the pair halves; col_mix folds into the first half's fm rows (one
    extra rounding vs the separate-op form, covered by the op tolerance
    tests).

    ``mfold = (src_iop, dst_iop)``: op ``src_iop``'s per-cell result
    (the minor-contributor axis, CT wide) is NOT written out; it goes to
    a (B, CT) VMEM scratch and, after the cell loop, is accumulated into
    op ``dst_iop``'s output through ONE whole-block one-hot placement
    matmul (B, CT) @ (CT, G) — the in-kernel form of the minor stitch.
    The (N, CT) contributor plane never touches HBM and the zero-filled
    stitch planes disappear from the XLA step.  Addition order within a
    g-point differs from the sequential stitch (matmul lane sums) — a
    few-ulp reassociation on overlapping intervals, covered by the op
    tolerance tests."""
    any_fp = any(m[1] for m in metas)
    k = 0
    fp_ref = None
    if any_fp:
        fp_ref = refs[0]
        k = 1
    V_ref = refs[k]
    k += 1
    M2_refs = refs[k:k + n_m2]
    k += n_m2
    sc_ref = msc_ref = None
    if sc_ops:
        sc_ref, msc_ref = refs[k:k + 2]
        k += 2
    mp_ref = None
    if mfold is not None:
        mp_ref = refs[k]
        k += 1
    n_out = sum(0 if (mfold is not None and iop == mfold[0])
                else (2 if (len(m) > 5 and m[5]) else 1)
                for iop, m in enumerate(metas))
    tables = refs[k:k + len(metas)]
    k += len(metas)
    outs = refs[k:k + n_out]
    k += n_out
    res_scrs = refs[k:k + n_m2]
    k += n_m2
    scs_scr = None
    if sc_ops:
        scs_scr = refs[k]
        k += 1
    fold_scr = refs[k] if mfold is not None else None
    B = outs[0].shape[0]
    dtype = outs[0].dtype
    H = ETA_STRIDE // 2
    # One iota per weight-plane width: the resolve widths are the M2
    # widths (an mfold src op has no output to read the width from).
    iotas = {}
    for r in M2_refs:
        w = r.shape[1]
        if w not in iotas:
            iotas[w] = jax.lax.broadcasted_iota(
                jnp.int32, (H if paired else ETA_STRIDE, w), 0).astype(dtype)
    hi = jax.lax.Precision.HIGHEST

    def cell(b, res_list, res_s):
        fp = fp_ref[b, 0] if any_fp else None
        w_cache = {}

        def weights(mk, i):
            """paired: the (H, G) bool one-hot on je; plain: the (16, G)
            eta weight plane."""
            if (mk, i) not in w_cache:
                res = res_list[mk]
                je = res[i:i + 1, :]
                e_iota = iotas[res.shape[1]]
                if paired:
                    w = e_iota == je
                else:
                    fm0 = res[2 + 2 * i:3 + 2 * i, :]
                    fm1 = res[3 + 2 * i:4 + 2 * i, :]
                    if wsel:
                        d = e_iota - je
                        w = jnp.where(d == 0.0, fm0,
                                      jnp.where(d == 1.0, fm1, 0.0))
                    else:
                        sel0 = (e_iota == je).astype(dtype)
                        sel1 = (e_iota == je + 1).astype(dtype)
                        w = fm0 * sel0 + fm1 * sel1
                w_cache[(mk, i)] = w
            return w_cache[(mk, i)]

        def contract(mk, i, slab):
            """Eta-contract a temperature pair's (ETA_STRIDE, G) slab."""
            if paired:
                res = res_list[mk]
                fm0 = res[2 + 2 * i:3 + 2 * i, :]
                fm1 = res[3 + 2 * i:4 + 2 * i, :]
                comb = fm0 * slab[:H, :] + fm1 * slab[H:, :]
                return jnp.sum(jnp.where(weights(mk, i), comb, 0.0),
                               axis=0, keepdims=True)
            return jnp.sum(weights(mk, i) * slab, axis=0, keepdims=True)

        col = 0
        slot = 0
        for iop, m in enumerate(metas):
            corner_itemp, has_fp, has_cm = m[:3]
            mk = m[3] if len(m) > 3 else 0
            adj = m[4] if len(m) > 4 else False
            dup2 = len(m) > 5 and m[5]
            res = res_list[mk]
            nc = len(corner_itemp)
            G = (fold_scr.shape[1]
                 if mfold is not None and iop == mfold[0]
                 else outs[slot].shape[1])
            if dup2:
                # Lane-merged kmajor|planck pair (has_fp + adj enforced by
                # the wrapper): ONE (32, 2G) slice per pressure serves both
                # tables; weights/selects duplicate along lanes (cheap vreg
                # moves), col_mix folds into the first half's fm rows, and
                # the (1, 2G) accumulator lane-splits into the two outputs
                # IN-KERNEL (no (N, 2G) output-split copies).
                r0 = rows_ref[b, col] * ETA_STRIDE
                r1 = rows_ref[b, col + 1] * ETA_STRIDE
                slab = ((1.0 - fp)
                        * tables[iop][pl.ds(r0, 2 * ETA_STRIDE), :]
                        + fp * tables[iop][pl.ds(r1, 2 * ETA_STRIDE), :])
                acc = jnp.zeros((1, 2 * G), dtype)
                for i in (0, 1):
                    s_i = slab[i * ETA_STRIDE:(i + 1) * ETA_STRIDE, :]
                    cm = res[6 + i:7 + i, :] if has_cm else None
                    if paired:
                        fm0 = res[2 + 2 * i:3 + 2 * i, :]
                        fm1 = res[3 + 2 * i:4 + 2 * i, :]
                        f0 = jnp.concatenate(
                            [fm0 * cm if has_cm else fm0, fm0], axis=1)
                        f1 = jnp.concatenate(
                            [fm1 * cm if has_cm else fm1, fm1], axis=1)
                        sel = weights(mk, i)
                        sel2 = jnp.concatenate([sel, sel], axis=1)
                        comb = f0 * s_i[:H, :] + f1 * s_i[H:, :]
                        pair = jnp.sum(jnp.where(sel2, comb, 0.0),
                                       axis=0, keepdims=True)
                    else:
                        w = weights(mk, i)
                        w2 = jnp.concatenate(
                            [w * cm if has_cm else w, w], axis=1)
                        pair = jnp.sum(w2 * s_i, axis=0, keepdims=True)
                    acc = acc + pair
                outs[slot][b, :] = acc[0, :G]
                outs[slot + 1][b, :] = acc[0, G:]
                slot += 2
                col += nc
                continue
            acc = jnp.zeros((1, G), dtype)
            if has_fp and adj:
                # 4-corner (i0p0, i0p1, i1p0, i1p1) with the adj meta flag
                # set: the caller declares the temperature corners ADJACENT
                # table rows (r(i1,p) = r(i0,p)+1, as _slab_rows builds
                # r = (p0+dp)*ntemp + jt0 + i), so ONE 32-row slice per
                # pressure fetches both — the per-cell dynamic-slice count
                # (the dominant per-cell cost on this hardware) halves vs
                # slicing per corner.  rows columns col+2/col+3 (the i1
                # corners) are unused under this contract.
                r0 = rows_ref[b, col] * ETA_STRIDE
                r1 = rows_ref[b, col + 1] * ETA_STRIDE
                slab = ((1.0 - fp)
                        * tables[iop][pl.ds(r0, 2 * ETA_STRIDE), :]
                        + fp * tables[iop][pl.ds(r1, 2 * ETA_STRIDE), :])
                for i in (0, 1):
                    pair = contract(
                        mk, i, slab[i * ETA_STRIDE:(i + 1) * ETA_STRIDE, :])
                    if has_cm:
                        pair = pair * res[6 + i:7 + i, :]
                    acc = acc + pair
            elif has_fp:
                # Non-adjacent 4-corner layout: honest per-pressure-pair
                # fetches through all four row columns.
                for i in (0, 1):
                    r0 = rows_ref[b, col + 2 * i] * ETA_STRIDE
                    r1 = rows_ref[b, col + 2 * i + 1] * ETA_STRIDE
                    slab = ((1.0 - fp) * tables[iop][pl.ds(r0, ETA_STRIDE), :]
                            + fp * tables[iop][pl.ds(r1, ETA_STRIDE), :])
                    pair = contract(mk, i, slab)
                    if has_cm:
                        pair = pair * res[6 + i:7 + i, :]
                    acc = acc + pair
            elif adj and corner_itemp == (0, 1):
                # 2-corner op whose rows are declared temperature-adjacent
                # (e.g. krayl: r = itropo*ntemp + jt0 + i): one 32-row
                # slice serves both corners.
                r = rows_ref[b, col] * ETA_STRIDE
                slab = tables[iop][pl.ds(r, 2 * ETA_STRIDE), :]
                for i in (0, 1):
                    pair = contract(
                        mk, i, slab[i * ETA_STRIDE:(i + 1) * ETA_STRIDE, :])
                    if has_cm:
                        pair = pair * res[6 + i:7 + i, :]
                    acc = acc + pair
            else:
                for c, i in enumerate(corner_itemp):
                    r = rows_ref[b, col + c] * ETA_STRIDE
                    pair = contract(mk, i,
                                    tables[iop][pl.ds(r, ETA_STRIDE), :])
                    if has_cm:
                        pair = pair * res[6 + i:7 + i, :]
                    acc = acc + pair
            if iop in sc_ops:
                acc = acc * res_s
            if mfold is not None and iop == mfold[0]:
                fold_scr[b, :] = acc[0]
            else:
                outs[slot][b, :] = acc[0]
                slot += 1
            col += nc

    # Whole-block resolve pre-pass: ONE (B*8, P) @ (P, G) MXU matmul per
    # mask matrix into VMEM scratch, instead of one small matmul per
    # unroll group inside the loop (measured: the per-group matmuls made
    # the cellw kernels ~40% slower than the plane-fed ones — MXU issue
    # latency at (unroll*8, P) sizes dominated the work).
    dn = (((1,), (0,)), ((), ()))
    for r_scr, M2_ref in zip(res_scrs, M2_refs):
        r_scr[...] = jax.lax.dot_general(
            V_ref[...], M2_ref[...], dn,
            precision=hi, preferred_element_type=dtype)
    if sc_ops:
        scs_scr[...] = jax.lax.dot_general(
            sc_ref[...], msc_ref[...], dn,
            precision=hi, preferred_element_type=dtype)

    def body(gi, _):
        # np.int32 constants: under x64 bare Python ints promote the index
        # arithmetic to i64, which the Mosaic verifier rejects.
        b0 = gi * np.int32(unroll)
        res_all = [r_scr[pl.ds(b0 * np.int32(CELL_ROWS),
                               unroll * CELL_ROWS), :]
                   for r_scr in res_scrs]
        res_s = None
        if sc_ops:
            res_s = scs_scr[pl.ds(b0, unroll), :]
        for u in range(unroll):
            cell(b0 + u,
                 [r[u * CELL_ROWS:(u + 1) * CELL_ROWS, :] for r in res_all],
                 res_s[u:u + 1, :] if sc_ops else None)
        return 0

    jax.lax.fori_loop(0, B // unroll, body, 0)

    if mfold is not None:
        # In-kernel minor stitch: ONE whole-block one-hot placement
        # matmul folds the (B, CT) contributor scratch into the dst op's
        # output (unit weights — each product exact; lane sums
        # reassociate overlapping intervals by a few ulp).
        slot_of, s = {}, 0
        for iop, m in enumerate(metas):
            if iop == mfold[0]:
                continue
            slot_of[iop] = s
            s += 2 if (len(m) > 5 and m[5]) else 1
        d = slot_of[mfold[1]]
        outs[d][...] = outs[d][...] + jax.lax.dot_general(
            fold_scr[...], mp_ref[...], dn,
            precision=hi, preferred_element_type=dtype)


@functools.partial(jax.jit, static_argnames=("metas", "neta", "block",
                                             "unroll", "sc_ops", "wsel",
                                             "paired", "mfold"))
def interp_cellw_multi(tables, rows_list, V, M2, fp, *, metas: tuple,
                       neta: int, block: int = 256, unroll: int = 4,
                       sc=None, msc=None, sc_ops=None, wsel: bool = False,
                       paired: bool = False, mfold=None, mplace=None):
    """Multi-table interpolation with IN-KERNEL weight-plane resolves.

    Same op semantics as :func:`interp_rows_multi`, but instead of 8
    precomputed (N, G) planes the call takes:

    * ``V``   (N*CELL_ROWS, P): per-cell resolve rows (je0, je1, fm0..3,
      cm0, cm1), each a tropo-folded flavor vector — g-independent, built
      ONCE per solve (``gas_optics.cell_resolves``) and shared across all
      spectral chunks and all interp passes,
    * ``M2``  (P, G) or a LIST of such matrices: static stacked flavor
      masks for THIS chunk's g-points (a cheap column slice of the
      full-spectrum matrix).  A meta entry's optional 4th element is the
      op's index into the M2 list (default 0) — ops with different g-axes
      (e.g. kmajor + the minor contributor axis) then run in ONE pass,
    * ``fp``  (N,) pressure fraction or None,
    * ``sc``/``msc``: optional per-cell scaling vector (N, S) + placement
      matrix (S, G), multiplied into the outputs of the ops listed in
      ``sc_ops`` (default: every op) — the minor-gas per-interval scaling.

    Returns a list of per-op (N, G_op) outputs."""
    N = rows_list[0].shape[0]
    M2s = M2 if isinstance(M2, (list, tuple)) else [M2]
    dtype = tables[0].dtype
    any_fp = any(m[1] for m in metas)
    if sc is not None and sc_ops is None:
        sc_ops = tuple(range(len(metas)))
    sc_ops = tuple(sc_ops or ())

    H = ETA_STRIDE // 2
    paired = paired and neta <= H + 1
    if mfold is not None:
        src, dst = mfold
        assert src != dst and mplace is not None
        assert not (len(metas[src]) > 5 and metas[src][5]), \
            "mfold src cannot be a dup2 op"
        assert mplace.shape[0] == M2s[
            metas[src][3] if len(metas[src]) > 3 else 0].shape[1]
        assert mplace.shape[1] == M2s[
            metas[dst][3] if len(metas[dst]) > 3 else 0].shape[1]
    tbls, out_ws = [], []
    for iop, (t, m) in enumerate(zip(tables, metas)):
        Gi = M2s[m[3] if len(m) > 3 else 0].shape[1]
        dup2 = len(m) > 5 and m[5]
        tw = 2 * Gi if dup2 else Gi
        assert t.shape[1] == neta and t.shape[2] == tw, (t.shape, neta, tw)
        if dup2:
            assert m[1] and len(m) > 4 and m[4], \
                "dup2 requires the has_fp + adj form"
            assert iop not in sc_ops, "dup2 ops cannot take sc scaling"
        if paired:
            # Half-slab pair layout [eta 0..H-1 | eta 1..H] (see
            # _kernel_cellw): the in-kernel eta contraction runs at (H, G).
            t9 = (t if neta == H + 1 else
                  jnp.pad(t, ((0, 0), (0, H + 1 - neta), (0, 0))))
            tp = jnp.concatenate([t9[:, :H], t9[:, 1:H + 1]], axis=1)
        else:
            tp = jnp.pad(t, ((0, 0), (0, ETA_STRIDE - neta), (0, 0)))
        tbls.append(tp.reshape(t.shape[0] * ETA_STRIDE, tw))
        if mfold is not None and iop == mfold[0]:
            fold_ct = Gi          # scratch width; no external output
        else:
            out_ws.extend([Gi, Gi] if dup2 else [Gi])

    rows = jnp.concatenate(rows_list, axis=1)
    P = V.shape[1]
    pad = (-N) % block
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        V = jnp.pad(V, ((0, pad * CELL_ROWS), (0, 0)))
        if fp is not None:
            fp = jnp.pad(fp, ((0, pad),))
        if sc is not None:
            sc = jnp.pad(sc, ((0, pad), (0, 0)))
    n_pad = N + pad

    while block % unroll:
        unroll -= 1
    if sc is not None and block % 8 == 0:
        # The sc block's in-kernel dynamic slice starts at gi*unroll on the
        # sublane axis; keep starts 8-aligned (Mosaic sublane alignment).
        unroll = max(8, unroll - unroll % 8)
        while block % unroll:
            unroll -= 8
    operands = [rows]
    specs = [pl.BlockSpec((block, rows.shape[1]), lambda ib: (ib, 0),
                          memory_space=pltpu.SMEM)]
    if any_fp:
        operands.append(fp.reshape(-1, 1))
        specs.append(pl.BlockSpec((block, 1), lambda ib: (ib, 0),
                                  memory_space=pltpu.SMEM))
    operands.append(V)
    specs.append(pl.BlockSpec((block * CELL_ROWS, P), lambda ib: (ib, 0),
                              memory_space=pltpu.VMEM))
    for m2 in M2s:
        operands.append(m2)
        specs.append(pl.BlockSpec(m2.shape, lambda ib: (0, 0),
                                  memory_space=pltpu.VMEM))
    if sc is not None:
        operands.append(sc)
        specs.append(pl.BlockSpec((block, sc.shape[1]), lambda ib: (ib, 0),
                                  memory_space=pltpu.VMEM))
        operands.append(msc)
        specs.append(pl.BlockSpec(msc.shape, lambda ib: (0, 0),
                                  memory_space=pltpu.VMEM))
    if mfold is not None:
        operands.append(mplace)
        specs.append(pl.BlockSpec(mplace.shape, lambda ib: (0, 0),
                                  memory_space=pltpu.VMEM))
    for t in tbls:
        operands.append(t)
        specs.append(pl.BlockSpec(t.shape, lambda ib: (0, 0),
                                  memory_space=pltpu.VMEM))

    scratch = [pltpu.VMEM((block * CELL_ROWS, m2.shape[1]), dtype)
               for m2 in M2s]
    if sc is not None:
        scratch.append(pltpu.VMEM((block, msc.shape[1]), dtype))
    if mfold is not None:
        scratch.append(pltpu.VMEM((block, fold_ct), dtype))
    outs = pl.pallas_call(
        functools.partial(_kernel_cellw, metas, unroll, len(M2s), sc_ops,
                          wsel, paired, mfold),
        grid=(n_pad // block,),
        in_specs=specs,
        out_specs=[pl.BlockSpec((block, w), lambda ib: (ib, 0),
                                memory_space=pltpu.VMEM) for w in out_ws],
        out_shape=[jax.ShapeDtypeStruct((n_pad, w), dtype) for w in out_ws],
        scratch_shapes=scratch,
        compiler_params=_PARAMS,
    )(*operands)
    return [o[:N] if pad else o for o in outs]


def interp_rows_multi(tables, rows_list, jes, fms, fps, cms_list, **kw):
    """Fused multi-table interpolation: one kernel pass over the cells
    serving several (table, corners) ops that share the flavor-resolved
    eta weights — e.g. LW kmajor + planck_frac, SW kmajor + krayl.

    tables: list of (R, neta, G) row tables (same G); rows_list: per-op
    (N, nc) unscaled row indices; jes/fms: shared weight planes (N, G);
    fps: per-op fpress (N,) or None; cms_list: per-op (cm0, cm1) planes or
    None; metas: static per-op (corner_itemp, has_fp, has_cm).
    Returns a list of (N, G) outputs."""
    # The kernel applies ONE shared pressure-fraction plane to every op
    # with has_fp; differing per-op fps would be silently ignored.  The
    # identity check must run OUTSIDE the jit boundary (duplicate pytree
    # leaves become distinct tracers inside).
    first = next((f for f in fps if f is not None), None)
    assert all(f is None or f is first for f in fps), \
        "interp_rows_multi: all non-None fps must be the same plane"
    return _interp_rows_multi(tables, rows_list, jes, fms, fps, cms_list,
                              **kw)


@functools.partial(jax.jit, static_argnames=("metas", "neta", "block", "vec",
                                             "unroll", "paired"))
def _interp_rows_multi(tables, rows_list, jes, fms, fps, cms_list, *,
                       metas: tuple, neta: int, block: int = 256,
                       vec: bool = False, unroll: int = 4,
                       paired: bool = False):
    N, G = fms[0].shape
    dtype = tables[0].dtype
    any_fp = any(m[1] for m in metas)
    fp = next((f for f in fps if f is not None), None)

    any_dup2 = any(len(m) > 3 and m[3] for m in metas)
    if any_dup2:
        assert all((len(m) <= 3 or not m[3]) or m[1] for m in metas), \
            "dup2 ops require the pressure-fraction (4-corner) form"
        vec = False
        paired = False
    vec = vec and block % 8 == 0
    H = ETA_STRIDE // 2
    # Paired half-slab layout (see _kernel_multi): rows hold
    # [eta 0..H-1 | eta 1..H] so the kernel contracts (H, G) half-slabs.
    # Measured SLOWER than the plain layout on the v5e (8.8 vs 6.9 ms/call
    # at the production shape: it doubles the dynamic-slice count per cell
    # and per-slice issue cost dominates) — off by default, kept as a
    # tested option for architectures where slice issue is cheaper.
    paired = paired and (not vec) and neta <= H + 1

    tbls = []
    for t in tables:
        assert t.shape[1] == neta and t.shape[2] % G == 0, (t.shape, neta, G)
        if paired:
            t9 = (t if neta == H + 1 else
                  jnp.pad(t, ((0, 0), (0, H + 1 - neta), (0, 0))))
            tp = jnp.concatenate([t9[:, :H], t9[:, 1:H + 1]], axis=1)
        else:
            tp = jnp.pad(t, ((0, 0), (0, ETA_STRIDE - neta), (0, 0)))
        tbls.append(tp.reshape(t.shape[0] * ETA_STRIDE, t.shape[2]))

    rows = jnp.concatenate(rows_list, axis=1)
    pad = (-N) % block
    if pad:
        p2 = lambda a: jnp.pad(a, ((0, pad), (0, 0)))
        rows = p2(rows)
        jes = tuple(p2(a) for a in jes)
        fms = tuple(p2(a) for a in fms)
        if fp is not None:
            fp = jnp.pad(fp, ((0, pad),))
        cms_list = [tuple(p2(a) for a in cms) if cms is not None else None
                    for cms in cms_list]
    n_pad = N + pad

    while block % unroll:
        unroll -= 1
    plane = pl.BlockSpec((block, G), lambda ib: (ib, 0),
                         memory_space=pltpu.VMEM)
    operands = [rows]
    specs = [pl.BlockSpec((block, rows.shape[1]), lambda ib: (ib, 0),
                          memory_space=pltpu.SMEM)]
    if any_fp:
        operands.append(fp.reshape(-1, 1))
        specs.append(pl.BlockSpec((block, 1), lambda ib: (ib, 0),
                                  memory_space=pltpu.VMEM if vec
                                  else pltpu.SMEM))
    operands.extend(jes)
    operands.extend(fms)
    specs.extend([plane] * 6)
    for cms in cms_list:
        if cms is not None:
            operands.extend(cms)
            specs.extend([plane] * 2)
    for t in tbls:
        operands.append(t)
        specs.append(pl.BlockSpec(t.shape, lambda ib: (0, 0),
                                  memory_space=pltpu.VMEM))

    out_w = [t.shape[1] for t in tbls]
    outs = pl.pallas_call(
        functools.partial(_kernel_multi_vec, metas) if vec
        else functools.partial(_kernel_multi, metas, unroll, paired),
        grid=(n_pad // block,),
        in_specs=specs,
        out_specs=[pl.BlockSpec((block, w), lambda ib: (ib, 0),
                                memory_space=pltpu.VMEM) for w in out_w],
        out_shape=[jax.ShapeDtypeStruct((n_pad, w), dtype) for w in out_w],
        scratch_shapes=([pltpu.VMEM((8 * ETA_STRIDE, G), dtype)] * 2
                        if vec else []),
        compiler_params=_PARAMS,
    )(*operands)
    return [o[:N] if pad else o for o in outs]


@functools.partial(jax.jit,
                   static_argnames=("neta", "block", "corner_itemp", "vec",
                                    "unroll"))
def interp_rows_pallas(table, rows, jes, fms, *, fp=None, cms=None,
                       neta: int, block: int = 256,
                       corner_itemp: tuple = (0, 0, 1, 1),
                       vec: bool = False, unroll: int = 4):
    """table (R, E, G) unpadded row layout; rows (N, NC) *unscaled* row
    indices; jes = (je_itemp0, je_itemp1) each (N, G) int32; fms = the four
    fminor weight planes (N, G) in (itemp*2 + deta) order (shared across
    the major / Planck / Rayleigh tables — XLA CSEs their construction);
    fp = per-cell pressure interpolation fraction (N,), folded in-kernel
    for the 4-corner (i0p0, i0p1, i1p0, i1p1) layout; cms = per-itemp
    col_mix planes for the tau variant.  corner_itemp maps each corner to
    its temperature pair.  Returns (N, G)."""
    if block % 8 == 0:
        # Single-op = one-entry multi: shares the unrolled/vectorized
        # kernel bodies.  The scalar body below is kept as the reference
        # implementation for arbitrary block sizes.
        return interp_rows_multi(
            [table], [rows], jes, fms, [fp], [cms],
            metas=((tuple(corner_itemp), fp is not None, cms is not None),),
            neta=neta, block=block, vec=vec, unroll=unroll)[0]
    N, G = fms[0].shape
    NC = len(corner_itemp)
    assert len(jes) == 2 and len(fms) == 4, (len(jes), len(fms), NC)
    assert fp is None or NC == 4
    R = table.shape[0]
    assert table.shape[1] == neta, (table.shape, neta)

    tbl = jnp.pad(table, ((0, 0), (0, ETA_STRIDE - neta), (0, 0)))
    tbl = tbl.reshape(R * ETA_STRIDE, G)

    pad = (-N) % block
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        jes = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in jes)
        fms = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in fms)
        if fp is not None:
            fp = jnp.pad(fp, ((0, pad),))

        if cms is not None:
            cms = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in cms)
    n_pad = N + pad

    plane = pl.BlockSpec((block, G), lambda ib: (ib, 0),
                         memory_space=pltpu.VMEM)
    operands = [rows]
    specs = [pl.BlockSpec((block, NC), lambda ib: (ib, 0),
                          memory_space=pltpu.SMEM)]
    if fp is not None:
        operands.append(fp.reshape(-1, 1))
        specs.append(pl.BlockSpec((block, 1), lambda ib: (ib, 0),
                                  memory_space=pltpu.SMEM))
    operands.extend(jes)
    operands.extend(fms)
    specs.extend([plane] * 6)
    if cms is not None:
        operands.extend(cms)
        specs.extend([plane] * 2)
    operands.append(tbl)
    specs.append(pl.BlockSpec((R * ETA_STRIDE, G), lambda ib: (0, 0),
                              memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_kernel, corner_itemp, fp is not None,
                          cms is not None),
        grid=(n_pad // block,),
        in_specs=specs,
        out_specs=plane,
        out_shape=jax.ShapeDtypeStruct((n_pad, G), table.dtype),
        compiler_params=_PARAMS,
    )(*operands)
    return out[:N] if pad else out
