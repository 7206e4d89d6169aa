"""Pallas fused interpolation kernel vs the XLA row-gather path.

Runs the kernel in interpreter mode on CPU (tests never see real TPU), and
checks the gas-optics dispatch produces identical math.
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from rte_rrtmgp_tpu.ops.pallas import interp_rows_pallas


def _oracle(table, rows, je, fms, fp, cms, corner_itemp):
    """NumPy reference of the kernel contract."""
    N, G = fms[0].shape
    out = np.zeros((N, G), np.float64)
    tbl = np.asarray(table, np.float64)
    for n in range(N):
        for c, i in enumerate(corner_itemp):
            slab = tbl[rows[n, c]]                         # (E, G)
            for g in range(G):
                e = je[n, i, g]
                pair = (fms[2 * i][n, g] * slab[e, g]
                        + fms[2 * i + 1][n, g] * slab[e + 1, g])
                if fp is not None:
                    pair *= fp[n] if c % 2 == 1 else 1.0 - fp[n]
                if cms is not None:
                    pair *= cms[i][n, g]
                out[n, g] += pair
    return out


@pytest.mark.parametrize("N,G,with_fp,with_cm", [
    (7, 128, True, True), (32, 128, True, False), (16, 128, False, False)])
def test_kernel_matches_oracle_interpret(N, G, with_fp, with_cm):
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    neta, R = 9, 6 * 4   # (press*temp) rows
    corner_itemp = (0, 0, 1, 1) if with_fp else (0, 1)
    nc = len(corner_itemp)
    table = rng.random((R, neta, G), np.float32)
    rows = rng.integers(0, R, (N, nc)).astype(np.int32)
    je = rng.integers(0, neta - 1, (N, 2, G)).astype(np.int32)
    fms = tuple(rng.random((N, G), np.float32) for _ in range(4))
    fp = rng.random((N,), np.float32) if with_fp else None
    cms = (tuple(rng.random((N, G), np.float32) for _ in range(2))
           if with_cm else None)

    jes = tuple(jnp.asarray(je[:, i]) for i in range(2))
    with pltpu.force_tpu_interpret_mode():
        out = interp_rows_pallas(
            jnp.asarray(table), jnp.asarray(rows), jes,
            tuple(jnp.asarray(f) for f in fms),
            fp=None if fp is None else jnp.asarray(fp),
            cms=None if cms is None else tuple(jnp.asarray(c) for c in cms),
            neta=neta, block=8, corner_itemp=corner_itemp)
    ref = _oracle(table, rows, je, fms, fp, cms, corner_itemp)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-6)


def test_gas_optics_pallas_path_matches_xla(monkeypatch):
    """Force the Pallas dispatch (interpret mode) through tau_major/planck
    and compare against the default XLA path on the same inputs."""
    import sys
    import os

    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import small_kdist, small_atmos
    from jax.experimental.pallas import tpu as pltpu
    from rte_rrtmgp_tpu.ops import gas_optics as go
    from rte_rrtmgp_tpu import config as cfg

    from helpers import atmos_inputs

    kd = small_kdist(longwave=True)
    kd = jax.tree.map(lambda a: a.astype(np.float32)
                      if hasattr(a, "dtype") and a.dtype.kind == "f" else a, kd)
    atm = small_atmos(ncol=4, nlay=6, seed=1)
    vmr, col_dry = atmos_inputs(kd, atm)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    col_gas = go.build_col_gas(f32(vmr), f32(col_dry))
    interp = go.interpolation(kd, f32(atm["p_lay"]), f32(atm["t_lay"]), col_gas)

    tau_xla = go.tau_major(kd, interp)

    monkeypatch.setenv("RTE_RRTMGP_PALLAS", "1")
    assert cfg.use_pallas()
    with pltpu.force_tpu_interpret_mode():
        tau_pl = go.tau_major(kd, interp)

    np.testing.assert_allclose(np.asarray(tau_pl), np.asarray(tau_xla),
                               rtol=3e-6, atol=1e-12)


def test_rayleigh_pallas_path_matches_xla(monkeypatch):
    """tau_rayleigh's 2-corner Pallas dispatch vs the XLA path."""
    import sys
    import os

    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import small_kdist, small_atmos, atmos_inputs
    from jax.experimental.pallas import tpu as pltpu
    from rte_rrtmgp_tpu.ops import gas_optics as go
    from rte_rrtmgp_tpu import config as cfg

    kd = small_kdist(longwave=False)
    kd = jax.tree.map(lambda a: a.astype(np.float32)
                      if hasattr(a, "dtype") and a.dtype.kind == "f" else a, kd)
    atm = small_atmos(ncol=4, nlay=6, seed=2)
    vmr, col_dry = atmos_inputs(kd, atm)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    col_gas = go.build_col_gas(f32(vmr), f32(col_dry))
    interp = go.interpolation(kd, f32(atm["p_lay"]), f32(atm["t_lay"]), col_gas)

    ray_xla = go.tau_rayleigh(kd, interp, col_gas, f32(col_dry))

    monkeypatch.setenv("RTE_RRTMGP_PALLAS", "1")
    assert cfg.use_pallas()
    with pltpu.force_tpu_interpret_mode():
        ray_pl = go.tau_rayleigh(kd, interp, col_gas, f32(col_dry))

    np.testing.assert_allclose(np.asarray(ray_pl), np.asarray(ray_xla),
                               rtol=3e-6, atol=1e-30)


def test_minor_pallas_path_matches_xla(monkeypatch):
    """tau_minor's one-call-per-atmosphere Pallas dispatch vs XLA."""
    import sys
    import os

    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import small_kdist, small_atmos, atmos_inputs
    from jax.experimental.pallas import tpu as pltpu
    from rte_rrtmgp_tpu.ops import gas_optics as go
    from rte_rrtmgp_tpu import config as cfg

    kd = small_kdist(longwave=True)
    kd = jax.tree.map(lambda a: a.astype(np.float32)
                      if hasattr(a, "dtype") and a.dtype.kind == "f" else a, kd)
    assert kd.minor_lower and kd.minor_upper
    atm = small_atmos(ncol=4, nlay=6, seed=3)
    vmr, col_dry = atmos_inputs(kd, atm)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    p, t = f32(atm["p_lay"]), f32(atm["t_lay"])
    col_gas = go.build_col_gas(f32(vmr), f32(col_dry))
    interp = go.interpolation(kd, p, t, col_gas)
    tau0 = jnp.zeros((4, 6, kd.ngpt), jnp.float32)

    tau_xla = go.tau_minor(kd, interp, p, t, col_gas, tau0)
    assert float(jnp.abs(tau_xla).max()) > 0

    monkeypatch.setenv("RTE_RRTMGP_PALLAS", "1")
    assert cfg.use_pallas()
    with pltpu.force_tpu_interpret_mode():
        tau_pl = go.tau_minor(kd, interp, p, t, col_gas, tau0)

    np.testing.assert_allclose(np.asarray(tau_pl), np.asarray(tau_xla),
                               rtol=3e-6, atol=1e-30)


def test_multi_op_pass_matches_singles():
    """Fused multi-table pass (kmajor+planck / kmajor+krayl shapes) returns
    exactly what the per-table kernel returns."""
    from rte_rrtmgp_tpu.ops.pallas import interp_rows_multi, interp_rows_pallas

    rng = np.random.default_rng(4)
    N, G, R, E, T = 70, 128, 36, 9, 4
    f32 = lambda *s: rng.random(s, dtype=np.float32)
    tbl1 = jnp.asarray(f32(R, E, G))
    tbl2 = jnp.asarray(f32(R, E, G))
    tbl3 = jnp.asarray(f32(2 * T, E, G))
    rows4 = jnp.asarray(rng.integers(0, R - T - 2, (N, 1)).repeat(4, 1)
                        + np.array([0, T, 1, T + 1]), dtype=jnp.int32)
    rows2 = jnp.asarray(rng.integers(0, T, (N, 2)), dtype=jnp.int32)
    jes = tuple(jnp.asarray(rng.integers(0, E - 1, (N, G)), jnp.int32)
                for _ in range(2))
    fms = tuple(jnp.asarray(f32(N, G)) for _ in range(4))
    fp = jnp.asarray(f32(N))
    cms = tuple(jnp.asarray(f32(N, G)) for _ in range(2))

    with pltpu.force_tpu_interpret_mode():
        m1, m2, m3 = interp_rows_multi(
            [tbl1, tbl2, tbl3], [rows4, rows4, rows2], jes, fms,
            [fp, fp, None], [cms, None, None],
            metas=(((0, 0, 1, 1), True, True),
                   ((0, 0, 1, 1), True, False),
                   ((0, 1), False, False)),
            neta=E, block=32)
        # Note: single-op kernel uses corner order (i0p0, i0p1, i1p0, i1p1)
        # with odd corners weighted fp — same convention.  block=31 forces
        # the scalar per-cell reference body (31 % 8 != 0), so this also
        # checks vectorized (8-cells-per-iteration) vs scalar parity.
        s1 = interp_rows_pallas(tbl1, rows4, jes, fms, fp=fp, cms=cms,
                                neta=E, block=31)
        s2 = interp_rows_pallas(tbl2, rows4, jes, fms, fp=fp, neta=E,
                                block=31)
        s3 = interp_rows_pallas(tbl3, rows2, jes, fms, neta=E, block=31,
                                corner_itemp=(0, 1))
        mv = interp_rows_multi(
            [tbl1, tbl2, tbl3], [rows4, rows4, rows2], jes, fms,
            [fp, fp, None], [cms, None, None],
            metas=(((0, 0, 1, 1), True, True),
                   ((0, 0, 1, 1), True, False),
                   ((0, 1), False, False)),
            neta=E, block=32, vec=False)
        mpair = interp_rows_multi(
            [tbl1, tbl2, tbl3], [rows4, rows4, rows2], jes, fms,
            [fp, fp, None], [cms, None, None],
            metas=(((0, 0, 1, 1), True, True),
                   ((0, 0, 1, 1), True, False),
                   ((0, 1), False, False)),
            neta=E, block=32, paired=True)
    np.testing.assert_allclose(m1, s1, rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(m2, s2, rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(m3, s3, rtol=2e-6, atol=1e-6)
    for m, s in zip((m1, m2, m3), mv):
        np.testing.assert_allclose(m, np.asarray(s), rtol=2e-6, atol=1e-6)
    for m, s in zip((m1, m2, m3), mpair):
        np.testing.assert_allclose(m, np.asarray(s), rtol=2e-6, atol=1e-6)


def test_fused_gas_optics_entries_match_unfused():
    """tau_major_and_pfrac / tau_major_and_rayleigh == the separate ops
    (CPU: both sides take the XLA path — checks the plumbing)."""
    from helpers import small_kdist, small_atmos, atmos_inputs
    from rte_rrtmgp_tpu.ops import gas_optics as gas_ops

    kd = small_kdist(False)
    atm = small_atmos()
    vmr, col_dry = atmos_inputs(kd, atm)
    cg = gas_ops.build_col_gas(jnp.asarray(vmr), jnp.asarray(col_dry))
    interp = gas_ops.interpolation(kd, jnp.asarray(atm["p_lay"]),
                                   jnp.asarray(atm["t_lay"]), cg)
    t1, r1 = gas_ops.tau_major_and_rayleigh(kd, interp, cg,
                                            jnp.asarray(col_dry))
    np.testing.assert_allclose(t1, gas_ops.tau_major(kd, interp), rtol=1e-12)
    np.testing.assert_allclose(
        r1, gas_ops.tau_rayleigh(kd, interp, cg, jnp.asarray(col_dry)),
        rtol=1e-12)

    kd_lw = small_kdist(True)
    interp_lw = gas_ops.interpolation(kd_lw, jnp.asarray(atm["p_lay"]),
                                      jnp.asarray(atm["t_lay"]), cg)
    t2, pf = gas_ops.tau_major_and_pfrac(kd_lw, interp_lw)
    np.testing.assert_allclose(t2, gas_ops.tau_major(kd_lw, interp_lw),
                               rtol=1e-12)
    src_a = gas_ops.planck_source(kd_lw, interp_lw,
                                  jnp.asarray(atm["t_lay"]),
                                  jnp.asarray(atm["t_lev"]),
                                  jnp.asarray(atm["t_sfc"]), sfc_lay=0,
                                  pfrac=pf)
    src_b = gas_ops.planck_source(kd_lw, interp_lw,
                                  jnp.asarray(atm["t_lay"]),
                                  jnp.asarray(atm["t_lev"]),
                                  jnp.asarray(atm["t_sfc"]), sfc_lay=0)
    np.testing.assert_allclose(src_a.lay_src, src_b.lay_src, rtol=1e-12)


@pytest.mark.slow
def test_hoisted_resolves_match_per_chunk(monkeypatch):
    """Full-spectrum weight planes (major_resolves) sliced per chunk give
    exactly the per-chunk-built planes through both fused entries."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import jax

    from helpers import small_kdist, small_atmos, atmos_inputs
    from rte_rrtmgp_tpu.ops import gas_optics as go
    from rte_rrtmgp_tpu import config as cfg

    for lw in (True, False):
        kd = small_kdist(longwave=lw)
        kd = jax.tree.map(lambda a: a.astype(np.float32)
                          if hasattr(a, "dtype") and a.dtype.kind == "f"
                          else a, kd)
        atm = small_atmos(ncol=3, nlay=5, seed=2)
        vmr, col_dry = atmos_inputs(kd, atm)
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        col_gas = go.build_col_gas(f32(vmr), f32(col_dry))
        interp = go.interpolation(kd, f32(atm["p_lay"]), f32(atm["t_lay"]),
                                  col_gas)
        monkeypatch.setenv("RTE_RRTMGP_PALLAS", "1")
        assert cfg.use_pallas()
        with pltpu.force_tpu_interpret_mode():
            res = go.major_resolves(kd, interp)
            assert res is not None
            g0 = kd.ngpt // 2
            kdc = kd.slice_gpt(g0, kd.ngpt)
            if lw:
                a1, b1 = go.tau_major_and_pfrac(kdc, interp)
                a2, b2 = go.tau_major_and_pfrac(kdc, interp, res, g0)
            else:
                a1, b1 = go.tau_major_and_rayleigh(kdc, interp, col_gas,
                                                   col_dry)
                a2, b2 = go.tau_major_and_rayleigh(kdc, interp, col_gas,
                                                   col_dry, res, g0)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-6)


def test_cellw_resolves_match_legacy_planes(monkeypatch):
    """In-kernel weight-plane resolve mode (cellw): the fused entries,
    tau_minor and standalone tau_rayleigh give the same results as the
    legacy precomputed-plane path, including chunked calls with a g-point
    offset."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import jax

    from helpers import small_kdist, small_atmos, atmos_inputs
    from rte_rrtmgp_tpu.ops import gas_optics as go
    from rte_rrtmgp_tpu import config as cfg

    monkeypatch.setenv("RTE_RRTMGP_PALLAS", "1")
    assert cfg.use_pallas()
    for lw in (True, False):
        kd = small_kdist(longwave=lw)
        kd = jax.tree.map(lambda a: a.astype(np.float32)
                          if hasattr(a, "dtype") and a.dtype.kind == "f"
                          else a, kd)
        atm = small_atmos(ncol=3, nlay=5, seed=5)
        vmr, col_dry = atmos_inputs(kd, atm)
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        col_gas = go.build_col_gas(f32(vmr), f32(col_dry))
        p, t = f32(atm["p_lay"]), f32(atm["t_lay"])
        interp = go.interpolation(kd, p, t, col_gas)
        with pltpu.force_tpu_interpret_mode():
            cw = go.cellw_resolves(kd, interp)
            assert cw is not None
            g0 = kd.ngpt // 2
            kdc = kd.slice_gpt(g0, kd.ngpt)
            if lw:
                a1, b1 = go.tau_major_and_pfrac(kdc, interp)
                a2, b2 = go.tau_major_and_pfrac(kdc, interp, g0=g0, cellw=cw)
            else:
                a1, b1 = go.tau_major_and_rayleigh(kdc, interp, col_gas,
                                                   col_dry)
                a2, b2 = go.tau_major_and_rayleigh(kdc, interp, col_gas,
                                                   col_dry, g0=g0, cellw=cw)
                r1 = go.tau_rayleigh(kdc, interp, col_gas, f32(col_dry))
                r2 = go.tau_rayleigh(kdc, interp, col_gas, f32(col_dry),
                                     cellw=cw, g0=g0)
                np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                                           rtol=2e-6, atol=1e-30)
            tau0 = jnp.zeros((3, 5, kdc.ngpt), jnp.float32)
            m1 = go.tau_minor(kdc, interp, p, t, col_gas, tau0)
            m2 = go.tau_minor(kdc, interp, p, t, col_gas, tau0, cellw=cw)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   rtol=2e-6, atol=1e-30)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                                   rtol=2e-6, atol=1e-30)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                                   rtol=2e-6, atol=1e-30)


def test_cellw_standalone_tau_major(monkeypatch):
    """tau_major(cellw=...) == the XLA row-gather path."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import jax

    from helpers import small_kdist, small_atmos, atmos_inputs
    from rte_rrtmgp_tpu.ops import gas_optics as go
    from rte_rrtmgp_tpu import config as cfg

    kd = small_kdist(longwave=True)
    kd = jax.tree.map(lambda a: a.astype(np.float32)
                      if hasattr(a, "dtype") and a.dtype.kind == "f" else a,
                      kd)
    atm = small_atmos(ncol=4, nlay=6, seed=6)
    vmr, col_dry = atmos_inputs(kd, atm)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    col_gas = go.build_col_gas(f32(vmr), f32(col_dry))
    interp = go.interpolation(kd, f32(atm["p_lay"]), f32(atm["t_lay"]),
                              col_gas)
    tau_xla = go.tau_major(kd, interp)

    monkeypatch.setenv("RTE_RRTMGP_PALLAS", "1")
    assert cfg.use_pallas()
    with pltpu.force_tpu_interpret_mode():
        cw = go.cellw_resolves(kd, interp)
        tau_cw = go.tau_major(kd, interp, cellw=cw)
    np.testing.assert_allclose(np.asarray(tau_cw), np.asarray(tau_xla),
                               rtol=3e-6, atol=1e-12)


def test_dup2_lane_merged_pair_matches_singles():
    """A dup2 op (lane-concatenated table pair sharing rows/weights/fp,
    col_mix folded into the first half) returns exactly the two
    single-table results."""
    from rte_rrtmgp_tpu.ops.pallas import interp_rows_multi, interp_rows_pallas

    rng = np.random.default_rng(7)
    N, G, R, E, T = 70, 128, 36, 9, 4
    f32 = lambda *s: rng.random(s, dtype=np.float32)
    tbl1 = jnp.asarray(f32(R, E, G))
    tbl2 = jnp.asarray(f32(R, E, G))
    rows4 = jnp.asarray(rng.integers(0, R - T - 2, (N, 1)).repeat(4, 1)
                        + np.array([0, T, 1, T + 1]), dtype=jnp.int32)
    jes = tuple(jnp.asarray(rng.integers(0, E - 1, (N, G)), jnp.int32)
                for _ in range(2))
    fms = tuple(jnp.asarray(f32(N, G)) for _ in range(4))
    fp = jnp.asarray(f32(N))
    cms = tuple(jnp.asarray(f32(N, G)) for _ in range(2))

    with pltpu.force_tpu_interpret_mode():
        (merged,) = interp_rows_multi(
            [jnp.concatenate([tbl1, tbl2], axis=2)], [rows4], jes, fms,
            [fp], [cms], metas=(((0, 0, 1, 1), True, True, True),),
            neta=E, block=32)
        s1 = interp_rows_pallas(tbl1, rows4, jes, fms, fp=fp, cms=cms,
                                neta=E, block=32)
        s2 = interp_rows_pallas(tbl2, rows4, jes, fms, fp=fp, neta=E,
                                block=32)
    np.testing.assert_allclose(np.asarray(merged[:, :G]), np.asarray(s1),
                               rtol=2e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(merged[:, G:]), np.asarray(s2),
                               rtol=2e-6, atol=1e-6)


def test_cellw_paired_halfslab_matches_plain(monkeypatch):
    """RTE_RRTMGP_PALLAS_PAIRC=1 (half-slab paired table layout, (8, G)
    eta contraction) matches the plain 16-row layout to ~1 ulp through
    every cellw production entry: merged major+planck+minor, merged
    major+rayleigh+minor, and standalone tau_rayleigh (2-corner adj).
    Not bitwise: the paired form's fm0*T[je] + fm1*T[je+1] combine
    contracts to an FMA (single rounding, the more accurate value) —
    measured 1-ulp max deltas on XLA:CPU."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import jax

    from helpers import small_kdist, small_atmos, atmos_inputs
    from rte_rrtmgp_tpu.ops import gas_optics as go
    from rte_rrtmgp_tpu import config as cfg

    monkeypatch.setenv("RTE_RRTMGP_PALLAS", "1")
    assert cfg.use_pallas()
    for lw in (True, False):
        kd = small_kdist(longwave=lw)
        kd = jax.tree.map(lambda a: a.astype(np.float32)
                          if hasattr(a, "dtype") and a.dtype.kind == "f"
                          else a, kd)
        atm = small_atmos(ncol=4, nlay=6, seed=11)
        vmr, col_dry = atmos_inputs(kd, atm)
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        col_gas = go.build_col_gas(f32(vmr), f32(col_dry))
        p, t = f32(atm["p_lay"]), f32(atm["t_lay"])
        interp = go.interpolation(kd, p, t, col_gas)
        with pltpu.force_tpu_interpret_mode():
            cw = go.cellw_resolves(kd, interp)
            assert cw is not None
            outs = {}
            for pairc in ("0", "1"):
                monkeypatch.setenv("RTE_RRTMGP_PALLAS_PAIRC", pairc)
                if lw:
                    a, b = go.tau_majmin_and_pfrac(
                        kd, interp, p, t, col_gas, cellw=cw)
                    outs[pairc] = (a, b)
                else:
                    a, b = go.tau_majmin_and_rayleigh(
                        kd, interp, p, t, col_gas, f32(col_dry), cellw=cw)
                    r = go.tau_rayleigh(kd, interp, col_gas, f32(col_dry),
                                        cellw=cw)
                    outs[pairc] = (a, b, r)
        for x0, x1 in zip(outs["0"], outs["1"]):
            np.testing.assert_allclose(np.asarray(x0), np.asarray(x1),
                                       rtol=1e-6, atol=1e-30)


def test_cellw_dup2_lane_merged_pair_matches(monkeypatch):
    """RTE_RRTMGP_PALLAS_DUP2C=1 (lane-merged kmajor|planck, in-kernel
    lane split) matches the separate-op cellw path through the LW
    production entries, with pairc both off and on.  col_mix folds into
    the first half's fm rows — one extra rounding, covered by the op
    tolerance."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import jax

    from helpers import small_kdist, small_atmos, atmos_inputs
    from rte_rrtmgp_tpu.ops import gas_optics as go
    from rte_rrtmgp_tpu import config as cfg

    monkeypatch.setenv("RTE_RRTMGP_PALLAS", "1")
    assert cfg.use_pallas()
    kd = small_kdist(longwave=True)
    kd = jax.tree.map(lambda a: a.astype(np.float32)
                      if hasattr(a, "dtype") and a.dtype.kind == "f"
                      else a, kd)
    atm = small_atmos(ncol=4, nlay=6, seed=13)
    vmr, col_dry = atmos_inputs(kd, atm)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    col_gas = go.build_col_gas(f32(vmr), f32(col_dry))
    p, t = f32(atm["p_lay"]), f32(atm["t_lay"])
    interp = go.interpolation(kd, p, t, col_gas)
    for pairc in ("0", "1"):
        monkeypatch.setenv("RTE_RRTMGP_PALLAS_PAIRC", pairc)
        with pltpu.force_tpu_interpret_mode():
            cw = go.cellw_resolves(kd, interp)
            outs = {}
            for dup2c in ("0", "1"):
                monkeypatch.setenv("RTE_RRTMGP_PALLAS_DUP2C", dup2c)
                a, b = go.tau_majmin_and_pfrac(
                    kd, interp, p, t, col_gas, cellw=cw)
                a2, b2 = go.tau_major_and_pfrac(kd, interp, cellw=cw)
                outs[dup2c] = (a, b, a2, b2)
        for x0, x1 in zip(outs["0"], outs["1"]):
            np.testing.assert_allclose(np.asarray(x0), np.asarray(x1),
                                       rtol=2e-6, atol=1e-30)


def test_cellw_mfold_in_kernel_stitch_matches(monkeypatch):
    """RTE_RRTMGP_PALLAS_MFOLD=1 (minor result folded into tau through an
    in-kernel one-hot placement matmul) matches the explicit
    (N, CT)-plane + _minor_stitch path through both merged production
    entries, chunked and unchunked.  Lane-sum reassociation on
    overlapping minor intervals is few-ulp — inside the op tolerance."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import jax

    from helpers import small_kdist, small_atmos, atmos_inputs
    from rte_rrtmgp_tpu.ops import gas_optics as go
    from rte_rrtmgp_tpu import config as cfg

    monkeypatch.setenv("RTE_RRTMGP_PALLAS", "1")
    assert cfg.use_pallas()
    for lw in (True, False):
        kd_f = small_kdist(longwave=lw)
        kd_f = jax.tree.map(lambda a: a.astype(np.float32)
                            if hasattr(a, "dtype") and a.dtype.kind == "f"
                            else a, kd_f)
        atm = small_atmos(ncol=4, nlay=6, seed=17)
        vmr, col_dry = atmos_inputs(kd_f, atm)
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        col_gas = go.build_col_gas(f32(vmr), f32(col_dry))
        p, t = f32(atm["p_lay"]), f32(atm["t_lay"])
        interp = go.interpolation(kd_f, p, t, col_gas)
        with pltpu.force_tpu_interpret_mode():
            cw = go.cellw_resolves(kd_f, interp)
            for g0 in (0, kd_f.ngpt // 2):
                kdc = kd_f.slice_gpt(g0, kd_f.ngpt)
                outs = {}
                for mfold in ("0", "1"):
                    monkeypatch.setenv("RTE_RRTMGP_PALLAS_MFOLD", mfold)
                    if lw:
                        outs[mfold] = go.tau_majmin_and_pfrac(
                            kdc, interp, p, t, col_gas, g0=g0, cellw=cw)
                    else:
                        outs[mfold] = go.tau_majmin_and_rayleigh(
                            kdc, interp, p, t, col_gas, f32(col_dry),
                            g0=g0, cellw=cw)
                for x0, x1 in zip(outs["0"], outs["1"]):
                    np.testing.assert_allclose(
                        np.asarray(x0), np.asarray(x1),
                        rtol=2e-6, atol=1e-30)


def test_cellw_kernel_lowers_for_tpu():
    """Cross-lower the cellw kernel for the TPU platform via jax.export:
    the Pallas -> Mosaic frontend runs at lowering time on the host, so
    shape/alignment regressions surface here without TPU hardware (the
    backend binary compile still happens on-device)."""
    import sys

    from jax import export
    from rte_rrtmgp_tpu.ops.pallas import interp_cellw_multi

    # Lowering the unrolled kernel under pytest's already-deep call stack
    # can trip the default recursion limit.
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(20000)
    rng = np.random.default_rng(0)
    N, G, R, E, F = 64, 128, 36, 9, 9
    P = 2 * F
    tbl = jnp.asarray(rng.random((R, E, G), np.float32))
    rows = jnp.asarray(rng.integers(0, R, (N, 4)), jnp.int32)
    rows2 = jnp.asarray(rng.integers(0, R, (N, 2)), jnp.int32)
    V = jnp.asarray(rng.random((N * 8, P), np.float32))
    M2 = jnp.asarray(rng.random((P, G), np.float32))
    fp = jnp.asarray(rng.random((N,), np.float32))
    sc = jnp.asarray(rng.random((N, 3), np.float32))
    msc = jnp.asarray(rng.random((3, G), np.float32))

    def f(tbl, rows, V, M2, fp):
        return interp_cellw_multi(
            [tbl, tbl], [rows, rows], V, M2, fp,
            metas=(((0, 0, 1, 1), True, True), ((0, 0, 1, 1), True, False)),
            neta=E, block=32, unroll=8)

    def g(tbl, rows2, V, M2, sc, msc):
        return interp_cellw_multi(
            [tbl], [rows2], V, M2, None, metas=(((0, 1), False, False),),
            neta=E, block=32, unroll=8, sc=sc, msc=msc)

    # The production path is x32; the test conftest enables x64, under
    # which export recursion explodes — lower in x32 like production.
    with jax.enable_x64(False):
        e = export.export(jax.jit(f), platforms=["tpu"])(tbl, rows, V, M2,
                                                         fp)
        assert [tuple(o.shape) for o in e.out_avals] == [(N, G), (N, G)]
        e2 = export.export(jax.jit(g), platforms=["tpu"])(tbl, rows2, V, M2,
                                                          sc, msc)
        assert [tuple(o.shape) for o in e2.out_avals] == [(N, G)]

        # Merged form: per-op mask matrices + scaling on the last op only
        # (the major+rayleigh+minor single-pass shape).
        CT = 96
        tblm = jnp.asarray(rng.random((12, E, CT), np.float32))
        M2m = jnp.asarray(rng.random((P, CT), np.float32))
        mscm = jnp.asarray(rng.random((3, CT), np.float32))

        def h(tbl, tblm, rows, rows2, V, M2, M2m, fp, sc, mscm):
            return interp_cellw_multi(
                [tbl, tbl, tblm], [rows, rows2, rows2], V, [M2, M2m], fp,
                metas=(((0, 0, 1, 1), True, True, 0),
                       ((0, 1), False, False, 0),
                       ((0, 1), False, False, 1)),
                neta=E, block=32, unroll=8, sc=sc, msc=mscm, sc_ops=(2,))

        e3 = export.export(jax.jit(h), platforms=["tpu"])(
            tbl, tblm, rows, rows2, V, M2, M2m, fp, sc, mscm)
        assert [tuple(o.shape) for o in e3.out_avals] == [(N, G), (N, G),
                                                          (N, CT)]

        # Paired half-slab layout with the production adjacent-corner
        # metas (the PAIRC mode's exact lowering shape).
        def hp(tbl, tblm, rows, rows2, V, M2, M2m, fp, sc, mscm):
            return interp_cellw_multi(
                [tbl, tbl, tblm], [rows, rows2, rows2], V, [M2, M2m], fp,
                metas=(((0, 0, 1, 1), True, True, 0, True),
                       ((0, 1), False, False, 0, True),
                       ((0, 1), False, False, 1, True)),
                neta=E, block=32, unroll=8, sc=sc, msc=mscm, sc_ops=(2,),
                paired=True)

        e4 = export.export(jax.jit(hp), platforms=["tpu"])(
            tbl, tblm, rows, rows2, V, M2, M2m, fp, sc, mscm)
        assert [tuple(o.shape) for o in e4.out_avals] == [(N, G), (N, G),
                                                          (N, CT)]

        # dup2 lane-merged pair (two outputs from one (R, E, 2G) table),
        # with and without the paired half-slab layout.
        tbl2 = jnp.concatenate([tbl, tbl], axis=2)

        def hd(tbl2, tblm, rows, rows2, V, M2, M2m, fp, sc, mscm, paired):
            return interp_cellw_multi(
                [tbl2, tblm], [rows, rows2], V, [M2, M2m], fp,
                metas=(((0, 0, 1, 1), True, True, 0, True, True),
                       ((0, 1), False, False, 1, True)),
                neta=E, block=32, unroll=8, sc=sc, msc=mscm, sc_ops=(1,),
                paired=paired)

        for paired in (False, True):
            e5 = export.export(
                jax.jit(functools.partial(hd, paired=paired)),
                platforms=["tpu"])(tbl2, tblm, rows, rows2, V, M2, M2m,
                                   fp, sc, mscm)
            assert [tuple(o.shape) for o in e5.out_avals] == [
                (N, G), (N, G), (N, CT)]

        # In-kernel minor fold: the CT op vanishes from the outputs and
        # accumulates into op 0 through the placement matmul.
        mplace = jnp.asarray(rng.random((CT, G), np.float32))

        def hm(tbl, tblm, rows, rows2, V, M2, M2m, fp, sc, mscm, mplace):
            return interp_cellw_multi(
                [tbl, tbl, tblm], [rows, rows2, rows2], V, [M2, M2m], fp,
                metas=(((0, 0, 1, 1), True, True, 0, True),
                       ((0, 1), False, False, 0, True),
                       ((0, 1), False, False, 1, True)),
                neta=E, block=32, unroll=8, sc=sc, msc=mscm, sc_ops=(2,),
                paired=True, mfold=(2, 0), mplace=mplace)

        e6 = export.export(jax.jit(hm), platforms=["tpu"])(
            tbl, tblm, rows, rows2, V, M2, M2m, fp, sc, mplace=mplace,
            mscm=mscm)
        assert [tuple(o.shape) for o in e6.out_avals] == [(N, G), (N, G)]
    sys.setrecursionlimit(old_limit)


def test_merged_minor_pass_matches_two_pass(monkeypatch):
    """tau_majmin_and_{pfrac,rayleigh} (one kernel epoch: major tables +
    the minor contributor axis with in-kernel scaling, per-op mask
    matrices) == the two-pass form, chunked and unchunked."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import jax

    from helpers import small_kdist, small_atmos, atmos_inputs
    from rte_rrtmgp_tpu.ops import gas_optics as go
    from rte_rrtmgp_tpu import config as cfg

    monkeypatch.setenv("RTE_RRTMGP_PALLAS", "1")
    assert cfg.use_pallas() and go.merge_minor_enabled()
    for lw in (True, False):
        kd = small_kdist(longwave=lw)
        kd = jax.tree.map(lambda a: a.astype(np.float32)
                          if hasattr(a, "dtype") and a.dtype.kind == "f"
                          else a, kd)
        atm = small_atmos(ncol=3, nlay=5, seed=8)
        vmr, col_dry = atmos_inputs(kd, atm)
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        col_gas = go.build_col_gas(f32(vmr), f32(col_dry))
        p, t = f32(atm["p_lay"]), f32(atm["t_lay"])
        interp = go.interpolation(kd, p, t, col_gas)
        with pltpu.force_tpu_interpret_mode():
            cw = go.cellw_resolves(kd, interp)
            assert cw is not None
            for g0, g1 in ((0, kd.ngpt), (kd.ngpt // 2, kd.ngpt)):
                kdc = kd.slice_gpt(g0, g1)
                if lw:
                    a2, b2 = go.tau_majmin_and_pfrac(
                        kdc, interp, p, t, col_gas, g0=g0, cellw=cw)
                    ta, pf = go.tau_major_and_pfrac(kdc, interp, g0=g0,
                                                    cellw=cw)
                    a1 = go.tau_minor(kdc, interp, p, t, col_gas, ta,
                                      cellw=cw)
                    b1 = pf
                else:
                    a2, b2 = go.tau_majmin_and_rayleigh(
                        kdc, interp, p, t, col_gas, f32(col_dry), g0=g0,
                        cellw=cw)
                    ta, b1 = go.tau_major_and_rayleigh(
                        kdc, interp, col_gas, f32(col_dry), g0=g0, cellw=cw)
                    a1 = go.tau_minor(kdc, interp, p, t, col_gas, ta,
                                      cellw=cw)
                np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                           rtol=2e-6, atol=1e-30)
                np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                                           rtol=2e-6, atol=1e-30)
