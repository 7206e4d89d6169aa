"""Frozen-golden regression gate (reference: rfmip/check_rfmip.sh:4-5).

Compares the current production f64 fluxes against NetCDF fixtures frozen
in tests/goldens/ at the reference CI threshold of 5.8e-2 W m-2 max abs
diff.  Unlike the oracle tests (which regenerate both sides per run), the
golden side is a committed artifact: a refactor that shifts the physics
cannot silently move both sides together.
"""

import os

import numpy as np
import pytest

import golden_case
from rte_rrtmgp_tpu.utils.ncio import NcReader

pytestmark = pytest.mark.slow

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "goldens")
GOLDEN = os.path.join(GOLDEN_DIR, "fluxes_f64.nc")
GOLDEN_RT = os.path.join(GOLDEN_DIR, "rt_f32.nc")
GOLDEN_BW = os.path.join(GOLDEN_DIR, "bw_f32.nc")


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="golden fixture missing (run tests/make_goldens.py)")
def test_fluxes_match_frozen_goldens():
    got = golden_case.solve_case()
    with NcReader(GOLDEN) as nc:
        missing = [k for k in got if not nc.has(k)]
        assert not missing, f"golden file lacks {missing} — re-baseline?"
        worst = {}
        for name, arr in got.items():
            ref = nc.read(name)
            assert ref.shape == arr.shape, name
            worst[name] = float(np.abs(arr - ref).max())
    report = ", ".join(f"{k}={v:.2e}" for k, v in sorted(worst.items()))
    assert max(worst.values()) <= golden_case.THRESHOLD_WM2, report


def _check_against(path, got, rtol, atol):
    with NcReader(path) as nc:
        missing = [k for k in got if not nc.has(k)]
        assert not missing, f"golden file lacks {missing} — re-baseline?"
        for name, arr in got.items():
            ref = nc.read(name)
            assert ref.shape == arr.shape, name
            np.testing.assert_allclose(arr, ref, rtol=rtol, atol=atol,
                                       err_msg=name)


@pytest.mark.skipif(not os.path.exists(GOLDEN_RT),
                    reason="rt golden missing (run tests/make_goldens.py)")
def test_rt_mc_fluxes_match_frozen_goldens():
    """Fixed-seed forward-MC flux maps vs the frozen fixture: tracer
    refactors are regression-gated the way the solver path already is
    (VERDICT r2 item 8).  Red if a tracer constant is perturbed — the
    tolerance is orders of magnitude below any physics change."""
    _check_against(GOLDEN_RT, golden_case.solve_rt_case(),
                   golden_case.MC_RTOL, golden_case.MC_ATOL)


@pytest.mark.skipif(not os.path.exists(GOLDEN_BW),
                    reason="bw golden missing (run tests/make_goldens.py)")
def test_bw_render_matches_frozen_goldens():
    """Fixed-seed camera radiance/XYZ image vs the frozen fixture."""
    _check_against(GOLDEN_BW, golden_case.solve_bw_case(),
                   golden_case.MC_RTOL, golden_case.MC_ATOL)
