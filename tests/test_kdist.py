"""KDist construction: raw -> pytree invariants and NetCDF round trip."""

import numpy as np
import pytest

from rte_rrtmgp_tpu.data import synthetic
from rte_rrtmgp_tpu.models.kdist import KDist

from helpers import GASES, small_kdist


@pytest.mark.parametrize("longwave", [True, False])
def test_from_raw_structure(longwave):
    kd = small_kdist(longwave)
    nbnd = 16 if longwave else 14
    assert kd.nbnd == nbnd
    assert kd.ngpt == nbnd * 4
    assert kd.ngas == len(GASES)
    assert kd.source_is_internal == longwave
    assert kd.has_rayleigh == (not longwave)

    # flavors reference valid col_gas indices (0..ngas).
    for g1, g2 in kd.flavor:
        assert 0 <= g1 <= kd.ngas and 0 <= g2 <= kd.ngas
    # gpoint_flavor covers every gpt with a valid flavor.
    for row in kd.gpoint_flavor:
        assert len(row) == kd.ngpt
        assert all(0 <= f < kd.nflav for f in row)
    # band map is consistent.
    for ib, (g0, g1) in enumerate(kd.band_lims_gpt):
        assert all(kd.gpt2band[g] == ib for g in range(g0, g1))
    # minor specs: contiguous kminor rows, valid gas indices.
    for specs, kminor in ((kd.minor_lower, kd.kminor_lower),
                          (kd.minor_upper, kd.kminor_upper)):
        total = sum(s.gpt_end - s.gpt_start for s in specs)
        assert kminor.shape[0] == total
        for s in specs:
            assert 1 <= s.idx_minor <= kd.ngas
            assert 0 <= s.idx_scaling <= kd.ngas


def test_gas_reduction_drops_minor():
    """Dropping 'co' from available gases must remove its minor intervals and
    compact the kminor table."""
    raw = synthetic.make_kdist_raw(True, gpt_per_band=4)
    full = KDist.from_raw(raw, GASES, dtype=np.float64)
    sub = KDist.from_raw(raw, [g for g in GASES if g != "co"], dtype=np.float64)
    assert sub.ngas == full.ngas - 1
    assert len(sub.minor_lower) == len(full.minor_lower) - 1
    assert sub.kminor_lower.shape[0] < full.kminor_lower.shape[0]
    # kminor rows for kept intervals must be identical.
    kept = [s for s in full.minor_lower if s.idx_minor != full.gas_names.index("co") + 1]
    for s_new, s_old in zip(sub.minor_lower, kept):
        ng = s_old.gpt_end - s_old.gpt_start
        np.testing.assert_array_equal(
            np.asarray(sub.kminor_lower[s_new.kminor_start:s_new.kminor_start + ng]),
            np.asarray(full.kminor_lower[s_old.kminor_start:s_old.kminor_start + ng]))


def test_missing_key_gas_raises():
    raw = synthetic.make_kdist_raw(True, gpt_per_band=4)
    with pytest.raises(ValueError):
        KDist.from_raw(raw, ["co2", "o3", "h2o"], dtype=np.float64)  # no ch4 (key)


@pytest.mark.parametrize("longwave", [True, False])
def test_netcdf_roundtrip(longwave, tmp_path):
    raw = synthetic.make_kdist_raw(longwave, gpt_per_band=4)
    path = str(tmp_path / "coef.nc")
    synthetic.write_kdist_nc(path, raw)
    kd_mem = KDist.from_raw(raw, GASES, dtype=np.float64)
    kd_file = KDist.from_netcdf(path, GASES, dtype=np.float64)

    np.testing.assert_allclose(np.asarray(kd_file.kmajor), np.asarray(kd_mem.kmajor))
    np.testing.assert_allclose(np.asarray(kd_file.vmr_ref), np.asarray(kd_mem.vmr_ref))
    assert kd_file.flavor == kd_mem.flavor
    assert kd_file.minor_lower == kd_mem.minor_lower
    assert kd_file.band_lims_gpt == kd_mem.band_lims_gpt
    if longwave:
        np.testing.assert_allclose(np.asarray(kd_file.totplnk), np.asarray(kd_mem.totplnk))
    else:
        np.testing.assert_allclose(np.asarray(kd_file.solar_source),
                                   np.asarray(kd_mem.solar_source))


def test_totplnk_is_physical():
    """pi * sum over bands of totplnk(T) ~= sigma T^4 (the synthetic Planck
    table is a real band integration — basis of the energy conservation
    system tests)."""
    kd = small_kdist(True)
    tp = np.asarray(kd.totplnk)
    temps = np.linspace(kd.temp_ref_min, kd.temp_ref_max, tp.shape[0])
    sigma = 5.670374419e-8
    total = np.pi * tp.sum(axis=1)
    # Bands 10-3250 cm-1 capture >99% of Planck emission at cold temps and
    # >95% at 355 K.
    ratio = total / (sigma * temps ** 4)
    assert ratio.min() > 0.93 and ratio.max() < 1.001


def test_solar_variability():
    kd = small_kdist(False)
    kd2 = kd.with_solar_variability(0.2, 0.005)
    assert not np.allclose(np.asarray(kd2.solar_source), np.asarray(kd.solar_source))
    tsi = kd.total_solar_irradiance()
    assert abs(tsi - 1361.0) < 1.0
