"""Loader proof against the one real coefficient file shipped in this image.

``/root/reference/data/aerosol_optics.nc`` is the genuine CAMS aerosol
optics file (HDF5/NetCDF-4) that the reference loads in
``src_test/Radiation_solver.cpp:331-366``.  Everything else in the repo's
test suite runs against self-generated synthetic files, so this is the only
place where schema drift against real-world files would surface.
"""

import os

import numpy as np
import pytest

from rte_rrtmgp_tpu.models.aerosol_lut import AerosolLUT, AEROSOL_SPECIES

REAL_AEROSOL = "/root/reference/data/aerosol_optics.nc"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REAL_AEROSOL), reason="real aerosol file not present")


@pytest.fixture(scope="module")
def lut():
    return AerosolLUT.from_netcdf(REAL_AEROSOL, dtype=np.float64)


def test_real_file_schema(lut):
    # Dimensions per the reference loader (Radiation_solver.cpp:338-341):
    # band_sw=14, relative_humidity=12, hydrophilic=7, hydrophobic=14.
    assert lut.mext_phobic.shape == (14, 14)      # (nbnd, nphobic)
    assert lut.ssa_phobic.shape == (14, 14)
    assert lut.g_phobic.shape == (14, 14)
    assert lut.mext_philic.shape == (14, 12, 7)   # (nbnd, nhum, nphilic)
    assert lut.ssa_philic.shape == (14, 12, 7)
    assert lut.g_philic.shape == (14, 12, 7)
    assert lut.rh_upper.shape == (12,)
    assert lut.nhum == 12 and lut.nbnd == 14


def test_real_file_values_physical(lut):
    # Mass extinction strictly positive; ssa/g in physical ranges.
    assert np.all(lut.mext_phobic > 0) and np.all(lut.mext_philic > 0)
    assert np.all((lut.ssa_phobic >= 0) & (lut.ssa_phobic <= 1))
    assert np.all((lut.ssa_philic >= 0) & (lut.ssa_philic <= 1))
    assert np.all(np.abs(lut.g_phobic) < 1)
    assert np.all(np.abs(lut.g_philic) < 1)
    # rh class upper bounds ascending, ending at/above saturation.
    assert np.all(np.diff(lut.rh_upper) > 0)
    assert lut.rh_upper[-1] >= 1.0
    # Hydrophilic growth: sea salt (SS1, philic col 0) extinction should
    # increase monotonically-ish with humidity class in the visible band.
    ss1 = lut.mext_philic[9, :, 0]
    assert ss1[-1] > ss1[0]


def test_species_indices_within_real_tables(lut):
    for spec in AEROSOL_SPECIES:
        ntab = lut.mext_philic.shape[2] if spec.philic \
            else lut.mext_phobic.shape[1]
        assert 0 <= spec.table_idx < ntab, spec


def test_aerosol_optics_compute_on_real_lut(lut):
    """End-to-end: the aerosol op on the real LUT produces physical optics
    of the right magnitude (CAMS climatological mmr ~1e-9..1e-8 kg/kg gives
    tau ~1e-4..1e-1 per layer)."""
    import jax.numpy as jnp

    from rte_rrtmgp_tpu.ops.aerosol_optics import aerosol_optics_2str

    rng = np.random.default_rng(0)
    ncol, nlay = 4, 10
    plev = np.linspace(101325.0, 10000.0, nlay + 1)[None, :].repeat(ncol, 0)
    rh = rng.uniform(0.1, 0.99, (ncol, nlay))
    aermr = rng.uniform(0.0, 1e-8, (ncol, nlay, len(AEROSOL_SPECIES)))

    op = aerosol_optics_2str(lut, jnp.asarray(aermr), jnp.asarray(rh),
                             jnp.asarray(plev))
    tau = np.asarray(op.tau)
    ssa = np.asarray(op.ssa)
    g = np.asarray(op.g)
    assert tau.shape == (ncol, nlay, 14)
    assert np.all(tau >= 0) and np.all(np.isfinite(tau))
    assert tau.max() > 1e-6, "real mext should give non-negligible tau"
    assert np.all((ssa >= 0) & (ssa <= 1))
    assert np.all(np.abs(g) < 1)


def test_rh_classing_matches_reference_semantics(lut):
    """rh_class (src/Aerosol_optics.cpp:26-36) returns the first class whose
    upper bound is >= rh; verify our searchsorted against a direct loop."""
    from rte_rrtmgp_tpu.ops.aerosol_optics import aerosol_optics_2str  # noqa: F401

    rhs = np.concatenate([[0.0], lut.rh_upper - 1e-9, lut.rh_upper,
                          [lut.rh_upper[-1] + 1.0]])
    got = np.searchsorted(lut.rh_upper, rhs, side="left")
    got = np.clip(got, 0, lut.nhum - 1)
    for rh, ih in zip(rhs, got):
        expect = next((i for i, ub in enumerate(lut.rh_upper) if ub >= rh),
                      lut.nhum - 1)
        assert ih == expect
