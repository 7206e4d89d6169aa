"""CLI driver: case generation -> solve -> NetCDF output round trip."""

import os

import numpy as np
import pytest

from rte_rrtmgp_tpu.cases.inputs import make_case_files
from rte_rrtmgp_tpu.cases.check import compare
from rte_rrtmgp_tpu.cli import main as cli_main
from rte_rrtmgp_tpu.utils.ncio import NcReader


@pytest.fixture(scope="module")
def allsky_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("allsky")
    make_case_files(str(d), "allsky", gpt_per_band=4)
    return d


def test_cli_allsky_cloudy(allsky_dir, monkeypatch):
    monkeypatch.chdir(allsky_dir)
    rc = cli_main(["--cloud-optics", "--delta-cloud", "--output-bnd-fluxes",
                   "--gpt-chunk", "16", "--precision", "float64"])
    assert rc == 0
    with NcReader(str(allsky_dir / "rte_rrtmgp_output.nc")) as nc:
        lw_up = nc.read("lw_flux_up")          # (lev, y, x)
        assert lw_up.shape == (73, 1, 24)
        assert np.isfinite(lw_up).all()
        # Surface (lev 0 for this profile) upward LW near sigma*T^4.
        assert 300 < lw_up[0].mean() < 500
        sw_bnd = nc.read("sw_bnd_flux_dn")     # (band_sw, lev, y, x)
        sw_dn = nc.read("sw_flux_dn")
        np.testing.assert_allclose(sw_bnd.sum(axis=0), sw_dn, rtol=1e-10)
        assert nc.read("lw_band_lims_wvn").shape == (16, 2)
    # Self-comparison through the checker passes trivially.
    out = str(allsky_dir / "rte_rrtmgp_output.nc")
    assert compare(out, out, verbose=False)


def test_cli_optical_output(allsky_dir, monkeypatch):
    monkeypatch.chdir(allsky_dir)
    rc = cli_main(["--no-shortwave", "--no-fluxes", "--output-optical",
                   "--precision", "float64"])
    assert rc == 0
    with NcReader(str(allsky_dir / "rte_rrtmgp_output.nc")) as nc:
        tau = nc.read("lw_tau")                # (gpt_lw, lay, y, x)
        assert tau.shape == (64, 72, 1, 24)
        assert tau.min() >= 0 and np.isfinite(tau).all()
        assert nc.read("sfc_source").shape == (64, 1, 24)
        assert not nc.has("lw_flux_up")


def test_checker_detects_differences(allsky_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(allsky_dir)
    cli_main(["--no-shortwave", "--precision", "float64",
              "--output", str(tmp_path / "a.nc")])
    cli_main(["--no-shortwave", "--cloud-optics", "--precision", "float64",
              "--output", str(tmp_path / "b.nc")])
    assert compare(str(tmp_path / "a.nc"), str(tmp_path / "a.nc"), verbose=False)
    assert not compare(str(tmp_path / "a.nc"), str(tmp_path / "b.nc"),
                       verbose=False)
