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


@pytest.mark.slow
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


@pytest.mark.slow
def test_cli_bw_cloud_cam(tmp_path_factory, monkeypatch):
    """Backward-renderer CLI with --cloud-cam: camera images + per-pixel
    cloud-path outputs are written and finite."""
    from rte_rrtmgp_tpu.cli_bw import main as bw_main
    from rte_rrtmgp_tpu.tools.set_virtual_camera import main as cam_main

    d = tmp_path_factory.mktemp("bwcam")
    make_case_files(str(d), "allsky", gpt_per_band=2)
    monkeypatch.chdir(d)

    # Rewrite the input with a 3D grid + camera (allsky case is 24x1 cols).
    import rte_rrtmgp_tpu.cases.inputs as ci
    from rte_rrtmgp_tpu.cases.profiles import make_atmosphere

    atm = make_atmosphere(4 * 6, 16, seed=11)
    ci.write_input_nc("rte_rrtmgp_input.nc", atm, n_col_x=6, n_col_y=4,
                      rt_grid={"nz": 8})
    cam_main(["--name", "rte_rrtmgp_input.nc", "--toa", "--nx", "6",
              "--ny", "4"])

    rc = bw_main(["--broadband", "--bw-raytracing", "4", "--cloud-optics",
                  "--cloud-cam", "--gpt-chunk", "8"])
    assert rc == 0
    with NcReader("rte_rrtmgp_output.nc") as nc:
        rad = nc.read("radiance")
        assert rad.shape == (4, 6) and np.isfinite(rad).all()
        liwp = nc.read("liq_ice_wp_cam")
        tauc = nc.read("tau_cld_cam")
        dist = nc.read("dist_cld_cam")
        assert np.isfinite(liwp).all() and liwp.max() > 0
        assert np.isfinite(tauc).all()
        assert (dist[liwp > 0] >= 0).all()


@pytest.mark.slow
def test_cli_rt_tica(tmp_path_factory, monkeypatch):
    """3D rt CLI with --tica: tilt+compress keeps the original layer count
    (the tilted solve runs the same grid size), output comes back on the
    untilted grid, and by-band rt fluxes sum to broadband."""
    from rte_rrtmgp_tpu.cli_rt import main as rt_main

    d = tmp_path_factory.mktemp("rt_tica")
    make_case_files(str(d), "allsky", gpt_per_band=2)
    monkeypatch.chdir(d)

    import rte_rrtmgp_tpu.cases.inputs as ci
    from rte_rrtmgp_tpu.cases.profiles import make_atmosphere

    atm = make_atmosphere(4 * 4, 20, seed=13)
    ci.write_input_nc("rte_rrtmgp_input.nc", atm, n_col_x=4, n_col_y=4,
                      rt_grid={"nz": 10, "sza": 0.35})

    rc = rt_main(["--raytracing", "8", "--two-stream", "--cloud-optics",
                  "--tica", "--output-bnd-fluxes", "--gpt-chunk", "8"])
    assert rc == 0
    with NcReader("rte_rrtmgp_output.nc") as nc:
        sfc = nc.read("rt_flux_sfc_dir")
        assert sfc.shape == (4, 4) and np.isfinite(sfc).all()
        # Extra TOD cell above the 10 in-domain layers.
        abs_dir = nc.read("rt_flux_abs_dir")
        assert abs_dir.shape == (11, 4, 4)
        # Two-stream output is on the UNTILTED grid (20 layers = 21 levels).
        sw_dn = nc.read("sw_flux_dn")
        assert sw_dn.shape == (21, 4, 4) and np.isfinite(sw_dn).all()
        bnd = nc.read("rt_bnd_flux_sfc_dir")
        np.testing.assert_allclose(bnd.sum(0), sfc, rtol=2e-5, atol=1e-4)


@pytest.mark.slow
def test_cli_rt_gpt_per_dispatch(tmp_path_factory, monkeypatch):
    """--gpt-per-dispatch (watchdog-safe windowed MC) matches the
    single-dispatch run exactly through the CLI."""
    from rte_rrtmgp_tpu.cli_rt import main as rt_main

    d = tmp_path_factory.mktemp("rt_win")
    make_case_files(str(d), "allsky", gpt_per_band=2)
    monkeypatch.chdir(d)

    import rte_rrtmgp_tpu.cases.inputs as ci
    from rte_rrtmgp_tpu.cases.profiles import make_atmosphere

    atm = make_atmosphere(4 * 4, 16, seed=21)
    ci.write_input_nc("rte_rrtmgp_input.nc", atm, n_col_x=4, n_col_y=4,
                      rt_grid={"nz": 8, "sza": 0.4})

    assert rt_main(["--raytracing", "8", "--output", "one.nc"]) == 0
    assert rt_main(["--raytracing", "8", "--gpt-per-dispatch", "5",
                    "--output", "win.nc"]) == 0
    assert rt_main(["--raytracing", "8", "--gpt-per-dispatch", "5",
                    "--spectral-mode", "lanes",
                    "--output", "lanes.nc"]) == 0
    with NcReader("one.nc") as a, NcReader("win.nc") as b, \
            NcReader("lanes.nc") as c:
        for v in ("rt_flux_sfc_dir", "rt_flux_abs_dir"):
            np.testing.assert_allclose(a.read(v), b.read(v), rtol=2e-6,
                                       atol=1e-6, err_msg=v)
            np.testing.assert_allclose(a.read(v), c.read(v), rtol=2e-5,
                                       atol=1e-5, err_msg=v + " (lanes)")


@pytest.mark.slow
def test_cli_bw_nee_and_dispatch_flags(tmp_path_factory, monkeypatch):
    """cli_bw --nee-mode field --steps-per-dispatch 2 renders finite
    radiance (the fast-preview estimator + watchdog-safe chunking)."""
    from rte_rrtmgp_tpu.cli_bw import main as bw_main
    from rte_rrtmgp_tpu.tools.set_virtual_camera import main as cam_main

    d = tmp_path_factory.mktemp("bw_flags")
    make_case_files(str(d), "allsky", gpt_per_band=1)
    monkeypatch.chdir(d)

    import rte_rrtmgp_tpu.cases.inputs as ci
    from rte_rrtmgp_tpu.cases.profiles import make_atmosphere

    atm = make_atmosphere(4 * 4, 12, seed=22)
    ci.write_input_nc("rte_rrtmgp_input.nc", atm, n_col_x=4, n_col_y=4,
                      rt_grid={"nz": 6, "sza": 0.5})
    cam_main(["--name", "rte_rrtmgp_input.nc", "--toa", "--nx", "4",
              "--ny", "4"])

    rc = bw_main(["--broadband", "--bw-raytracing", "8",
                  "--nee-mode", "field", "--steps-per-dispatch", "2"])
    assert rc == 0
    with NcReader("rte_rrtmgp_output.nc") as nc:
        rad = nc.read("radiance")
        assert rad.shape == (4, 4) and np.isfinite(rad).all()

    rc = bw_main(["--broadband", "--bw-raytracing", "8",
                  "--spectral-mode", "lanes", "--steps-per-dispatch", "2",
                  "--output", "lanes.nc"])
    assert rc == 0
    with NcReader("lanes.nc") as nc:
        rad_l = nc.read("radiance")
        assert rad_l.shape == (4, 4) and np.isfinite(rad_l).all()
