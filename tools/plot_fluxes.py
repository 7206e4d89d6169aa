"""Plot flux profiles from a solver output NetCDF — the analog of the
reference's ``allsky/allsky_plot.py`` (same panels: sw dn / sw dir / sw up /
lw dn / lw up vs pressure), optionally overlaying a second file for
comparison.

Usage: python tools/plot_fluxes.py rte_rrtmgp_output.nc [reference.nc]
       [--input rte_rrtmgp_input.nc] [--out fluxes.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


VARS = ("sw_flux_dn", "sw_flux_dn_dir", "sw_flux_up",
        "lw_flux_dn", "lw_flux_up")


def main():
    from rte_rrtmgp_tpu import config

    config.respect_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("run", help="solver output NetCDF")
    p.add_argument("ref", nargs="?", default=None,
                   help="optional second file to overlay (dashed)")
    p.add_argument("--input", default="rte_rrtmgp_input.nc",
                   help="input file holding p_lev (falls back to level "
                        "index if absent)")
    p.add_argument("--out", default="fluxes.png")
    args = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from rte_rrtmgp_tpu.utils.ncio import NcReader

    def read_all(path):
        out = {}
        with NcReader(path) as nc:
            for v in VARS:
                try:
                    out[v] = np.asarray(nc.read(v))
                except Exception:
                    pass
        return out

    run = read_all(args.run)
    ref = read_all(args.ref) if args.ref else {}
    if not run:
        raise SystemExit(f"no flux variables {VARS} in {args.run}")

    nlev = next(iter(run.values())).shape[1]
    try:
        with NcReader(args.input) as nc:
            y = np.asarray(nc.read("p_lev")).reshape(-1, nlev)[0] / 1e3
        ylabel = "p (kPa)"
    except Exception:
        y = np.arange(nlev)
        ylabel = "level"

    names = [v for v in VARS if v in run]
    fig, axes = plt.subplots(1, len(names), figsize=(3.2 * len(names), 5),
                             sharey=True)
    axes = np.atleast_1d(axes)
    for ax, v in zip(axes, names):
        ax.plot(run[v].mean(axis=0), y, "C0-", label=os.path.basename(args.run))
        if v in ref:
            ax.plot(ref[v].mean(axis=0), y, "k--",
                    label=os.path.basename(args.ref))
        ax.set_title(v, fontsize=9)
        ax.set_xlabel("W m$^{-2}$")
    if ylabel.startswith("p"):
        axes[0].invert_yaxis()
    axes[0].set_ylabel(ylabel)
    axes[0].legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out} ({len(names)} panels, column-mean profiles)")


if __name__ == "__main__":
    main()
