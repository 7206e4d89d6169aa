"""Standalone forward ray tracer on prescribed optical fields.

Equivalent of ``test_rt_lite`` (``src_test/test_rt_lite.cu``): reads
``rt_lite_input.nc`` (tot/cld/aer tau, ssa, asy per (lay, y, x); albedo;
sza/azi; tod_direct; ngrid_x/y/z null-collision grid dims) — no gas optics —
traces photons, writes the ray-traced fluxes.

Usage: python -m rte_rrtmgp_tpu.cli_rt_lite [--raytracing N] [--independent-column]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from .models import raytracer as rt
from .utils import status
from .utils.ncio import NcReader, NcWriter


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="rt_lite")
    p.add_argument("--raytracing", type=int, default=32,
                   help="photons per pixel")
    p.add_argument("--independent-column", action="store_true")
    p.add_argument("--input", default="rt_lite_input.nc")
    p.add_argument("--output", default="rt_lite_output.nc")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    status.print_message("Reading optical input data from NetCDF.")
    nc = NcReader(args.input)
    nx, ny = nc.dim("x"), nc.dim("y")
    nz = nc.dim("z")
    grid_x = nc.read("x")
    grid_y = nc.read("y")
    grid_z = nc.read("z")
    dx = float(grid_x[1] - grid_x[0]) if nx > 1 else float(2 * grid_x[0])
    dy = float(grid_y[1] - grid_y[0]) if ny > 1 else float(2 * grid_y[0])
    dz = float(grid_z[1] - grid_z[0]) if nz > 1 else float(2 * grid_z[0])
    kn_grid = (int(nc.read_scalar("ngrid_z")), int(nc.read_scalar("ngrid_y")),
               int(nc.read_scalar("ngrid_x")))

    def field(name):  # (lay/z, y, x), keep only the domain's nz cells
        return jnp.asarray(nc.read(name)[:nz], jnp.float32)

    tot_tau, tot_ssa, tot_asy = map(field, ("tot_tau", "tot_ssa", "tot_asy"))
    cld_tau, cld_ssa, cld_asy = map(field, ("cld_tau", "cld_ssa", "cld_asy"))
    aer_tau, aer_ssa, aer_asy = map(field, ("aer_tau", "aer_ssa", "aer_asy"))

    albedo = jnp.asarray(nc.read("albedo"), jnp.float32)
    sza = nc.read_scalar("sza")
    azi = nc.read_scalar("azi")
    tod_dir = nc.read_scalar("tod_direct")
    tod_dif = nc.read_scalar("tod_diffuse") if nc.has("tod_diffuse") else 0.0
    nc.close()

    k = rt.bundle_optical_props(tot_tau, tot_ssa, cld_tau, cld_ssa, cld_asy,
                                aer_tau, aer_ssa, aer_asy, dz)
    sun = rt.sun_direction_from_angles(sza, azi)

    status.print_message(f"Tracing {args.raytracing} photons per pixel.")
    out = rt.trace_rays(
        jax.random.PRNGKey(args.seed), k[0], k[1], k[2], k[3], k[4], k[5],
        None, albedo, kn_grid, (dz, dy, dx),
        tod_dir * float(np.cos(sza)), tod_dif, sun,
        photons_per_pixel=args.raytracing,
        independent_column=args.independent_column)
    jax.block_until_ready(out)

    status.print_message("Writing output.")
    with NcWriter(args.output) as w:
        w.def_dim("x", nx)
        w.def_dim("y", ny)
        w.def_dim("z", nz)
        for name, val in (("flux_tod_dn", out.flux_toa_down),
                          ("flux_tod_up", out.flux_tod_up),
                          ("flux_sfc_dir", out.flux_sfc_dir),
                          ("flux_sfc_dif", out.flux_sfc_dif),
                          ("flux_sfc_up", out.flux_sfc_up)):
            w.write(name, np.asarray(val), ("y", "x"))
        w.write("flux_abs_dir", np.asarray(out.flux_abs_dir), ("z", "y", "x"))
        w.write("flux_abs_dif", np.asarray(out.flux_abs_dif), ("z", "y", "x"))
    status.print_message("Finished.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
