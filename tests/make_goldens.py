"""One-time generator for the frozen golden flux fixtures.

Usage:  JAX_PLATFORMS=cpu python tests/make_goldens.py

Writes tests/goldens/fluxes_f64.nc via the native CDF-2 codec.  Run ONLY
when intentionally re-baselining (and say so in the commit message) —
CI never regenerates these; that is the whole point (see golden_case.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import golden_case  # noqa: E402
from rte_rrtmgp_tpu.utils.native import NativeNcWriter  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "goldens")
OUT = os.path.join(GOLDEN_DIR, "fluxes_f64.nc")
OUT_RT = os.path.join(GOLDEN_DIR, "rt_f32.nc")
OUT_BW = os.path.join(GOLDEN_DIR, "bw_f32.nc")


def _write(path, out, dims_of):
    with NativeNcWriter(path) as w:
        for name, arr in sorted(out.items()):
            w.write(name, arr, dims_of(name, arr), attrs={"units": "W m-2"})
    print(f"wrote {path} ({len(out)} variables)")
    for name, arr in sorted(out.items()):
        print(f"  {name:24s} mean={arr.mean():10.4f} max={arr.max():10.4f}")


def main(force: bool = False):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    # Existing fixtures are NEVER regenerated implicitly — pass --force
    # when intentionally re-baselining (and say so in the commit message).
    if force or not os.path.exists(OUT):
        _write(OUT, golden_case.solve_case(),
               lambda n, a: ("col", "lev"))
    if force or not os.path.exists(OUT_RT):
        _write(OUT_RT, golden_case.solve_rt_case(),
               lambda n, a: ("y", "x") if a.ndim == 2 else ("zr", "y", "x"))
    if force or not os.path.exists(OUT_BW):
        _write(OUT_BW, golden_case.solve_bw_case(),
               lambda n, a: ("py", "px") if a.ndim == 2
               else ("chan", "py", "px"))


if __name__ == "__main__":
    import sys

    main(force="--force" in sys.argv[1:])
